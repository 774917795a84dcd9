"""Exponential moving average of parameters.

Matches the EMA helper the reference trains with: the effective decay
warms up as ``min(decay, (1 + step) / (10 + step))`` so early steps
track the raw weights closely, converging to the configured decay
(0.9999 for SAiD, 0.99 for the VAE).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def ema_decay_schedule(decay: float, step: jnp.ndarray) -> jnp.ndarray:
    step = step.astype(jnp.float32)
    return jnp.minimum(decay, (1.0 + step) / (10.0 + step))


def ema_update(ema_params, new_params, decay: float, step: jnp.ndarray):
    """One EMA step: ema ← d·ema + (1-d)·new with the warmed-up decay."""
    d = ema_decay_schedule(decay, step)
    return jax.tree_util.tree_map(
        lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d), ema_params, new_params
    )
