"""Normalization primitives with explicit float32 statistics.

The reference's UNet normalizes in float32 regardless of activation
dtype (``GroupNorm32``, ``said/model/ldm/util.py:120-122``); we do the
same so bfloat16 compute stays numerically sane on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """GroupNorm over a channels-last sequence tensor (B, T, C).

    Statistics are computed per (batch, group) over (T, C/G) in float32 —
    identical to torch's GroupNorm on the (B, C, T) layout.
    """
    b, t, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(b, t, c)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def layer_norm_f32(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last axis with float32 statistics."""
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
