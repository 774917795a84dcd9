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


def group_norm_masked(
    x, num_groups: int, scale, bias, seq_mask, eps: float = 1e-5
):
    """GroupNorm whose statistics ignore padded frames.

    Produces, at the valid frames, exactly what ``group_norm`` would
    produce on the unpadded tensor. seq_mask: (T,) or (B, T) bool.
    """
    import jax.numpy as jnp

    b, t, c = x.shape
    g = num_groups
    if seq_mask.ndim == 1:
        seq_mask = seq_mask[None, :]
    m = seq_mask[:, :, None].astype(jnp.float32)  # (B, T, 1)
    count = m.sum(axis=1, keepdims=True) * (c // g)  # frames × chans/group

    xf = (x.astype(jnp.float32) * m).reshape(b, t, g, c // g)
    mean = xf.sum(axis=(1, 3), keepdims=True) / count[..., None]
    var = (
        ((xf - mean) * m[..., None]) ** 2
    ).sum(axis=(1, 3), keepdims=True) / count[..., None]
    out = (x.astype(jnp.float32).reshape(b, t, g, c // g) - mean) / jnp.sqrt(var + eps)
    out = out.reshape(b, t, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)
