"""Time-axis resampling primitives.

``linear_interp_time`` reproduces torch's
``F.interpolate(mode="linear", align_corners=True)`` — used by the
reference to stretch the wav2vec2 feature sequence to exactly the
blendshape frame count (``said/model/wav2vec2.py:41-44``) — but on a
channels-last (B, T, C) layout and as a single gather + lerp that XLA
fuses cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def linear_interp_time(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Linearly resample (B, T, C) → (B, out_len, C) with align_corners=True.

    Source coordinate of output index j is ``j * (T - 1) / (out_len - 1)``;
    endpoints map to endpoints exactly.
    """
    t = x.shape[1]
    if out_len == t:
        return x
    if out_len == 1:
        return x[:, :1, :]
    # Static coordinates — computed with numpy at trace time.
    src = np.arange(out_len, dtype=np.float64) * (t - 1) / (out_len - 1)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, t - 2)
    frac = (src - lo).astype(np.float32)

    lo_j = jnp.asarray(lo)
    frac_j = jnp.asarray(frac)[None, :, None].astype(x.dtype)
    x_lo = x[:, lo_j, :]
    x_hi = x[:, lo_j + 1, :]
    # Same two-weight form as torch's upsample kernel.
    return x_lo * (1.0 - frac_j) + x_hi * frac_j


def linear_interp_time_dynamic(x, out_len_pad: int, in_real, out_real):
    """Traced-length align-corners resample for bucketed inference.

    x (B, T_pad, C) holds ``in_real`` valid frames; produce
    (B, out_len_pad, C) whose first ``out_real`` frames equal the exact
    align-corners interpolation of the valid region (identical to the
    unpadded computation); the rest is garbage the caller masks.
    """
    import jax.numpy as jnp

    t_pad = x.shape[1]
    in_real = jnp.asarray(in_real, jnp.int32)
    out_real = jnp.asarray(out_real, jnp.int32)
    batched = in_real.ndim == 1  # per-row lengths (mixed-length batches)
    j = jnp.arange(out_len_pad, dtype=jnp.int32)
    if batched:
        in_real = in_real[:, None]
        out_real = out_real[:, None]
        j = j[None, :]
    # Exact integer split of src = j*(in-1)/(out-1): float32 would lose
    # precision at large coordinates and break bucketed/unbucketed parity.
    denom = jnp.maximum(out_real - 1, 1)
    num = j * (in_real - 1)
    lo = jnp.clip(num // denom, 0, jnp.maximum(in_real - 2, 0))
    lo = jnp.clip(lo, 0, t_pad - 2)
    rem = num - lo * denom  # ≤ 2·denom, exact in int32 and float32
    frac = (rem.astype(jnp.float32) / denom.astype(jnp.float32)).astype(x.dtype)
    if batched:
        frac = frac[:, :, None]
        x_lo = jnp.take_along_axis(x, lo[:, :, None], axis=1)
        x_hi = jnp.take_along_axis(x, (lo + 1)[:, :, None], axis=1)
    else:
        frac = frac[None, :, None]
        x_lo = jnp.take(x, lo, axis=1)
        x_hi = jnp.take(x, lo + 1, axis=1)
    return x_lo * (1.0 - frac) + x_hi * frac
