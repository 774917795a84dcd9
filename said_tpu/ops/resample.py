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
