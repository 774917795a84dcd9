"""Alignment-bias band computation for audio↔frame cross-attention.

The reference restricts each blendshape frame's cross-attention to a
window of audio features centred on its own position: query frame ``i``
may attend to context positions ``[c_min_i, c_max_i)`` where

    r      = c_len / x_len
    kh     = r / 2 + pad
    c_mid  = (i + 0.5) * r
    c_min  = max(round(c_mid - kh), 0)
    c_max  = min(round(c_mid + kh), c_len)

(``said/model/ldm/attention.py:170-191``; the reference rebuilds this
with a Python loop on every forward). Here the band is a closed-form
function of static shapes, computed ONCE on host with numpy and reused
for every denoise step — and, because the band is narrow (width 3 when
the audio embedding is interpolated to the frame rate, as SAiD always
does), the cross-attention can gather just the in-band keys instead of
materializing a (x_len, c_len) score matrix. ``round`` is
round-half-even in both Python and numpy, so boundaries agree exactly.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np


def alignment_band(x_len: int, c_len: int, pad: int = 1) -> Tuple[np.ndarray, np.ndarray]:
    """Per-query [c_min, c_max) band bounds. Returns two (x_len,) int arrays."""
    r = c_len / x_len
    kh = r / 2 + pad
    i = np.arange(x_len, dtype=np.float64)
    c_mid = (i + 0.5) * r
    # np.round == round-half-even == Python round()
    c_min = np.maximum(np.round(c_mid - kh), 0).astype(np.int64)
    c_max = np.minimum(np.round(c_mid + kh), c_len).astype(np.int64)
    return c_min, c_max


def alignment_bias_mask(x_len: int, c_len: int, pad: int = 1) -> np.ndarray:
    """Dense (x_len, c_len) bool mask; True = ALLOWED (in-band).

    Note the polarity is inverted vs the reference's ``align_bias`` (which
    marks disallowed entries True and `masked_fill`s them).
    """
    c_min, c_max = alignment_band(x_len, c_len, pad)
    j = np.arange(c_len, dtype=np.int64)[None, :]
    return (j >= c_min[:, None]) & (j < c_max[:, None])


def band_gather_indices(
    x_len: int, c_len: int, pad: int = 1
) -> Tuple[np.ndarray, np.ndarray, int]:
    """Gather layout for banded cross-attention.

    Returns ``(idx, valid, width)`` where ``idx`` is (x_len, width) int32 —
    context positions to gather per query (clipped into range) — and
    ``valid`` is the matching bool mask of genuinely in-band entries.
    ``width`` is the static maximum band width.
    """
    c_min, c_max = alignment_band(x_len, c_len, pad)
    width = int((c_max - c_min).max())
    offs = np.arange(width, dtype=np.int64)[None, :]
    raw = c_min[:, None] + offs
    valid = raw < c_max[:, None]
    idx = np.clip(raw, 0, c_len - 1).astype(np.int32)
    return idx, valid, width


def alignment_band_dynamic(x_len_pad: int, c_len_pad: int, x_real, c_real, pad: int = 1):
    """Traced-length alignment band for length-bucketed inference.

    Like ``band_gather_indices`` but for a padded buffer of static size
    (x_len_pad, c_len_pad) whose REAL lengths are runtime values; the
    band is computed on device with the same round-half-even semantics
    (jnp.round == np.round == Python round).

    ``x_real``/``c_real`` may be scalars (one length for the whole batch)
    or (B,) vectors (mixed-length batches). Returns
    (idx (…, x_len_pad, W), valid (…, x_len_pad, W)) with a leading batch
    axis in the vector case; W = ceil(c_len_pad / x_len_pad) + 2·pad + 1
    ≥ any real width. Rows i ≥ x_real are marked fully invalid except
    entry 0 (softmax needs ≥1 unmasked key; those rows are garbage and
    masked out downstream anyway).
    """
    import jax.numpy as jnp

    width = int(np.ceil(c_len_pad / x_len_pad)) + 2 * pad + 1
    x_real = jnp.asarray(x_real, jnp.float32)
    c_real = jnp.asarray(c_real, jnp.float32)
    batched = x_real.ndim == 1
    if batched:
        x_real = x_real[:, None]  # (B, 1)
        c_real = c_real[:, None]

    r = c_real / x_real
    kh = r / 2.0 + pad
    i = jnp.arange(x_len_pad, dtype=jnp.float32)
    if batched:
        i = i[None, :]  # (1, T)
    c_mid = (i + 0.5) * r
    c_min = jnp.maximum(jnp.round(c_mid - kh), 0.0)
    c_max = jnp.minimum(jnp.round(c_mid + kh), c_real)

    offs = jnp.arange(width, dtype=jnp.float32)
    raw = c_min[..., None] + offs  # (…, T, W)
    valid = (raw < c_max[..., None]) & (i[..., None] < x_real[..., None])
    # keep ≥1 unmasked key on fully-masked (padded) rows
    row_dead = i >= x_real
    valid = valid.at[..., 0].set(valid[..., 0] | row_dead)
    idx = jnp.clip(raw, 0, c_len_pad - 1).astype(jnp.int32)
    return idx, valid
