"""Multi-head attention primitives (framework-agnostic, pure functions).

Three execution paths, all numerically equivalent:

- ``dense``  — materialize the (T, S) score matrix; optional boolean mask.
  The baseline path, used for parity tests and arbitrary masks.
- ``banded`` — for the alignment-biased cross-attention: gather only the
  in-band keys/values per query (O(T·W·D) instead of O(T·S·D), with the
  band width W = 3 in SAiD's configuration). This is the idiomatic TPU
  replacement for the reference's dense mask + masked_fill
  (``said/model/ldm/attention.py:101-110``).
- ``flash``  — Pallas flash-attention kernel for the dense self-attention
  (``said_tpu.ops.pallas_attention``), used on TPU for long sequences.

Softmax always accumulates in float32 regardless of the compute dtype.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


_NEG_INF = float(np.finfo(np.float32).max)


def _softmax_f32(scores: jnp.ndarray, out_dtype) -> jnp.ndarray:
    return jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(out_dtype)


def banded_attention_cached(
    q: jnp.ndarray,
    k_win: jnp.ndarray,
    v_win: jnp.ndarray,
    valid: jnp.ndarray,
    num_heads: int,
) -> jnp.ndarray:
    """Banded cross-attention with PRE-GATHERED keys/values.

    In the sampling loop the audio context — hence K, V, and their banded
    gather — is identical for every denoise step; callers hoist them out
    of the scan (``said_tpu.models.unet1d.build_kv_caches``) and each step
    only projects Q and attends over the W in-band entries.

    q (B, T, H*D); k_win/v_win (B, T, W, H, D); valid (T, W) or
    (B, T, W) bool (per-row bands for mixed-length batches).
    """
    b, t, inner = q.shape
    h = num_heads
    d = inner // h
    qh = q.reshape(b, t, h, d)
    scale = d**-0.5
    scores = jnp.einsum("bthd,btwhd->bhtw", qh, k_win) * scale
    vmask = valid[:, None, :, :] if valid.ndim == 3 else valid[None, None, :, :]
    scores = jnp.where(vmask, scores, -_NEG_INF)
    attn = _softmax_f32(scores, qh.dtype)
    out = jnp.einsum("bhtw,btwhd->bthd", attn, v_win)
    return out.reshape(b, t, inner)


def multi_head_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_heads: int,
    mask: Optional[jnp.ndarray] = None,
    impl: str = "dense",
    band: Optional[tuple] = None,
    lengths: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Scaled dot-product attention over flat (B, T, H*D) projections.

    Parameters
    ----------
    q, k, v : jnp.ndarray
        (B, T, H*D) query and (B, S, H*D) key/value projections.
    num_heads : int
        Number of heads H.
    mask : Optional[jnp.ndarray]
        (T, S) or (B, T, S) boolean, True = allowed. Only for ``dense``.
    impl : str
        "dense" | "banded" | "flash".
    band : Optional[tuple]
        For "banded": ``(idx, valid)`` from
        ``said_tpu.ops.masks.band_gather_indices`` — idx (T, W) int32,
        valid (T, W) bool.
    lengths : Optional[jnp.ndarray]
        For "flash": (B,) int32 per-row real key counts
        (length-bucketed / mixed-length batches) — keys at/after a
        row's length are masked, padded blocks are skipped.

    Returns
    -------
    jnp.ndarray
        (B, T, H*D) attention output (pre output-projection).
    """
    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h
    scale = d**-0.5

    qh = q.reshape(b, t, h, d)
    kh = k.reshape(b, s, h, d)
    vh = v.reshape(b, s, h, d)

    if impl == "banded":
        if band is None:
            raise ValueError("banded attention requires band=(idx, valid)")
        idx, valid = band
        idx = jnp.asarray(idx)  # (T, W) or (B, T, W) int32
        valid = jnp.asarray(valid)  # matching bool
        # Gather in-band keys/values: (B, T, W, H, D)
        if idx.ndim == 3:  # per-row bands (mixed-length batches)
            w = idx.shape[-1]
            flat = idx.reshape(b, t * w)
            k_win = jnp.take_along_axis(
                kh, flat[:, :, None, None], axis=1
            ).reshape(b, t, w, h, d)
            v_win = jnp.take_along_axis(
                vh, flat[:, :, None, None], axis=1
            ).reshape(b, t, w, h, d)
            vmask = valid[:, None, :, :]
        else:
            k_win = kh[:, idx]
            v_win = vh[:, idx]
            vmask = valid[None, None, :, :]
        scores = jnp.einsum("bthd,btwhd->bhtw", qh, k_win) * scale
        scores = jnp.where(vmask, scores, -_NEG_INF)
        attn = _softmax_f32(scores, qh.dtype)
        out = jnp.einsum("bhtw,btwhd->bthd", attn, v_win)
        return out.reshape(b, t, inner)

    if impl == "flash":
        from said_tpu.ops.pallas_attention import flash_attention_flat

        # flat (B, T, H·D) path: on TPU the packed kernel consumes the
        # projections in their natural layout — no transposes at all
        return flash_attention_flat(q, k, v, h, lengths=lengths)

    if impl == "flash_sp":
        from said_tpu.ops.pallas_attention import flash_attention_flat_sp

        # sequence-parallel: frame axis sharded over a mesh; GSPMD keeps
        # Q sharded and gathers K/V per shard (custom_partitioning rule)
        if lengths is not None:
            raise ValueError("flash_sp does not support runtime lengths")
        return flash_attention_flat_sp(q, k, v, h)

    # dense
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh) * scale
    if mask is not None:
        if mask.ndim == 2:
            mask = mask[None, None, :, :]
        elif mask.ndim == 3:
            mask = mask[:, None, :, :]
        scores = jnp.where(mask, scores, -_NEG_INF)
    attn = _softmax_f32(scores, qh.dtype)
    out = jnp.einsum("bhts,bshd->bthd", attn, vh)
    return out.reshape(b, t, inner)
