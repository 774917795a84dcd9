"""Pallas TPU attention kernels for the denoiser's self-attention.

The reference runs this self-attention dense at unbounded window size
(``said/model/ldm/attention.py:101-128``, ``said/model/diffusion.py:359-364``);
these kernels are the TPU-native replacement for long sequences.

Design notes (hardware-derived):

- head_dim is 32, so the QK^T contraction fills only 32 of the MXU's 128
  systolic rows and the PV product only 32 of its 128 output lanes — a
  hard ~25% MXU ceiling for this model shape (packing heads with zero
  blocks is a wash: the zeros waste exactly what the packing gains). The
  kernels therefore optimize the OTHER side: VPU passes over the (T, S)
  score matrix are minimized —
    * softmax scale and log2(e) are folded into Q on the host and the
      kernel uses exp2 (saves a full multiply pass; exp lowers to
      exp2+mul anyway),
    * the softmax denominator is computed ON THE MXU by augmenting V
      with a ones column (saves the sum-reduce pass; the PV matmul's
      N grows 32→33, same MXU time),
    * the division happens on the (T, D) output, not the (T, S)
      probabilities,
    * key-padding masks are applied only to blocks that straddle a
      boundary.
- Runtime lengths (length-bucketed / mixed-length serving): a
  scalar-prefetched per-row length vector masks straddling key blocks,
  SKIPS fully-invalid key blocks, and zero-fills fully-padded query
  blocks — so one compiled program serves every clip length in a bucket
  at the cost of the REAL frames only.

Kernels behind size-based routers. The production entry is
``flash_attention_flat`` (the model's natural (B, T, H·D) layout):

- ``_flash_tpu_packed`` — whole key axis in VMEM per grid step, heads
  as static lane slices (zero caller-side transposes). Fastest up to
  mid lengths (scores block (block_q, S) must fit VMEM).
- ``_flash_tpu_packed_blocked`` — same layout, MAX-FREE blocked
  accumulation over a (batch, q, k) grid: the exp2 shift is a
  precomputed per-row bound (``_exp2_shift_bound``) instead of an online
  running max, deleting the per-block rowmax VPU pass, the max scratch,
  and the alpha rescale (measured 1.10x at T=21600); a per-head
  ones-augmented f32 accumulator slab carries across the sequential key
  axis, so VMEM usage is independent of S. The >4-minute-clip path.

``flash_attention`` is a thin (B, T, H, D) convenience wrapper over the
same flat router (the head-merging reshape is free).

Measured on v5e, XLA's dense attention wins below ~2k frames (the MXU
is equally underfilled either way and XLA's fusions are free), so the
router only engages the kernels beyond that. Off-TPU callers get the
dense path; both kernels are CI-tested on CPU via interpret mode.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

_LOG2E = math.log2(math.e)


def _dense_reference(q, k, v, lengths=None):
    """(B, T, H, D) reference path; ``lengths`` (B,) masks padded keys."""
    d = q.shape[-1]
    scale = d**-0.5
    scores = jnp.einsum("bthd,bshd->bhts", q, k) * scale
    if lengths is not None:
        col = jnp.arange(k.shape[1])
        keymask = col[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
        scores = jnp.where(keymask[:, None, None, :], scores, -jnp.inf)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, v)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# --- exp2-shift bound for the max-free blocked kernel -------------------
#
# The blocked kernel's headroom is NOT the matmuls (bf16 QK^T alone
# measures ~87 TFLOP/s at T=21600 vs ~40 effective for the full kernel —
# tools/int8_qk_probe.py): it is the VPU passes over each
# (block_q, block_k) f32 score block. The biggest of those is the online
# rowmax (plus its running-max scratch and the accumulator alpha-rescale).
# tools/vpu_probe.py measured deleting it at 1.10x on-chip (6/6 paired
# interleaved rounds), with the exp2 shift coming from a per-row bound
# computed OUTSIDE the kernel in O(T·d) instead of the running max —
# mathematically identical by softmax shift-invariance.
#
# Shift construction (production-safe by design, not by plausibility):
#
#   A[b,t,h] = min( M,  L + _SHIFT_SLACK )
#   M = ||q̃_t|| · max_j ||k_j|| + 1     (Cauchy–Schwarz upper bound on
#                                         every exp2-folded score; +1
#                                         absorbs f32 accumulation slop)
#   L = max over LANDMARK keys of q̃_t·k_j  (exact scores at a strided
#        subset + the max-norm key; a LOWER bound on the true row max)
#
# and in-kernel  p = exp2(max(s2 − A, −_SHIFT_CLAMP)), with key-padding
# masks applied AFTER exp2 as a where-zero (−inf must never meet the
# clamp). Why this is safe on ANY input:
#
#   * accuracy, unconditionally: A ≤ truemax + _SHIFT_SLACK always
#     (L ≤ truemax, and the M branch is only taken when M ≤ L+SLACK
#     ≤ truemax+SLACK). An entry only clamps when it sits more than
#     (CLAMP − SLACK) = 56 log2 units below the true max, i.e. its true
#     softmax weight is < 2^−56; clamping raises it to at most
#     2^−CLAMP/denom ≤ 2^(SLACK−CLAMP) = 2^−56 of the total — summed over
#     ≤ 2^16 keys the distortion is ≤ 2^−40, far below bf16 output
#     rounding. A naive bound-only shift (no L branch) would instead
#     SILENTLY degrade toward uniform attention whenever the CS bound is
#     ≳ clamp-loose — e.g. one outlier-norm key on a trained model.
#   * no overflow in the exact region: p ≤ 2^(truemax−A); the L branch
#     keeps truemax−A ≤ truemax−L. Overflow (loud Inf/NaN, never silent)
#     requires the true max score to tower > ~95 log2 units (≈66 nats)
#     above EVERY landmark score while its key is neither a landmark nor
#     the max-norm key — softmax at such logit scales is a hard max with
#     astronomically peaked weights, far outside any trained regime.
#   * the clamp floor keeps the ones-column denominator strictly
#     positive (each unmasked p ≥ 2^−120, still f32/bf16-normal), so no
#     0/0 on any input.
#
# tests/test_pallas_kernel.py pins the adversarial cases (landmark-missed
# outlier key, max-norm outlier, garbage beyond runtime lengths).
_SHIFT_SLACK = 64.0
_SHIFT_CLAMP = -120.0
_LANDMARK_STRIDE = 256


def _exp2_shift_bound(qs, k, num_heads: int, lengths=None):
    """Per-row exp2 shift A (B, T, H) — see the derivation above.

    ``qs`` is the PRE-FOLDED query (softmax scale and log2e already
    multiplied in, rounded to the kernel's input dtype — the norms must
    bound what the MXU actually multiplies). ``lengths`` (B,) masks
    landmark/norm candidates beyond each row's real key count so padding
    garbage can never loosen OR tighten the shift; key 0 is always a
    landmark, so any row with length ≥ 1 has a finite L.
    """
    b, t, inner = qs.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h
    qf = qs.astype(jnp.float32).reshape(b, t, h, d)
    kf = k.astype(jnp.float32).reshape(b, s, h, d)
    kn = jnp.linalg.norm(kf, axis=-1)  # (b, s, h)
    if lengths is not None:
        valid = (
            jnp.arange(s)[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
        )
        kn = jnp.where(valid[:, :, None], kn, 0.0)
    m = jnp.linalg.norm(qf, axis=-1) * kn.max(axis=1)[:, None, :] + 1.0

    idx = jnp.arange(0, s, _LANDMARK_STRIDE)
    kl = kf[:, idx]  # (b, nl, h, d) strided landmarks
    # + the max-norm key per (b, h): the one key a norm-driven outlier
    # regime is guaranteed to contain
    jmax = kn.argmax(axis=1)  # (b, h)
    kmax = jnp.take_along_axis(
        kf, jmax[:, None, :, None].astype(jnp.int32), axis=1
    )  # (b, 1, h, d)
    sl = jnp.einsum(
        "bthd,bshd->bths", qf, jnp.concatenate([kl, kmax], axis=1),
        preferred_element_type=jnp.float32,
    )
    if lengths is not None:
        lv = idx[None, :] < jnp.asarray(lengths, jnp.int32)[:, None]
        lv = jnp.concatenate(
            [lv, jnp.ones((b, 1), bool)], axis=1
        )  # max-norm key is valid by construction (masked norms)
        sl = jnp.where(lv[:, None, None, :], sl, -jnp.inf)
    a = jnp.minimum(m, sl.max(axis=-1) + _SHIFT_SLACK)
    # rows that can never run (length 0) still need a finite shift
    return jnp.where(jnp.isfinite(a), a, 0.0)


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "has_lens", "interpret"),
)
def _flash_tpu_packed(q, k, v, lens_b=None, num_heads: int = 6,
                      block_q: int = 256, has_lens: bool = False,
                      interpret: bool = False):
    """Packed-layout flash attention: q/k/v in the model's NATURAL
    (B, T, H·D) layout — zero caller-side transposes, H× fewer grid
    steps; heads are static lane slices inside the kernel.

    This exists because the per-(B·H) layout, while fast standalone, is
    pathological inside the full UNet program: the (B,T,H,D)→(B·H,T,D)
    transposes around the pallas_call cost more than the kernel itself
    in situ. ``lens_b`` is (B,) here (per batch row, not per (b,h)).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h

    t_pad = _round_up(t, block_q)
    s_pad = _round_up(s, 128)

    # Scale in f32, then cast back: scaling directly in bf16 would add an
    # extra bf16 rounding per Q element relative to the dense/reference
    # path (which scales the f32 score matrix). XLA fuses the
    # convert-mul-convert, so this costs nothing on device.
    qs = (q.astype(jnp.float32) * (d**-0.5 * _LOG2E)).astype(q.dtype)
    # per-head ones column: va[:, :, h·(d+1) : h·(d+1)+d] = v_h, then 1
    ones = jnp.ones((b, s, h, 1), v.dtype)
    va = jnp.concatenate(
        [v.reshape(b, s, h, d), ones], axis=-1
    ).reshape(b, s, h * (d + 1))
    if t_pad > t:
        qs = jnp.pad(qs, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad > s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        va = jnp.pad(va, ((0, 0), (0, s_pad - s), (0, 0)))

    num_q = t_pad // block_q
    static_mask = s_pad > s

    def body(lens_ref, q_ref, k_ref, v_ref, o_ref):
        qb = q_ref[0]  # (block_q, h·d), pre-scaled
        kb = k_ref[0]  # (s_pad, h·d)
        vb = v_ref[0]  # (s_pad, h·(d+1)) ones-augmented per head

        def compute(row_len):
            col = None
            if has_lens or static_mask:
                col = jax.lax.broadcasted_iota(
                    jnp.int32, (qb.shape[0], s_pad), 1
                )
            for hh in range(h):
                s2 = jax.lax.dot_general(
                    qb[:, hh * d:(hh + 1) * d],
                    kb[:, hh * d:(hh + 1) * d],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                if col is not None:
                    s2 = jnp.where(col < row_len, s2, -jnp.inf)
                m = jnp.max(s2, axis=-1, keepdims=True)
                p = jnp.exp2(s2 - m)
                acc = jax.lax.dot_general(
                    p.astype(vb.dtype),
                    vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0, :, hh * d:(hh + 1) * d] = (
                    acc[:, :d] / acc[:, d:d + 1]
                ).astype(o_ref.dtype)

        if has_lens:
            row_len = lens_ref[pl.program_id(0)]
            q_start = pl.program_id(1) * block_q

            @pl.when(q_start < row_len)
            def _():
                compute(row_len)

            @pl.when(q_start >= row_len)
            def _():
                o_ref[0] = jnp.zeros_like(o_ref[0])
        else:
            compute(s)

    grid = (b, num_q)
    tensor_in_specs = [
        pl.BlockSpec((1, block_q, inner), lambda bi, qi, *_: (bi, qi, 0)),
        pl.BlockSpec((1, s_pad, inner), lambda bi, qi, *_: (bi, 0, 0)),
        pl.BlockSpec((1, s_pad, h * (d + 1)), lambda bi, qi, *_: (bi, 0, 0)),
    ]
    out_spec = pl.BlockSpec((1, block_q, inner), lambda bi, qi, *_: (bi, qi, 0))
    cost = pl.CostEstimate(
        flops=2 * 2 * b * h * t_pad * s_pad * d,
        bytes_accessed=b * (t_pad + 2 * s_pad * num_q) * inner * q.dtype.itemsize,
        transcendentals=b * h * t_pad * s_pad,
    )

    if has_lens:
        out = pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=tensor_in_specs,
                out_specs=out_spec,
            ),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(lens_b, jnp.int32), qs, k, va)
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref):
            body(None, q_ref, k_ref, v_ref, o_ref)

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=tensor_in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
            cost_estimate=cost,
            interpret=interpret,
        )(qs, k, va)

    return out[:, :t]


@functools.partial(
    jax.jit,
    static_argnames=("num_heads", "block_q", "block_k", "has_lens",
                     "interpret"),
)
def _flash_tpu_packed_blocked(q, k, v, lens_b=None, num_heads: int = 6,
                              block_q: int = 512, block_k: int = 2048,
                              has_lens: bool = False,
                              interpret: bool = False):
    """MAX-FREE blocked flash attention in the PACKED (B, T, H·D)
    layout — the very-long-sequence path (key axis streamed in blocks,
    so the whole K never has to fit VMEM), with zero caller-side
    transposes.

    Grid (B, q_blocks, k_blocks), key axis innermost; per-head
    ones-augmented accumulators live in a (H, block_q, D+1) scratch slab
    that carries across the sequential key steps. There is NO online
    softmax: the exp2 shift is the precomputed per-row bound
    ``_exp2_shift_bound`` (see its derivation — mathematically identical
    to the running max by shift-invariance, production-safe on any
    input), which deletes the per-block rowmax VPU pass, the running-max
    scratch, and the accumulator alpha-rescale — measured 1.10x on-chip
    at T=21600 (tools/vpu_probe.py, 6/6 paired interleaved rounds).
    ``lens_b`` is (B,) per-row real frame counts.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h

    t_pad = _round_up(t, block_q)
    s_pad = _round_up(s, block_k)

    # Scale in f32, then cast back: scaling directly in bf16 would add an
    # extra bf16 rounding per Q element relative to the dense/reference
    # path (which scales the f32 score matrix). XLA fuses the
    # convert-mul-convert, so this costs nothing on device.
    qs = (q.astype(jnp.float32) * (d**-0.5 * _LOG2E)).astype(q.dtype)
    # per-row exp2 shift, from the UNPADDED tensors: zero-padded keys
    # must never enter the landmark set (a 0-score landmark would loosen
    # the accuracy guarantee when every real score is very negative)
    a_shift = _exp2_shift_bound(qs, k, h, lengths=lens_b)
    ones = jnp.ones((b, s, h, 1), v.dtype)
    va = jnp.concatenate(
        [v.reshape(b, s, h, d), ones], axis=-1
    ).reshape(b, s, h * (d + 1))
    if t_pad > t:
        qs = jnp.pad(qs, ((0, 0), (0, t_pad - t), (0, 0)))
        a_shift = jnp.pad(a_shift, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad > s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        va = jnp.pad(va, ((0, 0), (0, s_pad - s), (0, 0)))

    num_q = t_pad // block_q
    num_k = s_pad // block_k
    last_k = num_k - 1
    static_tail = s_pad > s

    def body(lens_ref, q_ref, k_ref, v_ref, a_ref, o_ref, acc_scr):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            acc_scr[...] = jnp.zeros_like(acc_scr)

        def _head_updates(mask_limit):
            """One max-free accumulate over this key block for every
            head. ``mask_limit``: traced column bound to mask scores at
            (None = every column of this block is real — no iota, no
            per-head where: at T=21600 that masking apparatus costs two
            extra VPU passes over each (block_q, block_k) f32 score
            block, paid 6 heads × every block when only the LAST block
            straddles the static end). Masking is a where-ZERO applied
            AFTER exp2 — a -inf score entering the clamp would be raised
            to 2^-120 instead of killed."""
            qb = q_ref[0]  # (block_q, h·d), pre-scaled
            kb = k_ref[0]  # (block_k, h·d)
            vb = v_ref[0]  # (block_k, h·(d+1)) ones-augmented per head
            ab = a_ref[0]  # (block_q, h) per-row exp2 shift
            col = None
            if mask_limit is not None:
                col = ki * block_k + jax.lax.broadcasted_iota(
                    jnp.int32, (qb.shape[0], block_k), 1
                )
            for hh in range(h):
                s2 = jax.lax.dot_general(
                    qb[:, hh * d:(hh + 1) * d],
                    kb[:, hh * d:(hh + 1) * d],
                    dimension_numbers=(((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                p = jnp.exp2(
                    jnp.maximum(s2 - ab[:, hh:hh + 1], _SHIFT_CLAMP)
                )
                if mask_limit is not None:
                    p = jnp.where(col < mask_limit, p, 0.0)
                acc_scr[hh] = acc_scr[hh] + jax.lax.dot_general(
                    p.astype(vb.dtype),
                    vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

        if has_lens:
            row_len = lens_ref[pl.program_id(0)]
            q_start = pl.program_id(1) * block_q
            run = jnp.logical_and(q_start < row_len, ki * block_k < row_len)

            @pl.when(run)
            def _update():
                _head_updates(row_len)

        elif static_tail:
            # only the last key block straddles the static end: branch so
            # the other num_k−1 blocks skip the masking entirely —
            # bit-identical (their mask was all-True)
            @pl.when(ki != last_k)
            def _update_clean():
                _head_updates(None)

            @pl.when(ki == last_k)
            def _update_tail():
                _head_updates(s)

        else:
            _head_updates(None)

        @pl.when(ki == last_k)
        def _finalize():
            for hh in range(h):
                acc = acc_scr[hh]
                denom = acc[:, d:d + 1]
                if has_lens:
                    # fully-padded query blocks never ran: denom == 0
                    out = jnp.where(denom > 0, acc[:, :d] / denom, 0.0)
                else:
                    out = acc[:, :d] / denom
                o_ref[0, :, hh * d:(hh + 1) * d] = out.astype(o_ref.dtype)

    grid = (b, num_q, num_k)
    tensor_in_specs = [
        pl.BlockSpec((1, block_q, inner), lambda bi, qi, ki, *_: (bi, qi, 0)),
        pl.BlockSpec((1, block_k, inner), lambda bi, qi, ki, *_: (bi, ki, 0)),
        pl.BlockSpec(
            (1, block_k, h * (d + 1)), lambda bi, qi, ki, *_: (bi, ki, 0)
        ),
        pl.BlockSpec((1, block_q, h), lambda bi, qi, ki, *_: (bi, qi, 0)),
    ]
    out_spec = pl.BlockSpec(
        (1, block_q, inner), lambda bi, qi, ki, *_: (bi, qi, 0)
    )
    scratch = [pltpu.VMEM((h, block_q, d + 1), jnp.float32)]
    params = pltpu.CompilerParams(
        dimension_semantics=("parallel", "parallel", "arbitrary"),
    )
    cost = pl.CostEstimate(
        flops=2 * 2 * b * h * t_pad * s_pad * d,
        bytes_accessed=b * (t_pad + 2 * s_pad * num_q) * inner
        * q.dtype.itemsize,
        transcendentals=b * h * t_pad * s_pad,
    )

    if has_lens:
        out = pl.pallas_call(
            body,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=grid,
                in_specs=tensor_in_specs,
                out_specs=out_spec,
                scratch_shapes=scratch,
            ),
            out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(jnp.asarray(lens_b, jnp.int32), qs, k, va,
          a_shift.astype(jnp.float32))
    else:
        def kernel(q_ref, k_ref, v_ref, a_ref, o_ref, acc_scr):
            body(None, q_ref, k_ref, v_ref, a_ref, o_ref, acc_scr)

        out = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=tensor_in_specs,
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
            scratch_shapes=scratch,
            compiler_params=params,
            cost_estimate=cost,
            interpret=interpret,
        )(qs, k, va, a_shift.astype(jnp.float32))

    return out[:, :t]


# Crossovers measured on v5e (head dim 32, bf16): below ~2k frames XLA
# dense wins (free fusions, equally-underfilled MXU); fullk wins from
# there (0.47 ms at 3600 vs 1.40 dense / 0.69 blocked; 7.2 ms at 14400
# vs 9.6 blocked — 22% MFU, ~87% of the head-dim-32 ceiling) until its
# (block_q, S) score block overruns VMEM; blocked beyond.
_DENSE_MAX = 2048
_FULLK_MAX = 14400


def _fullk_smax(inner: int, h: int, itemsize: int) -> int:
    """Longest key axis the full-K packed kernel can hold: K and the
    ones-augmented V are constant blocks (single-buffered, fetched
    once), capped at ~11.5 MB of VMEM. At the denoiser's inner=192 this
    is ~14.7k keys (the measured 14400 perf crossover binds first); at
    the wav2vec2 encoder's inner=768 it is ~3.7k — wider models must
    switch to the key-blocked kernel much earlier."""
    return (11_500_000 // ((2 * inner + h) * itemsize)) // 128 * 128


def _blocked_blocks(inner: int, h: int, itemsize: int):
    """(block_q, block_k) for the key-blocked kernel, scaled so the
    double-buffered K/V blocks (~8 MB), q+out blocks (~5 MB) and the
    (h, block_q, d+2) f32 scratch fit VMEM at any model width. At
    inner=192 this reproduces the tuned (512, 2048)."""
    if inner <= 256:
        return 512, 2048  # tuned on-chip for the 192-wide denoiser
    # Wider models: the h-way unrolled head loop keeps several
    # (block_q, block_k) f32 score temporaries live at once, so the
    # limit is temps, not the K/V blocks. Validated on-chip at
    # inner=768 (12 heads x 64, the wav2vec2 encoder).
    kv_row = (2 * inner + h) * itemsize * 2  # k + ones-augmented v, 2 bufs
    bk = max(128, min(512, ((2 * 1024 * 1024) // kv_row) // 128 * 128))
    bq = max(128, min(256, ((1 * 1024 * 1024) // (inner * itemsize * 2)) // 128 * 128))
    return bq, bk


# Pad-minimizing block_k: MEASURED NO-GO (round 5, tools/attn_tail_probe
# on the real chip at T=21600). Shrinking block_k 2048 → 1664 cuts the
# key-axis padding waste 4.3% → 0.15%, yet the kernel measures
# CONSISTENTLY slower (median 19.03 vs 17.94 ms, 0/6 paired interleaved
# rounds): at this shape the wider block's fewer grid steps / better
# MXU pipelining outweigh 4% extra columns. Keep the tuned 2048.
#
# Bound-shift for the FULL-K kernel: MEASURED NO-GO (round 5,
# tools/fullk_bound_probe.py, T=3600): 1.013x, 3/6 paired wins — noise.
# The full-K kernel has no running-max scratch or alpha rescale to
# delete, and its one rowmax pass is cheap at (block_q, 3.6k). The
# max-free shift stays exclusive to the blocked long-clip kernel where
# it measured 1.08x end-to-end (tools/promote_bound_check.py).


def _dense_flat(q, k, v, num_heads: int, lengths=None):
    b, t, inner = q.shape
    d = inner // num_heads
    out = _dense_reference(
        q.reshape(b, t, num_heads, d),
        k.reshape(b, k.shape[1], num_heads, d),
        v.reshape(b, v.shape[1], num_heads, d),
        lengths=lengths,
    )
    return out.reshape(b, t, inner)


def _flash_route(q, k, v, num_heads: int, lengths=None):
    """Size/backend routing for flat (B, T, H·D) attention (fwd only)."""
    import os

    b, t, inner = q.shape
    h = num_heads
    if os.environ.get("SAID_FLASH_INTERPRET"):
        return _flash_tpu_packed(
            q, k, v, lengths, num_heads=h, block_q=128,
            has_lens=lengths is not None, interpret=True,
        )
    if (
        jax.default_backend() != "tpu"
        or (t <= _DENSE_MAX and k.shape[1] <= _DENSE_MAX)
    ):
        return _dense_flat(q, k, v, h, lengths)
    if k.shape[1] <= min(_FULLK_MAX, _fullk_smax(inner, h, q.dtype.itemsize)):
        return _flash_tpu_packed(
            q, k, v, lengths, num_heads=h, has_lens=lengths is not None
        )
    # very long sequences: online-softmax blocked kernel, still in the
    # packed layout — K is streamed in blocks so VMEM usage is
    # independent of S; block sizes scale with the model width
    bq, bk = _blocked_blocks(inner, h, q.dtype.itemsize)
    return _flash_tpu_packed_blocked(
        q, k, v, lengths, num_heads=h, block_q=bq, block_k=bk,
        has_lens=lengths is not None,
    )


# Backward routing: below this key length the dense-recompute VJP wins
# (one fused XLA softmax backward, (T, S) fits comfortably); above it the
# blockwise backward keeps memory O(T·block) instead of O(T²).
_BWD_DENSE_MAX = 4096
_BWD_BLOCK_K = 1024


def _chunked_attn_bwd(q, k, v, o, g, num_heads: int, lengths=None,
                      block_k=None):
    """O(T·block_k) flash-attention backward: recompute scores blockwise.

    Two ``lax.scan`` passes over key blocks: (1) running max / sum-exp
    for the softmax log-normalizer, (2) dq/dk/dv via the standard flash
    backward identities (``ds = p ⊙ (dp − δ)`` with
    ``δ_i = Σ_d g_id·o_id``). Pure jnp — XLA tiles the einsums onto the
    MXU — and under GSPMD a frame-sharded q keeps EVERY intermediate
    sharded: per-shard live memory is O((T/n)·block_k), never the
    O(T²/n) a dense recompute would materialize (dk/dv partials are
    psum-combined by the partitioner because their einsums contract over
    the sharded frame axis). This is what makes sequence-parallel
    TRAINING viable at exactly the clip lengths SP exists for; the
    reference has no SP at all and materializes dense (T, T) scores even
    forward (``said/model/ldm/attention.py:101-110``). Matches the dense
    softmax backward up to f32 reduction order
    (tests/test_flash_bwd.py).
    """
    in_dtype = q.dtype
    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h
    scale = d**-0.5

    # Matmul precision mirrors the FORWARD kernel: bf16 inputs keep bf16
    # MXU operands with f32 accumulation (preferred_element_type) and
    # f32 softmax statistics — the MXU runs f32 matmuls at ~1/4 the
    # bf16 rate, so a bf16 train step shouldn't pay f32 rate on five
    # score-sized einsums per block. Measured NEUTRAL on the 6-minute
    # train metric (0.809 steps/s both ways — the step's cost lives in
    # the rematerialized forward kernels, not these einsums), kept for
    # rate-consistency with the forward and for regimes where the
    # backward share grows (larger block_k, deeper stacks). f32 inputs
    # (CPU tests, full-precision mode) keep full f32 compute —
    # unchanged numerics.
    mm_dtype = in_dtype if in_dtype == jnp.bfloat16 else jnp.float32
    ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)

    # read the module global at CALL time (tests tune it), and never pad
    # the key axis past one lane-aligned block
    if block_k is None:
        block_k = _BWD_BLOCK_K
    block_k = min(block_k, _round_up(s, 128))
    s_pad = _round_up(s, block_k)
    nb = s_pad // block_k

    def heads(x, n, dt=jnp.float32):
        return x.astype(dt).reshape(b, n, h, d)

    qh, gh = heads(q, t, mm_dtype), heads(g, t, mm_dtype)
    # delta needs f32 elementwise precision (it subtracts from dp)
    delta = (
        (heads(g, t) * heads(o, t)).sum(axis=-1).transpose(0, 2, 1)
    )  # (B, H, T)
    kp = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad > s else k
    vp = jnp.pad(v, ((0, 0), (0, s_pad - s), (0, 0))) if s_pad > s else v
    # key blocks as the scan axis: (nb, B, block_k, H, D)
    kh = heads(kp, s_pad, mm_dtype).reshape(
        b, nb, block_k, h, d
    ).transpose(1, 0, 2, 3, 4)
    vh = heads(vp, s_pad, mm_dtype).reshape(
        b, nb, block_k, h, d
    ).transpose(1, 0, 2, 3, 4)

    lens = None if lengths is None else jnp.asarray(lengths, jnp.int32)

    def block_scores(kb, j):
        sc = ein("bthd,bshd->bhts", qh, kb) * scale  # f32 accum
        col = j * block_k + jnp.arange(block_k)
        limit = s if lens is None else lens[:, None]
        valid = col[None, :] < limit  # (B, block_k) or (1, block_k)
        return jnp.where(valid[:, None, None, :], sc, -jnp.inf)

    def lse_step(carry, xs):
        m_run, l_run = carry
        kb, j = xs
        sc = block_scores(kb, j)
        m_new = jnp.maximum(m_run, sc.max(axis=-1))
        l_new = l_run * jnp.exp(m_run - m_new) + jnp.exp(
            sc - m_new[..., None]
        ).sum(axis=-1)
        return (m_new, l_new), None

    m0 = jnp.full((b, h, t), -jnp.inf, jnp.float32)
    l0 = jnp.zeros((b, h, t), jnp.float32)
    (m_fin, l_fin), _ = jax.lax.scan(lse_step, (m0, l0), (kh, jnp.arange(nb)))
    lse = m_fin + jnp.log(l_fin)  # (B, H, T)

    def grad_step(dq_acc, xs):
        kb, vb, j = xs
        sc = block_scores(kb, j)
        p = jnp.exp(sc - lse[..., None])  # (B, H, T, block_k) f32
        dv_j = ein("bhts,bthd->bshd", p.astype(mm_dtype), gh)
        dp = ein("bthd,bshd->bhts", gh, vb)  # f32 accum
        ds = (p * (dp - delta[..., None]) * scale).astype(mm_dtype)
        dq_acc = dq_acc + ein("bhts,bshd->bthd", ds, kb)
        dk_j = ein("bhts,bthd->bshd", ds, qh)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, t, h, d), jnp.float32)
    dq, (dk_blocks, dv_blocks) = jax.lax.scan(
        grad_step, dq0, (kh, vh, jnp.arange(nb))
    )

    def unblock(blocks):
        full = blocks.transpose(1, 0, 2, 3, 4).reshape(b, s_pad, inner)
        return full[:, :s].astype(in_dtype)

    return (
        dq.reshape(b, t, inner).astype(in_dtype),
        unblock(dk_blocks),
        unblock(dv_blocks),
    )


def _attn_bwd_route(q, k, v, o, g, num_heads: int, lengths=None):
    """Dense-recompute VJP for short keys; blockwise beyond
    ``_BWD_DENSE_MAX`` (see ``_chunked_attn_bwd``)."""
    if k.shape[1] > _BWD_DENSE_MAX:
        return _chunked_attn_bwd(q, k, v, o, g, num_heads, lengths)
    _, vjp = jax.vjp(
        lambda a, b_, c: _dense_flat(a, b_, c, num_heads, lengths), q, k, v
    )
    return vjp(g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_flat(q, k, v, num_heads: int, lengths=None):
    """Flash attention over FLAT (B, T, H·D) projections — the model's
    natural layout. On TPU this is the production path (packed kernel,
    no transposes); elsewhere, and for short sequences, dense.

    Differentiable with flash-class memory on BOTH sides: no (T, S)
    residual crosses the fwd/bwd boundary, and beyond ``_BWD_DENSE_MAX``
    keys the backward recomputes scores blockwise (``_chunked_attn_bwd``)
    so even the recompute never materializes a (T, S) tensor — pair with
    ``--gradient_checkpointing`` for long-window training.

    Set ``SAID_FLASH_INTERPRET=1`` to force the packed kernel in Pallas
    interpret mode regardless of backend/length — CI uses this to drive
    the REAL kernel code end-to-end through the model on CPU.
    """
    return _flash_route(q, k, v, num_heads, lengths)


def _flash_flat_fwd(q, k, v, num_heads, lengths):
    out = _flash_route(q, k, v, num_heads, lengths)
    return out, (q, k, v, out, lengths)


def _flash_flat_bwd(num_heads, res, g):
    q, k, v, o, lengths = res
    dq, dk, dv = _attn_bwd_route(q, k, v, o, g, num_heads, lengths)
    ct_len = (
        None
        if lengths is None
        else np.zeros(np.shape(lengths), dtype=jax.dtypes.float0)
    )
    return dq, dk, dv, ct_len


flash_attention_flat.defvjp(_flash_flat_fwd, _flash_flat_bwd)


@functools.lru_cache(maxsize=None)
def _sp_flash(num_heads: int):
    """Sequence-parallel flash attention via ``custom_partitioning``.

    Teaches GSPMD how to partition the (opaque) Pallas kernel over a
    frame-sharded mesh axis: the output follows the query's sharding,
    queries stay sharded by frame block, and keys/values are gathered
    (replicated along their frame axis) onto every shard — blockwise
    attention, the TPU-native equivalent of the sequence parallelism the
    reference lacks entirely (SURVEY §2.9: no SP/CP of any kind; long
    clips there run a single-device dense O(T²) attention,
    ``said/model/diffusion.py:359-364``). K/V for this model are small
    ((B, T, 192) bf16 ≈ 0.7 MB/min of audio), so an all-gather riding
    ICI is far below the attention FLOP cost and the per-shard kernels
    keep the packed layout.
    """
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def impl(q, k, v):
        return _flash_route(q, k, v, num_heads, None)

    fn = custom_partitioning(impl)

    def _q_spec(arg_shapes):
        sh = arg_shapes[0].sharding
        spec = list(getattr(sh, "spec", P()) or ())
        spec += [None] * (3 - len(spec))
        # Never split heads/lanes across shards (head boundaries would
        # be crossed); batch + frame sharding pass through.
        return P(spec[0], spec[1], None)

    def infer(mesh, arg_shapes, shape):
        return NamedSharding(mesh, _q_spec(arg_shapes))

    def partition(mesh, arg_shapes, result_shape):
        qs = _q_spec(arg_shapes)
        kv = P(qs[0], None, None)  # gather K/V rows onto every shard
        arg_shardings = (
            NamedSharding(mesh, qs),
            NamedSharding(mesh, kv),
            NamedSharding(mesh, kv),
        )
        return mesh, impl, NamedSharding(mesh, qs), arg_shardings

    # Shardy expresses the same contract declaratively (einsum-like
    # factors): batch b and query-frame t may shard; key-frame s and the
    # packed head·lane dim f must be replicated (gathered) on each shard.
    # The GSPMD callbacks cover the legacy partitioner path.
    fn.def_partition(
        partition,
        infer_sharding_from_operands=infer,
        sharding_rule="b t f, b s f, b s f -> b t f",
        need_replication_factors=("f", "s"),
    )
    return fn


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def flash_attention_flat_sp(q, k, v, num_heads: int):
    """Frame-sharded (sequence-parallel) flat attention — see ``_sp_flash``.

    Serves extreme clip lengths on a mesh with a sharded frame axis; no
    runtime-length support (SP serves one long clip, not mixed-length
    buckets). Unsharded callers fall through to the normal route
    unchanged.

    Differentiable: the forward runs the custom-partitioned kernel
    (which has no AD rule of its own); the backward recomputes scores
    BLOCKWISE from the saved q/k/v/out (``_chunked_attn_bwd`` beyond
    ``_BWD_DENSE_MAX`` keys) as jnp einsums, which GSPMD partitions from
    the operands' shardings — q, out, and the cotangent stay
    frame-sharded, every recomputed score block is (T_shard, block_k),
    and the dk/dv partials are psum-combined by the collectives XLA
    inserts. Per-shard backward memory is therefore O((T/n)·block), not
    O(T²/n) — sequence-parallel TRAINING works at exactly the clip
    lengths SP exists for. The reference cannot express SP at all
    (SURVEY §2.9: no SP/CP; ``script/train.py`` caps windows instead,
    ``dataset_voca.py:553-554``).
    """
    return _sp_flash(num_heads)(q, k, v)


def _flash_sp_fwd(q, k, v, num_heads):
    out = _sp_flash(num_heads)(q, k, v)
    return out, (q, k, v, out)


def _flash_sp_bwd(num_heads, res, g):
    q, k, v, o = res
    return _attn_bwd_route(q, k, v, o, g, num_heads, None)


flash_attention_flat_sp.defvjp(_flash_sp_fwd, _flash_sp_bwd)


def flash_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                    lengths=None) -> jnp.ndarray:
    """Attention over (B, T, H, D) tensors; Pallas on TPU, dense elsewhere.

    Convenience wrapper over the production flat-layout router (the
    head-merging reshape is free — the head axis is already adjacent to
    the lane dim). ``lengths`` (B,) int32 — per-row REAL key/query
    counts for length-bucketed / mixed-length batches; rows are masked
    to their own length and the kernels skip fully-padded blocks.
    """
    b, t, h, d = q.shape
    s = k.shape[1]
    out = flash_attention_flat(
        q.reshape(b, t, h * d),
        k.reshape(b, s, h * d),
        v.reshape(b, s, h * d),
        h,
        lengths=None if lengths is None else jnp.asarray(lengths, jnp.int32),
    )
    return out.reshape(b, t, h, d)
