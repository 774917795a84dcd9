"""On-chip decomposition of the blocked flash kernel's NON-MXU time.

Motivation (round-5 int8 probe side-finding, tools/int8_qk_probe.py):
the bf16 QK^T dot alone measures ~87 TFLOP/s at these shapes while the
full blocked kernel runs at ~40 TFLOP/s effective — so roughly half the
kernel's time is NOT the matmuls; it is the VPU passes over each
(block_q, block_k) f32 score block: rowmax, subtract+exp2, and the
f32->bf16 cast feeding PV. This probe times structural variants that
each delete or shrink one of those passes, to find which (if any) is
worth a production change:

  prod   — the production `_flash_tpu_packed_blocked` (baseline).
  nomax  — online max ELIMINATED: p = exp2(s2 - C) for a constant C
           (mathematically identical result when no row under/overflows;
           deletes the rowmax pass, the running-max scratch, and the
           accumulator alpha-rescale).
  bf16s  — the score block lives in BF16: QK^T accumulates f32 on the
           MXU (Mosaic requires a 32-bit matmul acc) but is downcast
           immediately, so mask/max/exp2 run on half the bytes and
           exp2's output feeds PV with no separate cast pass.
           (Accuracy cost measured below: bf16 scores round at ~0.4%
           relative BEFORE exp2.)
  noexp  — exp2 replaced by identity (p = s2 - m_new): NOT semantically
           valid, times the transcendental's marginal cost only.
  bound  — the PRODUCTION-SAFE nomax candidate: the exp2 shift is a
           per-row Cauchy-Schwarz bound M_i = ||q̃_i||·max_j||k_j||
           (per head, computed OUTSIDE the kernel in O(T·d) and fed in
           as a (B, T, H) input) instead of the online running max —
           mathematically identical by softmax shift-invariance, and
           M_i >= true row max so exp2 can never overflow; the exp2
           argument is clamped at -80 so the ones-column denominator
           can never underflow to 0 (no NaN on ANY input). Deletes the
           rowmax pass, the running-max scratch, and the alpha rescale,
           exactly like nomax.

Timing: slope method (two scan lengths, launch overhead cancels),
interleaved A/B per round, medians over 6 rounds — the tunnel's ±10%
noise rule applies (see BASELINE.md / the verify skill).

Accuracy: each variant's output is compared against the production
kernel at T=21600 (bf16) and against a full-f32 dense reference at
T=4096 (where the dense score tensor fits HBM).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/vpu_probe.py
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from said_tpu.ops import pallas_attention as pa

B, H, D, T = 2, 6, 32, 21600
INNER = H * D
BQ, BK = 512, 2048
_LOG2E = pa._LOG2E


def qk_shift_bound(q, k, num_heads: int):
    """Per-row, per-head upper bound on the exp2-folded scores:
    M[b,t,h] = ||q̃[b,t,h,:]|| · max_s ||k[b,s,h,:]|| + 1, computed from
    the POST-bf16-rounding tensors (what the MXU actually multiplies) so
    Cauchy-Schwarz holds for the realized products; +1 absorbs the f32
    accumulation slop. O(T·d) work, fused by XLA."""
    import math as _math

    b, t, inner = q.shape
    h = num_heads
    d = inner // h
    fold = d**-0.5 * _math.log2(_math.e)
    qf = (q.astype(jnp.float32) * fold).astype(q.dtype)
    qn = jnp.linalg.norm(
        qf.astype(jnp.float32).reshape(b, t, h, d), axis=-1
    )
    kn = jnp.linalg.norm(
        k.astype(jnp.float32).reshape(b, k.shape[1], h, d), axis=-1
    ).max(axis=1)
    return qn * kn[:, None, :] + 1.0


@functools.partial(
    jax.jit,
    static_argnames=("variant", "num_heads", "block_q", "block_k",
                     "interpret"),
)
def blocked_variant(q, k, v, m_bound=None, variant: str = "prod",
                    num_heads: int = 6,
                    block_q: int = 512, block_k: int = 2048,
                    interpret: bool = False):
    """`_flash_tpu_packed_blocked` with one structural knob per variant.

    Mirrors the production kernel (same grid, specs, scratch, split-tail
    masking) so the ONLY delta each variant times is the named change.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h

    t_pad = pa._round_up(t, block_q)
    s_pad = pa._round_up(s, block_k)

    score_dtype = jnp.bfloat16 if variant == "bf16s" else jnp.float32
    # nomax: constant shift so exp2 cannot overflow for |s2| <= ~120;
    # chosen near the observed score scale so typical p stays O(1).
    C = 16.0

    qs = (q.astype(jnp.float32) * (d**-0.5 * _LOG2E)).astype(q.dtype)
    ones = jnp.ones((b, s, h, 1), v.dtype)
    va = jnp.concatenate(
        [v.reshape(b, s, h, d), ones], axis=-1
    ).reshape(b, s, h * (d + 1))
    if t_pad > t:
        qs = jnp.pad(qs, ((0, 0), (0, t_pad - t), (0, 0)))
        if m_bound is not None:
            m_bound = jnp.pad(m_bound, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad > s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        va = jnp.pad(va, ((0, 0), (0, s_pad - s), (0, 0)))

    num_q = t_pad // block_q
    num_k = s_pad // block_k
    last_k = num_k - 1
    static_tail = s_pad > s

    def body(q_ref, k_ref, v_ref, m_ref, o_ref, m_scr, acc_scr):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            if variant not in ("nomax", "bound"):
                m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        def _head_updates(mask_limit):
            qb = q_ref[0]
            kb = k_ref[0]
            vb = v_ref[0]
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
                    # Mosaic requires a 32-bit matmul accumulator; the
                    # bf16s variant downcasts the score block right at
                    # the MXU boundary instead
                    preferred_element_type=jnp.float32,
                ).astype(score_dtype)
                if variant == "bound":
                    # shift by the per-row bound (masking moves AFTER
                    # exp2 as a where-zero: -inf would clamp UP to -80)
                    shifted = jnp.maximum(
                        s2 - m_ref[0][:, hh:hh + 1], -80.0
                    )
                    p = jnp.exp2(shifted)
                    if mask_limit is not None:
                        p = jnp.where(col < mask_limit, p, 0.0)
                    acc_scr[hh] = acc_scr[hh] + jax.lax.dot_general(
                        p.astype(vb.dtype),
                        vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    continue
                if mask_limit is not None:
                    s2 = jnp.where(col < mask_limit, s2,
                                   jnp.asarray(-jnp.inf, score_dtype))
                if variant == "nomax":
                    p = jnp.exp2(s2 - jnp.asarray(C, score_dtype))
                    acc_scr[hh] = acc_scr[hh] + jax.lax.dot_general(
                        p.astype(vb.dtype),
                        vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    continue
                m_prev = m_scr[hh]
                m_new = jnp.maximum(
                    m_prev, s2.max(axis=-1, keepdims=True).astype(jnp.float32)
                )
                shifted = s2 - m_new.astype(score_dtype)
                if variant == "noexp":
                    p = shifted  # transcendental deleted (timing only)
                else:
                    p = jnp.exp2(shifted)
                alpha = jnp.exp2(m_prev - m_new)
                acc_scr[hh] = acc_scr[hh] * alpha + jax.lax.dot_general(
                    p.astype(vb.dtype),
                    vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                m_scr[hh] = m_new

        if static_tail:
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
                o_ref[0, :, hh * d:(hh + 1) * d] = (
                    acc[:, :d] / acc[:, d:d + 1]
                ).astype(o_ref.dtype)

    grid = (b, num_q, num_k)
    in_specs = [
        pl.BlockSpec((1, block_q, inner), lambda bi, qi, ki: (bi, qi, 0)),
        pl.BlockSpec((1, block_k, inner), lambda bi, qi, ki: (bi, ki, 0)),
        pl.BlockSpec(
            (1, block_k, h * (d + 1)), lambda bi, qi, ki: (bi, ki, 0)
        ),
    ]
    inputs = [qs, k, va]
    if variant == "bound":
        in_specs.append(
            pl.BlockSpec((1, block_q, h), lambda bi, qi, ki: (bi, qi, 0))
        )
        inputs.append(m_bound.astype(jnp.float32))
        kernel = body
    else:
        def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr):
            body(q_ref, k_ref, v_ref, None, o_ref, m_scr, acc_scr)

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (1, block_q, inner), lambda bi, qi, ki: (bi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((h, block_q, 1), jnp.float32),
            pltpu.VMEM((h, block_q, d + 1), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t_pad * s_pad * d,
            bytes_accessed=b * (t_pad + 2 * s_pad * num_q) * inner
            * q.dtype.itemsize,
            transcendentals=b * h * t_pad * s_pad,
        ),
        interpret=interpret,
    )(*inputs)
    return out[:, :t]


def make_loop(variant: str, iters: int):
    @jax.jit
    def loop(q, k, v):
        def body(carry, _):
            if variant == "prod":
                o = pa._flash_tpu_packed_blocked(
                    carry, k, v, num_heads=H, block_q=BQ, block_k=BK
                )
            elif variant == "bound":
                # the bound computation is part of what production
                # would pay per call — keep it inside the timed body
                m = qk_shift_bound(carry, k, H)
                o = blocked_variant(
                    carry, k, v, m, variant="bound", num_heads=H,
                    block_q=BQ, block_k=BK,
                )
            else:
                o = blocked_variant(
                    carry, k, v, variant=variant, num_heads=H,
                    block_q=BQ, block_k=BK,
                )
            return o.astype(carry.dtype), ()

        out, _ = lax.scan(body, q, None, length=iters)
        return out.astype(jnp.float32).sum()

    return loop


def main() -> None:
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))
    k = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))
    v = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))

    variants = ["prod", "nomax", "bf16s", "noexp", "bound"]

    # ---- accuracy first (also compiles + warms the T=21600 programs)
    prod_out = np.asarray(
        pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=H, block_q=BQ, block_k=BK
        ).astype(jnp.float32)
    )
    print("accuracy vs production kernel @ T=21600 (bf16 in/out):",
          flush=True)
    for vr in ("nomax", "bf16s", "bound"):
        m = qk_shift_bound(q, k, H) if vr == "bound" else None
        o = np.asarray(
            blocked_variant(q, k, v, m, variant=vr, num_heads=H,
                            block_q=BQ, block_k=BK).astype(jnp.float32)
        )
        print(f"  {vr}: max|Δ| = {np.abs(o - prod_out).max():.3e}",
              flush=True)

    # f32 dense ground truth at a length the dense scores fit
    t_small = 4096
    qs, ks, vs = (x[:, :t_small] for x in (q, k, v))
    dense = np.asarray(
        pa._dense_flat(
            qs.astype(jnp.float32), ks.astype(jnp.float32),
            vs.astype(jnp.float32), H,
        )
    )
    print(f"accuracy vs f32 dense @ T={t_small}:", flush=True)
    for vr in ("prod", "nomax", "bf16s", "bound"):
        if vr == "prod":
            o = pa._flash_tpu_packed_blocked(
                qs, ks, vs, num_heads=H, block_q=BQ, block_k=BK
            )
        else:
            m = qk_shift_bound(qs, ks, H) if vr == "bound" else None
            o = blocked_variant(qs, ks, vs, m, variant=vr, num_heads=H,
                                block_q=BQ, block_k=BK)
        o = np.asarray(o.astype(jnp.float32))
        print(f"  {vr}: max|Δ| = {np.abs(o - dense).max():.3e}", flush=True)

    # ---- slope timing, interleaved
    iters_lo, iters_hi = 4, 16
    loops = {vr: (make_loop(vr, iters_lo), make_loop(vr, iters_hi))
             for vr in variants}
    for lo, hi in loops.values():  # compile + warm
        float(lo(q, k, v))
        float(hi(q, k, v))

    rounds = 6
    ms = {vr: [] for vr in variants}
    for r in range(rounds):
        for vr, (lo, hi) in loops.items():
            t0 = time.perf_counter()
            float(lo(q, k, v))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(hi(q, k, v))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (iters_hi - iters_lo) * 1e3
            ms[vr].append(per)
            print(f"round {r} {vr:>6}: {per:7.2f} ms/call", flush=True)

    med = {vr: sorted(v)[len(v) // 2] for vr, v in ms.items()}
    base = med["prod"]
    print("\nmedians:", flush=True)
    for vr in variants:
        wins = sum(a > b for a, b in zip(ms["prod"], ms[vr]))
        print(
            f"  {vr:>6}: {med[vr]:7.2f} ms  ({base / med[vr]:.3f}x vs prod, "
            f"wins {wins}/{rounds} paired rounds)",
            flush=True,
        )


if __name__ == "__main__":
    main()
