"""Go/no-go probe for int8 QK^T inside the flash-attention kernel.

The denoiser's head_dim is 32, so the bf16 QK^T fills only 32 of the
MXU's 128 systolic rows (~25% ceiling — see ops/pallas_attention.py's
header). On TPUs whose MXU runs int8 at 2x the bf16 rate, quantizing
Q/K to int8 could raise the ceiling of the 6-minute-clip bottleneck —
IF Mosaic actually lowers an int8 x int8 -> int32 dot at these shapes
to the fast path. That "if" is what this probe measures, BEFORE any
kernel investment (NEXT_STEPS.md flags int8 QK^T as the one untried
lever).

Stages (same (B*H, T, D) per-head layout as tools/attn_probe.py):

- dot_bf16 / dot_int8: the raw QK^T dot_general alone — the pure MXU
  throughput question. A dot_int8 speedup well under ~1.5x is a no-go.
- full_bf16: the production online-softmax body (QK + max + exp + PV).
- full_int8qk: int8 QK^T -> int32 scores, running max kept in raw int
  units (max commutes with the positive dequant scale), dequant folded
  into the exp2 argument, PV kept bf16. The realistic Amdahl case.
- full_int8qkpv: additionally quantizes the probabilities (p*127, one
  extra VPU pass) and V (per-tensor) so BOTH matmuls run int8. The
  ones-augmented denominator column becomes the constant 127. Upper
  bound of the approach — and its numerics bill includes the p<1/254
  truncation, which matters at long T (many small tail probabilities).

Also prints max |output - f32 dense| for both full variants so the
throughput answer comes with its numerics bill (per-tensor symmetric
quantization — production would use per-row scales, i.e. strictly
better).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/int8_qk_probe.py \
    [--t 14336] [--block_q 512] [--block_k 2048] [--iters 24] [--interpret]
"""

from __future__ import annotations

import argparse
import math
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LOG2E = math.log2(math.e)


def build(stage: str, t: int, block_q: int, block_k: int, b: int, h: int,
          d: int, dequant_log2: float = 0.0, pv_scale: float = 1.0,
          interpret: bool = False):
    """One jitted pallas_call for the given stage.

    int8 stages take pre-quantized q/k (int8); ``dequant_log2`` is the
    compile-time constant (sq*sk*softmax_scale*log2e) that maps raw
    int32 scores to exp2 arguments. bf16 stages take bf16 q/k with the
    softmax scale and log2e pre-folded into Q (as production does).
    """
    num_q = t // block_q
    num_k = t // block_k
    int8_qk = stage in ("dot_int8", "full_int8qk", "full_int8qkpv")
    int8_pv = stage == "full_int8qkpv"
    is_dot = stage.startswith("dot_")
    acc_d = d if is_dot else d + 1

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, acc_scr):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -(2.0 ** 30))
            acc_scr[...] = jnp.zeros_like(acc_scr)

        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]

        sc = lax.dot_general(
            qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32 if int8_qk else jnp.float32,
        )

        if is_dot:
            # raw QK^T throughput: accumulate a (block_q, d) slice of the
            # scores so the dot cannot be DCE'd; minimal extra VPU work
            acc_scr[...] += sc[:, :d].astype(jnp.float32)

            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = acc_scr[...].astype(o_ref.dtype)
            return

        # full online-softmax body (ones-augmented V, exp2 softmax)
        m_prev = m_scr[...]
        if int8_qk:
            # running max in raw int score units (the positive dequant
            # scale commutes with max); dequant fused into exp2's input
            m_new = jnp.maximum(
                m_prev, sc.max(axis=-1, keepdims=True).astype(jnp.float32)
            )
            p = jnp.exp2((sc.astype(jnp.float32) - m_new) * dequant_log2)
            alpha = jnp.exp2((m_prev - m_new) * dequant_log2)
        else:
            m_new = jnp.maximum(m_prev, sc.max(axis=-1, keepdims=True))
            p = jnp.exp2(sc - m_new)
            alpha = jnp.exp2(m_prev - m_new)
        if int8_pv:
            # both matmuls int8: quantize p (in [0, 1]) to p*127; the
            # ones-augmented denominator column of vb is the constant
            # 127, so out = acc[:, :d]·sv·127 / acc[:, d] exactly cancels
            # the scales at finalize time (folded into sv by the caller)
            pq = jnp.rint(p * 127.0).astype(jnp.int8)
            acc_scr[...] = acc_scr[...] * alpha + lax.dot_general(
                pq, vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            ).astype(jnp.float32)
        else:
            acc_scr[...] = acc_scr[...] * alpha + lax.dot_general(
                p.astype(vb.dtype), vb,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
        m_scr[...] = m_new

        @pl.when(ki == num_k - 1)
        def _():
            acc = acc_scr[...]
            num = acc[:, :d] * pv_scale if int8_pv else acc[:, :d]
            o_ref[0] = (num / acc[:, d:d + 1]).astype(o_ref.dtype)

    @jax.jit
    def run(qf, kf, vf):
        return pl.pallas_call(
            kernel,
            grid=(b * h, num_q, num_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, vf.shape[2]),
                             lambda bh, qi, ki: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec(
                (1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)
            ),
            out_shape=jax.ShapeDtypeStruct((b * h, t, d), jnp.bfloat16),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, acc_d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=interpret,
        )(qf, kf, vf)

    return run


def slope_time(fn, q, k, v, iters):
    """Seconds per call, launch overhead cancelled (see attn_probe.py)."""

    def make(n):
        @jax.jit
        def loop(q0):
            def body(carry, _):
                o = fn(carry, k, v)
                # chain a data dependency without changing the carry's
                # dtype or (for int8) its quantized values
                nxt = (q.astype(jnp.float32)
                       + o[:, :, :1].astype(jnp.float32) * 0).astype(q.dtype)
                return nxt, ()
            out, _ = lax.scan(body, q0, None, length=n)
            return out.astype(jnp.float32).sum()
        return loop

    lo, hi = make(iters // 4), make(iters)
    float(lo(q)); float(hi(q))
    t0 = time.perf_counter(); float(lo(q)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(q)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - iters // 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=14336)
    ap.add_argument("--iters", type=int, default=24)
    ap.add_argument("--block_q", type=int, default=512)
    ap.add_argument("--block_k", type=int, default=2048)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU interpret-mode numerics check only")
    args = ap.parse_args()

    if args.interpret:
        jax.config.update("jax_platforms", "cpu")

    b, h, d = 1, 6, 32
    t = args.t
    rng = np.random.default_rng(0)
    q32 = rng.standard_normal((b * h, t, d)).astype(np.float32)
    k32 = rng.standard_normal((b * h, t, d)).astype(np.float32)
    v32 = rng.standard_normal((b * h, t, d)).astype(np.float32)

    scale = d**-0.5
    # bf16 inputs: softmax scale and log2(e) pre-folded into Q (production)
    q_bf = jnp.asarray(q32 * scale * _LOG2E, jnp.bfloat16)
    k_bf = jnp.asarray(k32, jnp.bfloat16)
    ones = np.ones((b * h, t, 1), np.float32)
    v_aug = jnp.asarray(np.concatenate([v32, ones], -1), jnp.bfloat16)
    v_plain = jnp.asarray(v32, jnp.bfloat16)

    # int8 inputs: per-tensor symmetric quantization
    sq = float(np.abs(q32).max() / 127.0)
    sk = float(np.abs(k32).max() / 127.0)
    q_i8 = jnp.asarray(np.clip(np.rint(q32 / sq), -127, 127), jnp.int8)
    k_i8 = jnp.asarray(np.clip(np.rint(k32 / sk), -127, 127), jnp.int8)
    dequant_log2 = sq * sk * scale * _LOG2E  # raw int32 score -> exp2 arg

    # int8 V for the qkpv stage: per-tensor scale, ones column -> 127
    sv = float(np.abs(v32).max() / 127.0)
    v_i8 = jnp.asarray(
        np.concatenate(
            [np.clip(np.rint(v32 / sv), -127, 127), 127.0 * ones], -1
        ),
        jnp.int8,
    )
    pv_scale = sv * 127.0  # folds both 1/127 prob scales at finalize

    # f32 dense oracle for numerics
    sc = np.einsum("btd,bsd->bts", q32, k32) * scale
    p = np.exp(sc - sc.max(-1, keepdims=True))
    oracle = np.einsum("bts,bsd->btd", p / p.sum(-1, keepdims=True), v32)

    flops = 2 * (b * h) * t * t * d  # one QK^T pass
    print(f"# T={t} blocks {args.block_q}x{args.block_k} B*H={b*h} D={d} "
          f"backend={jax.default_backend()}")

    results = {}
    for stage in ["dot_bf16", "dot_int8", "full_bf16", "full_int8qk",
                  "full_int8qkpv"]:
        fn = build(stage, t, args.block_q, args.block_k, b, h, d,
                   dequant_log2=dequant_log2 if "int8" in stage else 0.0,
                   pv_scale=pv_scale,
                   interpret=args.interpret)
        qa = q_i8 if "int8" in stage else q_bf
        ka = k_i8 if "int8" in stage else k_bf
        va = (v_plain if stage.startswith("dot_")
              else v_i8 if stage == "full_int8qkpv" else v_aug)
        try:
            out = np.asarray(fn(qa, ka, va), np.float32)
        except Exception as e:
            print(f"{stage:>14}: FAILED {type(e).__name__}: {e}"[:300],
                  flush=True)
            continue
        err = ""
        if stage.startswith("full_"):
            err = f"  max|err|={np.abs(out - oracle).max():.3e}"
        if args.interpret:
            print(f"{stage:>14}: ok{err}", flush=True)
            continue
        sec = slope_time(fn, qa, ka, va, args.iters)
        results[stage] = sec
        eff = flops / sec / 1e12
        print(f"{stage:>14}: {sec*1e3:8.3f} ms  {eff:6.1f} Top/s{err}",
              flush=True)

    if "dot_bf16" in results and "dot_int8" in results:
        r = results["dot_bf16"] / results["dot_int8"]
        print(f"# dot int8 speedup: {r:.2f}x  "
              f"({'GO' if r >= 1.5 else 'NO-GO'} for kernel work)")
    if "full_bf16" in results and "full_int8qk" in results:
        r = results["full_bf16"] / results["full_int8qk"]
        print(f"# full-kernel int8-QK speedup: {r:.2f}x")
    if "full_bf16" in results and "full_int8qkpv" in results:
        r = results["full_bf16"] / results["full_int8qkpv"]
        print(f"# full-kernel int8-QK+PV speedup: {r:.2f}x")


if __name__ == "__main__":
    main()
