"""Sweep self-attention implementations on the real TPU chip.

Times each variant at the SAiD denoiser's self-attention shape
(B=2 CFG batch, H=6 heads, D=32 head dim, bf16) across clip lengths.
Timing follows the repo's axon-tunnel rule (.claude/skills/verify/SKILL.md):
chain ITERS dependent calls inside one jit and materialize one scalar,
then divide — block_until_ready is not a sync point over the tunnel.

Usage:  python tools/attn_sweep.py [--lengths 1800,3600,7200] [--iters 30]
Prints one line per (variant, T): variant, T, ms/call, TFLOP/s, MFU%.
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from said_tpu.ops import pallas_attention as pa

V5E_BF16_TFLOPS = 197.0


def _slope_time(fn, q, k, v, iters):
    """Seconds per call via SLOPE timing: the axon tunnel charges ~26 ms
    per program execution, so time the dependent-call scan at two lengths
    and difference them — launch overhead cancels exactly."""

    def make(n):
        @jax.jit
        def loop(q0):
            def body(carry, _):
                o = fn(carry, k, v)
                return o.astype(carry.dtype), ()
            out, _ = lax.scan(body, q0, None, length=n)
            return out.astype(jnp.float32).sum()
        return loop

    lo, hi = make(iters // 4), make(iters)
    float(lo(q)); float(hi(q))  # compile + warm both
    t0 = time.perf_counter(); float(lo(q)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(q)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - iters // 4)


time_variant = _slope_time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="600,1800,3600,7200")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--h", type=int, default=6)
    ap.add_argument("--d", type=int, default=32)
    args = ap.parse_args()

    lengths = [int(x) for x in args.lengths.split(",")]
    b, h, d = args.b, args.h, args.d
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    variants = {}

    variants["xla_dense"] = pa._dense_reference

    def flat(fn):
        def run(q, k, v):
            b_, t_, h_, d_ = q.shape
            out = fn(
                q.reshape(b_, t_, h_ * d_),
                k.reshape(b_, k.shape[1], h_ * d_),
                v.reshape(b_, v.shape[1], h_ * d_),
                h_,
            )
            return out.reshape(b_, t_, h_, d_)
        return run

    for bq, bk in [(512, 1024), (512, 2048), (1024, 2048)]:
        variants[f"packed_blocked_{bq}x{bk}"] = flat(
            lambda q, k, v, h_, bq=bq, bk=bk: pa._flash_tpu_packed_blocked(
                q, k, v, num_heads=h_, block_q=bq, block_k=bk
            )
        )

    for bq in [128, 256, 512]:
        variants[f"packed_q{bq}"] = flat(
            lambda q, k, v, h_, bq=bq: pa._flash_tpu_packed(
                q, k, v, num_heads=h_, block_q=bq
            )
        )

    print(f"# backend={jax.default_backend()} B={b} H={h} D={d} dtype=bf16 iters={args.iters}")
    header = f"{'variant':>18} " + " ".join(f"{t:>10}" for t in lengths)
    print(header + "   (ms/call, MFU% in parens)")

    for name, fn in variants.items():
        cells = []
        for t in lengths:
            q = jnp.asarray(rng.standard_normal((b, t, h, d)), dt)
            k = jnp.asarray(rng.standard_normal((b, t, h, d)), dt)
            v = jnp.asarray(rng.standard_normal((b, t, h, d)), dt)
            try:
                sec = time_variant(fn, q, k, v, args.iters)
                flops = 2 * 2 * b * h * t * t * d
                mfu = flops / sec / 1e12 / V5E_BF16_TFLOPS * 100
                cells.append(f"{sec*1e3:7.3f}({mfu:4.1f})")
            except Exception as e:
                cells.append(f"ERR:{type(e).__name__}"[:14])
        print(f"{name:>18} " + " ".join(f"{c:>12}" for c in cells), flush=True)


if __name__ == "__main__":
    main()
