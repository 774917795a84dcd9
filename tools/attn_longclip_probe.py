"""Time the >4-minute-clip attention kernel on the real chip.

_flash_tpu_packed_blocked on the flat (B, T, H*D) layout at several
block sizes (the retired per-head-layout kernel measured ~16% slower;
see git history). Slope timing per the axon rule.

Usage: python tools/attn_longclip_probe.py [--lengths 14400,21600,28800]
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


def slope_time(fn, q, k, v, iters):
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
    float(lo(q)); float(hi(q))
    t0 = time.perf_counter(); float(lo(q)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(q)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - iters // 4)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--lengths", default="14400,21600,28800")
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    b, h, d = 2, 6, 32
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    variants = {
        "packed_blocked": lambda q, k, v: pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=h
        ),
        "packed_blocked_bq1024": lambda q, k, v: pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=h, block_q=1024
        ),
        "packed_blocked_bk2048": lambda q, k, v: pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=h, block_k=2048
        ),
    }

    lengths = [int(x) for x in args.lengths.split(",")]
    print(f"# backend={jax.default_backend()} B={b} H={h} D={d} bf16")
    for name, fn in variants.items():
        cells = []
        for t in lengths:
            q = jnp.asarray(rng.standard_normal((b, t, h * d)), dt)
            k = jnp.asarray(rng.standard_normal((b, t, h * d)), dt)
            v = jnp.asarray(rng.standard_normal((b, t, h * d)), dt)
            try:
                sec = slope_time(fn, q, k, v, args.iters)
                flops = 2 * 2 * b * h * t * t * d
                mfu = flops / sec / 1e12 / V5E_BF16_TFLOPS * 100
                cells.append(f"T={t}: {sec*1e3:7.3f}ms ({mfu:4.1f}%)")
            except Exception as e:
                cells.append(f"T={t}: ERR {type(e).__name__}: {e}"[:120])
        print(f"{name:>22}  " + "  ".join(cells), flush=True)


if __name__ == "__main__":
    main()
