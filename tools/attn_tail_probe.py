"""On-chip A/B for the round-5 blocked-attention changes at T=21600.

Two candidate changes to ``_flash_tpu_packed_blocked`` rode this probe
(measured 2026-08-19 on the real chip, B=2, H=6, D=32, bf16, slope
timing, interleaved pairs):

1. split-tail masking — KEPT. Only the last key block pays the -inf
   masking (iota + per-head where over the (block_q, block_k) f32
   score block) instead of every block. Bit-identical by construction
   (the removed work was an all-True mask); both probe configs run it.
2. pad-minimizing block_k (2048 → 1664, key-axis padding waste
   4.3% → 0.15%) — **MEASURED NO-GO**: median 19.03 ms vs 17.94 ms for
   the tuned 2048, 0/6 paired rounds won, despite 4% less arithmetic.
   The wider block's fewer grid steps / better MXU pipelining outweigh
   the padded columns at this shape. Production keeps 2048.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/attn_tail_probe.py
Prints per-round ms for each config and the paired verdict.
"""

from __future__ import annotations

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


def make_loop(block_k: int, iters: int):
    @jax.jit
    def loop(q, k, v):
        def body(carry, _):
            o = pa._flash_tpu_packed_blocked(
                carry, k, v, num_heads=H, block_q=512, block_k=block_k
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

    iters_lo, iters_hi = 4, 16
    cfgs = {
        2048: (make_loop(2048, iters_lo), make_loop(2048, iters_hi)),
        1664: (make_loop(1664, iters_lo), make_loop(1664, iters_hi)),
    }
    # numerics cross-check first (also compiles+warms everything)
    outs = {}
    for bk in cfgs:
        outs[bk] = pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=H, block_q=512, block_k=bk
        )
        for lo, hi in [cfgs[bk]]:
            float(lo(q, k, v))
            float(hi(q, k, v))
    err = float(
        jnp.abs(
            outs[2048].astype(jnp.float32) - outs[1664].astype(jnp.float32)
        ).max()
    )
    print(f"max |out(2048) - out(1664)| = {err:.3e}", flush=True)

    rounds = 6
    ms = {bk: [] for bk in cfgs}
    for r in range(rounds):
        for bk, (lo, hi) in cfgs.items():  # interleaved A/B every round
            t0 = time.perf_counter()
            float(lo(q, k, v))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            float(hi(q, k, v))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (iters_hi - iters_lo) * 1e3
            ms[bk].append(per)
            print(f"round {r} block_k={bk}: {per:7.2f} ms/call", flush=True)

    med = {bk: sorted(v)[len(v) // 2] for bk, v in ms.items()}
    wins = sum(a > b for a, b in zip(ms[2048], ms[1664]))
    print(
        f"median ms: 2048={med[2048]:.2f} 1664={med[1664]:.2f} "
        f"({med[2048] / med[1664]:.3f}x); 1664 wins {wins}/{rounds} "
        f"paired rounds",
        flush=True,
    )


if __name__ == "__main__":
    main()
