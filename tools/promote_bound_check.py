"""On-chip go/no-go for the promoted max-free blocked kernel.

Times the NEW production `_flash_tpu_packed_blocked` (bound-shift,
max-free) against the OLD online-max design (mirrored verbatim by
tools/vpu_probe.blocked_variant(variant="prod")) at the production
shape (T=21600, blocks 512x2048), interleaved slope timing per the
BASELINE.md noise rule, plus an accuracy check of the new kernel vs the
old one and vs f32 dense at T=4096.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/promote_bound_check.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import numpy as np
import jax.numpy as jnp
from jax import lax

from said_tpu.ops import pallas_attention as pa
from vpu_probe import blocked_variant  # the OLD online-max kernel, mirrored

B, H, D, T = 2, 6, 32, 21600
INNER = H * D
BQ, BK = 512, 2048


def make_loop(fn, iters):
    @jax.jit
    def loop(q, k, v):
        def body(carry, _):
            return fn(carry, k, v).astype(carry.dtype), ()

        out, _ = lax.scan(body, q, None, length=iters)
        return out.astype(jnp.float32).sum()

    return loop


def main() -> None:
    rng = np.random.default_rng(0)
    q = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))
    k = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))
    v = jax.device_put(rng.standard_normal((B, T, INNER)).astype(jnp.bfloat16))

    def new_fn(q, k, v):
        return pa._flash_tpu_packed_blocked(
            q, k, v, num_heads=H, block_q=BQ, block_k=BK
        )

    def old_fn(q, k, v):
        return blocked_variant(
            q, k, v, variant="prod", num_heads=H, block_q=BQ, block_k=BK
        )

    # accuracy at T=21600 new-vs-old, and both vs f32 dense at T=4096
    new_out = np.asarray(new_fn(q, k, v).astype(jnp.float32))
    old_out = np.asarray(old_fn(q, k, v).astype(jnp.float32))
    print(f"new vs old @T={T}: max|d| = {np.abs(new_out - old_out).max():.3e}",
          flush=True)
    ts = 4096
    qs, ks, vs = (x[:, :ts] for x in (q, k, v))
    dense = np.asarray(pa._dense_flat(
        qs.astype(jnp.float32), ks.astype(jnp.float32),
        vs.astype(jnp.float32), H))
    for name, fn in (("new", new_fn), ("old", old_fn)):
        o = np.asarray(fn(qs, ks, vs).astype(jnp.float32))
        print(f"  {name} vs f32 dense @T={ts}: max|d| = "
              f"{np.abs(o - dense).max():.3e}", flush=True)

    lo_i, hi_i = 4, 16
    loops = {n: (make_loop(f, lo_i), make_loop(f, hi_i))
             for n, f in (("old", old_fn), ("new", new_fn))}
    for lo, hi in loops.values():
        float(lo(q, k, v)); float(hi(q, k, v))

    rounds = 6
    ms = {n: [] for n in loops}
    for r in range(rounds):
        for n, (lo, hi) in loops.items():
            t0 = time.perf_counter(); float(lo(q, k, v))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter(); float(hi(q, k, v))
            t_hi = time.perf_counter() - t0
            per = (t_hi - t_lo) / (hi_i - lo_i) * 1e3
            ms[n].append(per)
            print(f"round {r} {n}: {per:7.2f} ms/call", flush=True)

    med = {n: sorted(v)[len(v) // 2] for n, v in ms.items()}
    wins = sum(a > b for a, b in zip(ms["old"], ms["new"]))
    print(f"\nmedians: old {med['old']:.2f} ms, new {med['new']:.2f} ms "
          f"-> {med['old'] / med['new']:.3f}x, new wins {wins}/{rounds} "
          f"paired rounds", flush=True)


if __name__ == "__main__":
    main()
