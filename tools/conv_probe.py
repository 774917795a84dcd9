"""Compare k=3 SAME conv1d formulations at the ResBlock shape
(2, 3600, 192)->(192) bf16 on the chip, slope-timed with a dependent
chain (carry feeds the next call, so nothing is DCE'd).

Usage: python tools/conv_probe.py [--t 3600] [--iters 40]
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


def slope_time(fn, x0, iters):
    def make(n):
        @jax.jit
        def loop(x):
            def body(carry, _):
                return fn(carry).astype(carry.dtype), ()
            out, _ = lax.scan(body, x, None, length=n)
            return out.astype(jnp.float32).sum()
        return loop

    lo, hi = make(iters // 4), make(iters)
    float(lo(x0)); float(hi(x0))
    t0 = time.perf_counter(); float(lo(x0)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(x0)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - iters // 4)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--iters", type=int, default=40)
    args = ap.parse_args()
    B, T, C = 2, args.t, 192
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, C)), dt)
    w = jnp.asarray(rng.standard_normal((3, C, C)) * 0.05, dt)
    wf = w.reshape(3 * C, C)

    def conv_xla(x):
        return lax.conv_general_dilated(
            x, w, (1,), [(1, 1)], dimension_numbers=("NWC", "WIO", "NWC")
        )

    def conv_3mm(x):
        y = x @ w[1]
        y = y.at[:, 1:].add(x[:, :-1] @ w[0])  # shifted taps
        y = y.at[:, :-1].add(x[:, 1:] @ w[2])
        return y

    def conv_3mm_pad(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        return xp[:, :-2] @ w[0] + xp[:, 1:-1] @ w[1] + xp[:, 2:] @ w[2]

    def conv_im2col(x):
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0)))
        cat = jnp.concatenate([xp[:, :-2], xp[:, 1:-1], xp[:, 2:]], axis=-1)
        return cat @ wf

    flops = 2 * B * T * 3 * C * C
    for name, fn in [
        ("xla_conv", conv_xla),
        ("three_matmul_pad", conv_3mm_pad),
        ("three_matmul_at", conv_3mm),
        ("im2col_concat", conv_im2col),
    ]:
        sec = slope_time(fn, x0, args.iters)
        print(
            f"{name:>18}: {sec*1e6:8.1f} us  ({flops/sec/1e12:5.1f} TFLOP/s, "
            f"{flops/sec/197e12*100:4.1f}% MFU)",
            flush=True,
        )


if __name__ == "__main__":
    main()
