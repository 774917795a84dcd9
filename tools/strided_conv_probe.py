"""Time the wav2vec2 feature-extractor stride-2 convs: XLA conv+gelu vs
the fused Pallas strided_conv_gelu kernel, slope-timed with a dependent
chain at the training shape (batch 8, window 128 → 34133 samples).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/strided_conv_probe.py
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
                out = fn(carry)
                # re-inject a slice of the output so the chain depends on
                # the full computation (shapes shrink through the stack)
                nxt = carry + jnp.pad(
                    out.astype(carry.dtype).reshape(-1)[: carry.shape[1]],
                    (0, max(0, carry.shape[1] - out.size)),
                )[None, :, None]
                return nxt, ()

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
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--samples", type=int, default=34133)
    ap.add_argument("--iters", type=int, default=24)
    args = ap.parse_args()

    from said_tpu.ops.pallas_conv import strided_conv_gelu_pallas

    dt = jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32
    rng = np.random.default_rng(0)
    kernels = [(10, 5), (3, 2), (3, 2), (3, 2), (3, 2), (2, 2), (2, 2)]

    # input to conv_1 (post conv_0): (B, T0, 512)
    t0_len = (args.samples - 10) // 5 + 1
    x0 = jnp.asarray(
        rng.standard_normal((args.batch, t0_len, 512)) * 0.5, dt
    )
    ws = [
        jnp.asarray(rng.standard_normal((k, 512, 512)) * 0.03, dt)
        for k, s in kernels[1:]
    ]

    def stack_xla(x):
        h = x
        for w, (k, s) in zip(ws, kernels[1:]):
            h = lax.conv_general_dilated(
                h, w, (s,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
            )
            h = jax.nn.gelu(h, approximate=False)
        return h

    def stack_fused(x):
        h = x
        for w in ws:
            h = strided_conv_gelu_pallas(h, w)
        return h

    # FLOPs of the six stride-2 layers
    t_len, flops = t0_len, 0
    for k, s in kernels[1:]:
        t_len = (t_len - k) // s + 1
        flops += 2 * args.batch * t_len * k * 512 * 512

    for name, fn in [("xla_conv_stack", stack_xla), ("fused_pallas", stack_fused)]:
        sec = slope_time(fn, x0, args.iters)
        print(
            f"{name:>16}: {sec*1e6:9.1f} us  ({flops/sec/1e12:5.1f} TFLOP/s, "
            f"{flops/sec/197e12*100:4.1f}% MFU)",
            flush=True,
        )


if __name__ == "__main__":
    main()
