"""Profile the T=3600 denoise step with the jax profiler and print a
per-step device-op breakdown (exact, unlike slope timing).

The axon tunnel supports device tracing; 20 chained steps inside one
lax.scan are captured and all device events divided by 20.

Usage: python tools/step_trace.py [--t 3600] [--steps 20] [--out DIR]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import re

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--b", type=int, default=2)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--out", default="/tmp/steptrace")
    ap.add_argument("--hlo", action="store_true", help="also dump HLO text")
    args = ap.parse_args()
    B, T, N = args.b, args.t, args.steps
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from said_tpu.models import unet1d as U
    from said_tpu.models.said import SAID
    from said_tpu.cli._common import init_said_params

    model = SAID(dtype=dt, self_attn_impl="flash", cross_attn_impl="banded")
    params = init_said_params(model, seed=0)
    ctx = jnp.asarray(rng.standard_normal((B, T, 768)), dt)
    kv = U.build_kv_caches(params["denoiser"], ctx, T, num_heads=6, dtype=dt)
    embt = U.time_embed_table(params["denoiser"], np.arange(1000), 192)
    x0 = jnp.asarray(rng.standard_normal((B, T, 32)), jnp.float32)

    @jax.jit
    def loop(x, kv_in, emb_in):
        # caches ride as ARGUMENTS — closing over them bakes ~B·T·many
        # bf16 literals into the HLO (the remote compiler rejects >~50MB
        # request bodies at long T, and constants get worse layouts)
        def body(carry, _):
            out = model.apply(
                {"params": params}, carry, jnp.full((B,), 500, jnp.int32),
                None, deterministic=True, kv_caches=kv_in, emb=emb_in[500],
            )
            return out.astype(carry.dtype).reshape(carry.shape), ()
        out, _ = lax.scan(body, x, None, length=N)
        return out.astype(jnp.float32).sum()

    if args.hlo:
        open("/tmp/hlo.txt", "w").write(
            loop.lower(x0, kv, embt).compile().as_text()
        )
        print("HLO -> /tmp/hlo.txt")

    float(loop(x0, kv, embt))  # compile + warm
    jax.profiler.start_trace(args.out)
    float(loop(x0, kv, embt))
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{args.out}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [p for p, n in pids.items() if n and "TPU" in n]
    agg = collections.defaultdict(float)
    total = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            n = e.get("name", "?")
            # XLA suffixes the loop op on recompiles ("while.8"); both it
            # and the jit_ wrapper envelop the whole chain — track as the
            # total, never as an op.
            if n.split(".")[0] == "while" or n.startswith("jit_"):
                if n.split(".")[0] == "while":
                    total = e.get("dur", 0)
                continue
            agg[n] += e.get("dur", 0)

    cats = collections.defaultdict(float)
    for n, d in agg.items():
        if "_flash_tpu" in n:
            c = "flash_attention"
        elif n.startswith(("copy", "reshape", "pad", "transpose", "convert.")):
            c = "layout (copy/reshape/pad)"
        elif "convolution" in n:
            c = "convolution"
        elif n.startswith("fusion") or "_fusion" in n:
            c = "fusion (matmul/elementwise)"
        else:
            c = "other"
        cats[c] += d
    print(f"\nstep total: {total/N/1e3:.3f} ms  (sum of ops "
          f"{sum(agg.values())/N/1e3:.3f} ms)")
    for c, d in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"{d/N/1e3:8.3f} ms/step  {c}")
    print()
    for n, d in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
        print(f"{d/N:8.1f} us/step  {n[:80]}")


if __name__ == "__main__":
    main()
