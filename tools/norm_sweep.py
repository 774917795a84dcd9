"""Compare GroupNorm/LayerNorm formulations inside the FULL UNet step,
each profiled with the jax profiler (exact device totals).

Variants:
  old    materialize x.astype(f32), reduce over (T, C/G)  [r1 shipped]
  fused  per-consumer converts, same reduction axes
  lane   T-first sublane reductions: sum over T -> (B, C) f32, then the
         tiny (B, G, C/G) group-sum; exact two-pass
  lane1  same but single-pass sum/sumsq (E[x2]-mean2)

Usage: python tools/norm_sweep.py [--t 3600] [--steps 20]
"""

from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


def gn_old(x, g, scale, bias, eps=1e-5, act="none"):
    b, t, c = x.shape
    xf = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    out = xf.reshape(b, t, c) * scale + bias
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


def ln_old(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    return (((xf - mean) / jnp.sqrt(var + eps)) * scale + bias).astype(x.dtype)


def gn_fused(x, g, scale, bias, eps=1e-5, act="none"):
    b, t, c = x.shape
    n = t * (c // g)
    xg = x.reshape(b, t, g, c // g)
    mean = jnp.sum(xg, axis=(1, 3), keepdims=True, dtype=jnp.float32) / n
    centered = xg.astype(jnp.float32) - mean
    var = jnp.sum(jnp.square(centered), axis=(1, 3), keepdims=True) / n
    out = centered * jax.lax.rsqrt(var + eps)
    out = out.reshape(b, t, c) * scale + bias
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


def ln_fused(x, scale, bias, eps=1e-5):
    c = x.shape[-1]
    mean = jnp.sum(x, axis=-1, keepdims=True, dtype=jnp.float32) / c
    centered = x.astype(jnp.float32) - mean
    var = jnp.sum(jnp.square(centered), axis=-1, keepdims=True) / c
    return (centered * jax.lax.rsqrt(var + eps) * scale + bias).astype(x.dtype)


def gn_lane(x, g, scale, bias, eps=1e-5, act="none"):
    b, t, c = x.shape
    n = t * (c // g)
    s = jnp.sum(x, axis=1, dtype=jnp.float32)  # (B, C) sublane reduce
    mean_g = s.reshape(b, g, c // g).sum(-1) / n  # tiny
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)[:, None, :]
    d = x.astype(jnp.float32) - mean_c
    ss = jnp.sum(d * d, axis=1)  # (B, C)
    var_g = ss.reshape(b, g, c // g).sum(-1) / n
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g, axis=-1)[:, None, :]
    out = d * rstd_c * scale + bias
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


def gn_lane1(x, g, scale, bias, eps=1e-5, act="none"):
    b, t, c = x.shape
    n = t * (c // g)
    xf = x.astype(jnp.float32)
    s = jnp.sum(xf, axis=1)
    ss = jnp.sum(xf * xf, axis=1)
    mean_g = s.reshape(b, g, c // g).sum(-1) / n
    var_g = ss.reshape(b, g, c // g).sum(-1) / n - mean_g * mean_g
    mean_c = jnp.repeat(mean_g, c // g, axis=-1)[:, None, :]
    rstd_c = jnp.repeat(jax.lax.rsqrt(var_g + eps), c // g, axis=-1)[:, None, :]
    out = (xf - mean_c) * rstd_c * scale + bias
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


VARIANTS = {
    "old": (gn_old, ln_old),
    "fused": (gn_fused, ln_fused),
    "lane": (gn_lane, ln_fused),
    "lane1": (gn_lane1, ln_fused),
}


def profile_step(tag, outdir, steps, t):
    import said_tpu.ops.norms as norms_mod
    from said_tpu.models import unet1d as U
    from said_tpu.models.said import SAID
    from said_tpu.cli._common import init_said_params

    B, T, N = 2, t, steps
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = SAID(dtype=dt, self_attn_impl="flash", cross_attn_impl="banded")
    params = init_said_params(model, seed=0)
    ctx = jnp.asarray(rng.standard_normal((B, T, 768)), dt)
    kv = U.build_kv_caches(params["denoiser"], ctx, T, num_heads=6, dtype=dt)
    embt = U.time_embed_table(params["denoiser"], np.arange(1000), 192)
    x0 = jnp.asarray(rng.standard_normal((B, T, 32)), jnp.float32)

    @jax.jit
    def loop(x):
        def body(carry, _):
            out = model.apply(
                {"params": params}, carry, jnp.full((B,), 500, jnp.int32),
                None, deterministic=True, kv_caches=kv, emb=embt[500],
            )
            return out.astype(carry.dtype).reshape(carry.shape), ()
        out, _ = lax.scan(body, x, None, length=N)
        return out.astype(jnp.float32).sum()

    float(loop(x0))
    jax.profiler.start_trace(outdir)
    float(loop(x0))
    jax.profiler.stop_trace()

    traces = sorted(glob.glob(f"{outdir}/plugins/profile/*/*.trace.json.gz"))
    with gzip.open(traces[-1]) as f:
        data = json.load(f)
    ev = data.get("traceEvents", [])
    pids = {
        e["pid"]: e["args"].get("name")
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    dev = [p for p, n in pids.items() if n and "TPU" in n]
    total = flash = layout = 0.0
    for e in ev:
        if e.get("ph") == "X" and e.get("pid") in dev:
            n = e.get("name", "?")
            if n.split(".")[0] == "while":  # recompiles suffix it: "while.8"
                total = e.get("dur", 0)
            elif "_flash_tpu" in n:
                flash += e.get("dur", 0)
            elif n.startswith(("copy", "reshape", "pad", "transpose")):
                layout += e.get("dur", 0)
    print(
        f"{tag:>7}: step {total/N/1e3:7.3f} ms  (flash {flash/N/1e3:.3f}, "
        f"layout {layout/N/1e3:.3f}, rest {(total-flash-layout)/N/1e3:.3f})",
        flush=True,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants", default="old,fused,lane,lane1")
    args = ap.parse_args()

    import said_tpu.ops.norms as norms_mod
    from said_tpu.models import unet1d as U

    for tag in args.variants.split(","):
        gn, ln = VARIANTS[tag]
        U.group_norm = gn
        U.layer_norm_f32 = ln
        outdir = f"/tmp/normsweep_{tag}"
        os.system(f"rm -rf {outdir}")
        profile_step(tag, outdir, args.steps, args.t)


if __name__ == "__main__":
    main()
