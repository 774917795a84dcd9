"""Bisect the sampler step's cost beyond the raw UNet forward at T=3600.

Variants (each slope-timed as a scan of dependent steps):
  unet_only     UNet forward on a fixed (2, T, 32) batch  (step_probe's number)
  concat_split  + CFG doubling concat and output split/combine
  ddim          + the DDIM update
  full          the exact sampler step (what the pipeline runs)

Usage: python tools/sampler_probe.py [--t 3600] [--iters 30]
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


def slope(make_loop, iters):
    lo, hi = make_loop(max(iters // 4, 1)), make_loop(iters)
    float(lo()); float(hi())
    t0 = time.perf_counter(); float(lo()); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi()); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - max(iters // 4, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    T, it = args.t, args.iters
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from said_tpu.cli._common import init_said_params
    from said_tpu.diffusion.schedule import DiffusionSchedule, cfg_combine, ddim_step
    from said_tpu.models.said import SAID
    from said_tpu.models.unet1d import build_kv_caches, time_embed_table

    model = SAID(dtype=dt, self_attn_impl="flash", cross_attn_impl="banded")
    params = init_said_params(model, seed=0)
    schedule = DiffusionSchedule.create(1000)

    ctx = jnp.asarray(rng.standard_normal((2, T, 768)), dt)
    kv = build_kv_caches(params["denoiser"], ctx, T, num_heads=6, dtype=dt)
    embt = time_embed_table(params["denoiser"], np.arange(1000), 192)

    def denoise(x, t_scalar):
        b = x.shape[0]
        return model.apply(
            {"params": params}, x, jnp.broadcast_to(t_scalar, (b,)), None,
            deterministic=True, kv_caches=kv, emb=embt[t_scalar],
        )

    x2 = jnp.asarray(rng.standard_normal((2, T, 32)), jnp.float32)
    x1 = x2[:1]

    def chain(step, x0, n):
        ts = jnp.linspace(999, 0, n).astype(jnp.int32)

        @jax.jit
        def loop():
            def body(carry, t):
                return step(carry, t), ()
            out, _ = lax.scan(body, x0, ts)
            return out.astype(jnp.float32).sum()
        return loop

    res = {}

    res["unet_only"] = slope(
        lambda n: chain(lambda x, t: denoise(x, t).astype(x.dtype), x2, n), it
    )

    def step_concat(lat, t):
        model_in = jnp.concatenate([lat, lat], axis=0)
        pred = denoise(model_in, t)
        u, c = jnp.split(pred, 2, axis=0)
        return cfg_combine(u, c, 2.0, 0.0).astype(lat.dtype)

    res["concat_split"] = slope(lambda n: chain(step_concat, x1, n), it)

    def step_full(lat, t):
        model_in = jnp.concatenate([lat, lat], axis=0)
        pred = denoise(model_in, t)
        u, c = jnp.split(pred, 2, axis=0)
        pred = cfg_combine(u, c, 2.0, 0.0)
        return ddim_step(schedule, pred, t, lat, 1000, eta=0.0, noise=None)

    res["full"] = slope(lambda n: chain(step_full, x1, n), it)

    for k, v in res.items():
        print(f"{k:>14}: {v*1e3:7.3f} ms")


if __name__ == "__main__":
    main()


def injit_variant(T=3600, iters=30):
    """Pipeline-shaped program: kv/emb built INSIDE the jit, then scan."""
    import numpy as np
    from said_tpu.cli._common import init_said_params
    from said_tpu.diffusion.schedule import DiffusionSchedule, cfg_combine, ddim_step
    from said_tpu.models.said import SAID
    from said_tpu.models.unet1d import build_kv_caches, time_embed_table

    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    model = SAID(dtype=dt, self_attn_impl="flash", cross_attn_impl="banded")
    params = init_said_params(model, seed=0)
    schedule = DiffusionSchedule.create(1000)
    ctx = jnp.asarray(rng.standard_normal((2, T, 768)), dt)
    x1 = jnp.asarray(rng.standard_normal((1, T, 32)), jnp.float32)

    def make(n):
        ts = jnp.linspace(999, 0, n).astype(jnp.int32)

        @jax.jit
        def loop(params, ctx, x0):
            kv = build_kv_caches(params["denoiser"], ctx, T, num_heads=6, dtype=dt)
            embt = time_embed_table(params["denoiser"], np.arange(1000), 192)
            kv, embt = jax.lax.optimization_barrier((kv, embt))

            def body(lat, t):
                model_in = jnp.concatenate([lat, lat], axis=0)
                pred = model.apply(
                    {"params": params}, model_in,
                    jnp.broadcast_to(t, (2,)), None,
                    deterministic=True, kv_caches=kv, emb=embt[t],
                )
                u, c = jnp.split(pred, 2, axis=0)
                pred = cfg_combine(u, c, 2.0, 0.0)
                return ddim_step(schedule, pred, t, lat, 1000, eta=0.0, noise=None), ()
            out, _ = lax.scan(body, x0, ts)
            return out.astype(jnp.float32).sum()
        return lambda: loop(params, ctx, x1)

    sec = slope(make, iters)
    print(f"{'full_injit':>14}: {sec*1e3:7.3f} ms")


if __name__ == "__main__" or True:
    pass
