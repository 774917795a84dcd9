"""In-situ ablation of the T=3600 UNet step: patch out one component at
a time and measure the FULL program, so fusion/layout effects are
attributed correctly (isolated micro-benchmarks of the same ops add up
to far less than the composed program costs).

Usage: python tools/step_ablate.py [--t 3600] [--iters 30]
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


def slope_time(make_loop, iters):
    iters = max(iters, 2)  # slope needs two distinct lengths
    lo_n = max(iters // 4, 1)
    if lo_n == iters:
        lo_n = iters - 1
    lo, hi = make_loop(lo_n), make_loop(iters)
    float(lo()); float(hi())
    t0 = time.perf_counter(); float(lo()); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi()); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - lo_n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    T, it = args.t, args.iters
    B = 2
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

    real_banded = U.banded_attention_cached
    real_mha = U.multi_head_attention

    def timed_unet(label):
        def f(x):
            return model.apply(
                {"params": params}, x, jnp.full((B,), 500, jnp.int32), None,
                deterministic=True, kv_caches=kv, emb=embt[500],
            )

        def make(n):
            @jax.jit
            def loop():
                def body(carry, _):
                    out = f(carry)
                    return out.astype(carry.dtype).reshape(carry.shape), ()
                out, _ = lax.scan(body, x0, None, length=n)
                return out.astype(jnp.float32).sum()
            return loop

        sec = slope_time(make, it)
        print(f"{label:>24}: {sec*1e3:7.3f} ms", flush=True)
        return sec

    base = timed_unet("full")

    try:
        U.banded_attention_cached = (
            lambda q, k_win, v_win, valid, h: jnp.zeros_like(q)
        )
        no_cross = timed_unet("no_cross_banded")
        U.banded_attention_cached = real_banded

        U.multi_head_attention = (
            lambda q, k, v, h, mask=None, impl=None, band=None, lengths=None: q
        )
        no_self = timed_unet("no_self_attn")

        U.banded_attention_cached = (
            lambda q, k_win, v_win, valid, h: jnp.zeros_like(q)
        )
        no_both = timed_unet("no_both_attn")
    finally:
        U.banded_attention_cached = real_banded
        U.multi_head_attention = real_mha

    print(f"{'cross in-situ':>24}: {(base-no_cross)*1e3:7.3f} ms")
    print(f"{'self in-situ':>24}: {(base-no_self)*1e3:7.3f} ms")
    print(f"{'rest (conv/ff/norm)':>24}: {no_both*1e3:7.3f} ms")

    # Norm ablations (attention restored): the fp32 GroupNorm reshape
    # (B,T,C) -> (B,T,G,C/G) splits the lane dim 192 into 6-wide lanes —
    # a relayout suspect. 'affine' removes statistics entirely (floor);
    # 'gn_lanefriendly' reduces over T first (lane-preserving), then
    # over the tiny (B, C) partials.
    real_gn = U.group_norm
    real_ln = U.layer_norm_f32

    def gn_affine(x, g, scale, bias, eps=1e-5, act="none"):
        out = x.astype(jnp.float32) * scale + bias
        if act == "silu":
            out = out * jax.lax.logistic(out)
        return out.astype(x.dtype)

    def ln_affine(x, scale, bias, eps=1e-5):
        return (x.astype(jnp.float32) * scale + bias).astype(x.dtype)

    try:
        U.group_norm = gn_affine
        U.layer_norm_f32 = ln_affine
        timed_unet("norms_affine_only")
        U.layer_norm_f32 = real_ln
        timed_unet("gn_affine_ln_real")
    finally:
        U.layer_norm_f32 = real_ln

    def gn_lanefriendly(x, g, scale, bias, eps=1e-5, act="none"):
        b, t, c = x.shape
        xf = x.astype(jnp.float32)
        s = xf.sum(axis=1)  # (B, C), lane-preserving
        mean_g = s.reshape(b, g, c // g).sum(-1) / (t * (c // g))
        mean_c = jnp.repeat(mean_g, c // g, axis=-1)[:, None, :]
        d = xf - mean_c
        ss = (d * d).sum(axis=1)
        var_g = ss.reshape(b, g, c // g).sum(-1) / (t * (c // g))
        rstd_c = jax.lax.rsqrt(var_g + eps)
        rstd_c = jnp.repeat(rstd_c, c // g, axis=-1)[:, None, :]
        out = d * rstd_c * scale + bias
        if act == "silu":
            out = out * jax.lax.logistic(out)
        return out.astype(x.dtype)

    try:
        U.group_norm = gn_lanefriendly
        timed_unet("gn_lanefriendly")
    finally:
        U.group_norm = real_gn


if __name__ == "__main__":
    main()
