"""Decompose the T=3600 denoise step: where does the time go?

Times (slope method, axon-tunnel safe) the full UNet forward at the 60 s
clip shape (CFG batch 2, T=3600, bf16) and its components with matching
shapes, so end-to-end cost can be attributed:

  unet_full        model.apply with kv_caches + emb (the sampler's step)
  unet_dense       same with self_attn_impl=dense
  self_attn x4     flash_attention at (2, 3600, 6, 32)
  cross_banded x4  banded_attention_cached at (2, 3600, 3, 6, 32)
  geglu_ff x4      the two FF matmuls + gelu at (2, 3600, 192)
  qkvo_proj x4     4 × (2, 3600, 192)@(192,192)
  resconv x5       2 convs k=3 at (2, 3600, 192)
  norms            13 × fp32 group/layer-norm passes
  sampler_extra    full 40-step sampler scan minus 40 × unet_full

Usage: python tools/step_probe.py [--t 3600] [--iters 30]
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
    lo, hi = make_loop(max(iters // 4, 1)), make_loop(iters)
    float(lo()); float(hi())
    t0 = time.perf_counter(); float(lo()); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi()); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - max(iters // 4, 1))


def chain(fn, x0, extra, n):
    """Build a loop closure chaining n dependent calls of fn."""
    @jax.jit
    def loop():
        def body(carry, _):
            out = fn(carry, *extra)
            return out.astype(carry.dtype).reshape(carry.shape), ()
        out, _ = lax.scan(body, x0, None, length=n)
        return out.astype(jnp.float32).sum()
    return loop


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=3600)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    T, it = args.t, args.iters
    B = 2  # CFG-doubled batch
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)

    from said_tpu.models.said import SAID
    from said_tpu.models.unet1d import build_kv_caches, time_embed_table
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.cli._common import init_said_params

    model = SAID(dtype=dt, self_attn_impl="flash", cross_attn_impl="banded")
    params = init_said_params(model, seed=0)

    ctx = jnp.asarray(rng.standard_normal((B, T, 768)), dt)
    kv = build_kv_caches(params["denoiser"], ctx, T, num_heads=6, dtype=dt)
    embt = time_embed_table(params["denoiser"], np.arange(1000), 192)
    x0 = jnp.asarray(rng.standard_normal((B, T, 32)), jnp.float32)

    results = {}

    def unet_fn(impl):
        m = SAID(dtype=dt, self_attn_impl=impl, cross_attn_impl="banded")
        def f(x):
            return m.apply(
                {"params": params}, x, jnp.full((B,), 500, jnp.int32), None,
                deterministic=True, kv_caches=kv, emb=embt[500],
            )
        return f

    for impl in ("flash", "dense"):
        f = unet_fn(impl)
        results[f"unet_{impl}"] = slope_time(
            lambda n, f=f: chain(lambda x: f(x), x0, (), n), it
        )

    # components
    from said_tpu.ops.pallas_attention import flash_attention
    from said_tpu.ops.attention import banded_attention_cached

    q4 = jnp.asarray(rng.standard_normal((B, T, 6, 32)), dt)
    k4 = jnp.asarray(rng.standard_normal((B, T, 6, 32)), dt)
    v4 = jnp.asarray(rng.standard_normal((B, T, 6, 32)), dt)
    results["self_attn"] = slope_time(
        lambda n: chain(lambda q: flash_attention(q, k4, v4), q4, (), n), it
    )

    qc = jnp.asarray(rng.standard_normal((B, T, 192)), dt)
    kw = jnp.asarray(rng.standard_normal((B, T, 3, 6, 32)), dt)
    vw = jnp.asarray(rng.standard_normal((B, T, 3, 6, 32)), dt)
    valid = jnp.ones((T, 3), bool)
    results["cross_banded"] = slope_time(
        lambda n: chain(
            lambda q: banded_attention_cached(q, kw, vw, valid, 6), qc, (), n
        ), it
    )

    w1 = jnp.asarray(rng.standard_normal((192, 1536)) * 0.02, dt)
    w2 = jnp.asarray(rng.standard_normal((768, 192)) * 0.02, dt)

    def geglu(x):
        h = x @ w1
        a, g = jnp.split(h, 2, axis=-1)
        return (a * jax.nn.gelu(g, approximate=False)) @ w2

    results["geglu_ff"] = slope_time(
        lambda n: chain(geglu, qc, (), n), it
    )

    wp = jnp.asarray(rng.standard_normal((192, 192)) * 0.02, dt)
    results["qkvo_proj"] = slope_time(
        lambda n: chain(lambda x: x @ wp, qc, (), n), it
    )

    wc = jnp.asarray(rng.standard_normal((3, 192, 192)) * 0.02, dt)

    def conv2(x):
        y = lax.conv_general_dilated(
            x, wc, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )
        return lax.conv_general_dilated(
            y, wc, (1,), "SAME", dimension_numbers=("NWC", "WIO", "NWC")
        )

    results["resconv2"] = slope_time(
        lambda n: chain(conv2, qc, (), n), it
    )

    from said_tpu.ops.norms import group_norm, layer_norm_f32
    sc = jnp.ones((192,), jnp.float32)
    bi = jnp.zeros((192,), jnp.float32)

    def norms(x):
        y = group_norm(x, 32, sc, bi, 1e-5)
        return layer_norm_f32(y, sc, bi, 1e-5)

    results["norm_pair"] = slope_time(
        lambda n: chain(norms, qc, (), n), it
    )

    for k, v in results.items():
        print(f"{k:>14}: {v*1e3:7.3f} ms")

    attrib = (
        4 * results["self_attn"] + 4 * results["cross_banded"]
        + 4 * results["geglu_ff"] + 16 * results["qkvo_proj"]
        + 5 * results["resconv2"] + 7 * results["norm_pair"]
    )
    print(f"{'attributed':>14}: {attrib*1e3:7.3f} ms vs unet_flash "
          f"{results['unet_flash']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
