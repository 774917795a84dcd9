"""Probe 2: packed-layout attention kernels vs the per-head layout.

Hypothesis from probe 1: the per-(B·H) kernel pays ~1.0 ms in pure data
movement (copy-only kernel) because (·, 32)-minor blocks are DMA-hostile
(64-byte rows into 128-lane tiles) and the grid has 192 tiny steps.
Variants here keep Q/K/V in the model's NATURAL (B, T, H·D=192) layout:
6× fewer grid steps, 384-byte rows, no caller-side transposes; heads are
static lane slices inside the kernel.

Usage: python tools/attn_probe2.py [--t 4096] [--iters 30]
"""

from __future__ import annotations

import argparse
import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

B, H, D = 2, 6, 32
INNER = H * D


def packed_kernel_factory(t: int, block_q: int, block_k: int, mode: str):
    """mode: 'copy' | 'full'."""
    num_q = t // block_q
    num_k = t // block_k
    scale = D**-0.5

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ki = pl.program_id(2)

        if mode == "copy":
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = q_ref[0]
            return

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        qb = q_ref[0]  # (block_q, INNER)
        kb = k_ref[0]  # (block_k, INNER)
        vb = v_ref[0]

        for h in range(H):
            sl = slice(h * D, (h + 1) * D)
            qh = qb[:, sl]
            kh = kb[:, sl]
            vh = vb[:, sl]
            scores = lax.dot_general(
                qh, kh, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            ) * scale
            m_prev = m_scr[:, h : h + 1]
            m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
            p = jnp.exp(scores - m_new)
            alpha = jnp.exp(m_prev - m_new)
            l_scr[:, h : h + 1] = l_scr[:, h : h + 1] * alpha + p.sum(
                axis=-1, keepdims=True
            )
            acc_scr[:, sl] = acc_scr[:, sl] * alpha + lax.dot_general(
                p.astype(vh.dtype), vh,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            m_scr[:, h : h + 1] = m_new

        @pl.when(ki == num_k - 1)
        def _():
            for h in range(H):
                sl = slice(h * D, (h + 1) * D)
                o_ref[0, :, sl] = (
                    acc_scr[:, sl] / l_scr[:, h : h + 1]
                ).astype(o_ref.dtype)

    @jax.jit
    def run(q, k, v):
        return pl.pallas_call(
            kernel,
            grid=(B, num_q, num_k),
            in_specs=[
                pl.BlockSpec((1, block_q, INNER), lambda b, qi, ki: (b, qi, 0)),
                pl.BlockSpec((1, block_k, INNER), lambda b, qi, ki: (b, ki, 0)),
                pl.BlockSpec((1, block_k, INNER), lambda b, qi, ki: (b, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, INNER), lambda b, qi, ki: (b, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((B, t, INNER), q.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 8), jnp.float32),
                pltpu.VMEM((block_q, 8), jnp.float32),
                pltpu.VMEM((block_q, INNER), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(q, k, v)

    return run


def dense_packed(q, k, v):
    qh = q.reshape(B, -1, H, D)
    kh = k.reshape(B, -1, H, D)
    vh = v.reshape(B, -1, H, D)
    scores = jnp.einsum("bthd,bshd->bhts", qh, kh) * (D**-0.5)
    attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhts,bshd->bthd", attn, vh).reshape(q.shape)


def _slope_time(fn, q, k, v, iters):
    """Seconds per call via SLOPE timing: the axon tunnel charges ~26 ms
    per program execution, so time the dependent-call scan at two lengths
    and difference them — launch overhead cancels exactly."""

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
    float(lo(q)); float(hi(q))  # compile + warm both
    t0 = time.perf_counter(); float(lo(q)); t_lo = time.perf_counter() - t0
    t0 = time.perf_counter(); float(hi(q)); t_hi = time.perf_counter() - t0
    return (t_hi - t_lo) / (iters - iters // 4)


time_fn = _slope_time


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--t", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()
    t = args.t

    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((B, t, INNER)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((B, t, INNER)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((B, t, INNER)), jnp.bfloat16)

    # correctness first
    want = np.asarray(dense_packed(q, k, v), np.float32)
    got = np.asarray(packed_kernel_factory(t, 256, 512, "full")(q, k, v), np.float32)
    err = np.abs(want - got).max()
    print(f"# packed full kernel max err vs dense: {err:.4f}")

    configs = [
        ("copy_512x512", packed_kernel_factory(t, 512, 512, "copy")),
        ("copy_1024x1024", packed_kernel_factory(t, 1024, 1024, "copy")),
        ("full_128x512", packed_kernel_factory(t, 128, 512, "full")),
        ("full_256x256", packed_kernel_factory(t, 256, 256, "full")),
        ("full_256x512", packed_kernel_factory(t, 256, 512, "full")),
        ("full_256x1024", packed_kernel_factory(t, 256, 1024, "full")),
        ("full_512x256", packed_kernel_factory(t, 512, 256, "full")),
        ("full_512x512", packed_kernel_factory(t, 512, 512, "full")),
        ("xla_dense_packed", dense_packed),
    ]
    for item in configs:
        if item is None:
            continue
        name, fn = item
        sec = time_fn(fn, q, k, v, args.iters)
        flops = 2 * 2 * B * H * t * t * D
        mfu = flops / sec / 1e12 / 197.0 * 100
        print(f"{name:>18}: {sec*1e3:7.3f} ms  (MFU {mfu:4.1f}%)", flush=True)


if __name__ == "__main__":
    main()
