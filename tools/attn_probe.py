"""Decompose self-attention kernel time: grid overhead vs MXU vs softmax VPU.

Builds a family of kernels that start from a copy-only body and add one
stage at a time (QK^T, running max, exp, sum, PV matmul, rescale). The
per-stage deltas show what to optimize. Shapes fixed to the SAiD
self-attention (B=2, H=6, D=32, bf16), T chosen as an exact block
multiple so no padding/masking noise enters.

Usage: python tools/attn_probe.py [--t 4096] [--iters 30]
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


def build(stage: str, t: int, block_q: int, block_k: int, b: int, h: int, d: int):
    scale = d**-0.5
    num_q = t // block_q
    num_k = t // block_k

    def kernel(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr):
        ki = pl.program_id(2)

        @pl.when(ki == 0)
        def _init():
            m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
            l_scr[...] = jnp.zeros_like(l_scr)
            acc_scr[...] = jnp.zeros_like(acc_scr)

        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]

        if stage == "copy":
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = qb
            return

        scores = lax.dot_general(
            qb, kb, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) * scale
        if stage == "qk":
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = (acc_scr[...] + scores[:, :d]).astype(o_ref.dtype)
            acc_scr[...] += scores[:, :d]
            return

        m_prev = m_scr[...]
        m_new = jnp.maximum(m_prev, scores.max(axis=-1, keepdims=True))
        if stage == "qk_max":
            m_scr[...] = m_new
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = jnp.broadcast_to(m_new, (block_q, d)).astype(o_ref.dtype)
            return

        p = jnp.exp(scores - m_new)
        if stage == "qk_max_exp":
            m_scr[...] = m_new
            acc_scr[...] += p[:, :d]
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = acc_scr[...].astype(o_ref.dtype)
            return

        alpha = jnp.exp(m_prev - m_new)
        l_scr[...] = l_scr[...] * alpha + p.sum(axis=-1, keepdims=True)
        if stage == "qk_max_exp_sum":
            m_scr[...] = m_new
            acc_scr[...] += p[:, :d]
            @pl.when(ki == num_k - 1)
            def _():
                o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)
            return

        acc_scr[...] = acc_scr[...] * alpha + lax.dot_general(
            p.astype(vb.dtype), vb,
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        m_scr[...] = m_new

        @pl.when(ki == num_k - 1)
        def _():
            o_ref[0] = (acc_scr[...] / l_scr[...]).astype(o_ref.dtype)

    @jax.jit
    def run(qf, kf, vf):
        return pl.pallas_call(
            kernel,
            grid=(b * h, num_q, num_k),
            in_specs=[
                pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
                pl.BlockSpec((1, block_k, d), lambda bh, qi, ki: (bh, ki, 0)),
            ],
            out_specs=pl.BlockSpec((1, block_q, d), lambda bh, qi, ki: (bh, qi, 0)),
            out_shape=jax.ShapeDtypeStruct((b * h, t, d), qf.dtype),
            scratch_shapes=[
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, 1), jnp.float32),
                pltpu.VMEM((block_q, d), jnp.float32),
            ],
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
        )(qf, kf, vf)

    return run


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
    ap.add_argument("--block_q", type=int, default=1024)
    ap.add_argument("--block_k", type=int, default=1024)
    args = ap.parse_args()

    b, h, d = 2, 6, 32
    t = args.t
    rng = np.random.default_rng(0)
    qf = jnp.asarray(rng.standard_normal((b * h, t, d)), jnp.bfloat16)
    kf = jnp.asarray(rng.standard_normal((b * h, t, d)), jnp.bfloat16)
    vf = jnp.asarray(rng.standard_normal((b * h, t, d)), jnp.bfloat16)

    print(f"# T={t} blocks {args.block_q}x{args.block_k} B*H={b*h} D={d}")
    prev = 0.0
    for stage in ["copy", "qk", "qk_max", "qk_max_exp", "qk_max_exp_sum", "full"]:
        fn = build(stage, t, args.block_q, args.block_k, b, h, d)
        sec = time_fn(fn, qf, kf, vf, args.iters)
        print(f"{stage:>16}: {sec*1e3:7.3f} ms  (+{(sec-prev)*1e3:6.3f})", flush=True)
        prev = sec

    # Stock flash error detail, if any
    try:
        from jax.experimental.pallas.ops.tpu import flash_attention as stock

        q4 = qf.reshape(b, h, t, d)
        o = stock.flash_attention(q4, kf.reshape(b, h, t, d), vf.reshape(b, h, t, d),
                                  sm_scale=d**-0.5)
        o.block_until_ready()
        sec = time_fn(
            lambda qq, kk, vv: stock.flash_attention(
                qq.reshape(b, h, t, d), kk.reshape(b, h, t, d), vv.reshape(b, h, t, d),
                sm_scale=d**-0.5).reshape(b * h, t, d),
            qf, kf, vf, args.iters)
        print(f"{'stock_flash':>16}: {sec*1e3:7.3f} ms")
    except Exception as e:
        print(f"stock flash failed: {e!r}")


if __name__ == "__main__":
    main()
