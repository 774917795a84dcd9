"""On-chip A/B: bound-shift (max-free) variant of the FULL-K packed
attention kernel vs production, at the headline shape (T=3600).

The blocked long-clip kernel's rowmax deletion measured 1.08x end-to-end
(tools/promote_bound_check.py) and was promoted. The full-K kernel
(`_flash_tpu_packed`, the 2k..14.4k-key path under the 60 s headline and
the streaming windows) still computes a per-row max over the whole
(block_q, S) score block — one of its ~2 big VPU passes. This probe
times a mirrored max-free variant using the same production-safe
`_exp2_shift_bound` (min(Cauchy-Schwarz, landmark max + slack), clamp
-120, mask-as-where-zero after exp2).

Decision rule (BASELINE.md noise band): promote only on a >5% win with
>= 5/6 paired interleaved-round wins — the full-K kernel is ~0.5 ms/call
in situ, so smaller deltas are tunnel noise.

RESULT (2026-08-20, real chip, T=3600 blocks 256xfull): **NO-GO** —
medians prod 0.525 ms vs bound 0.518 ms (1.013x), 3/6 paired wins: a
wash inside the noise band. Unlike the blocked kernel (1.08x, promoted),
the full-K kernel has no running-max scratch or alpha rescale to
delete — only the single rowmax pass, which at this block shape is
cheap/overlapped. Accuracy was identical (both 1.121e-3 vs f32 dense).
The full-K production kernel keeps the online max.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/fullk_bound_probe.py
"""

from __future__ import annotations

import functools
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from said_tpu.ops import pallas_attention as pa

B, H, D, T = 2, 6, 32, 3600
INNER = H * D
BQ = 256
_LOG2E = pa._LOG2E


@functools.partial(
    jax.jit, static_argnames=("num_heads", "block_q", "interpret")
)
def fullk_bound(q, k, v, num_heads: int = 6, block_q: int = 256,
                interpret: bool = False):
    """`_flash_tpu_packed` with the rowmax pass replaced by the
    precomputed `_exp2_shift_bound` shift (mirrors production otherwise:
    same grid, specs, ones-augmented V, static tail masking)."""
    from jax.experimental import pallas as pl

    b, t, inner = q.shape
    s = k.shape[1]
    h = num_heads
    d = inner // h

    t_pad = pa._round_up(t, block_q)
    s_pad = pa._round_up(s, 128)

    qs = (q.astype(jnp.float32) * (d**-0.5 * _LOG2E)).astype(q.dtype)
    a_shift = pa._exp2_shift_bound(qs, k, h)
    ones = jnp.ones((b, s, h, 1), v.dtype)
    va = jnp.concatenate(
        [v.reshape(b, s, h, d), ones], axis=-1
    ).reshape(b, s, h * (d + 1))
    if t_pad > t:
        qs = jnp.pad(qs, ((0, 0), (0, t_pad - t), (0, 0)))
        a_shift = jnp.pad(a_shift, ((0, 0), (0, t_pad - t), (0, 0)))
    if s_pad > s:
        k = jnp.pad(k, ((0, 0), (0, s_pad - s), (0, 0)))
        va = jnp.pad(va, ((0, 0), (0, s_pad - s), (0, 0)))

    num_q = t_pad // block_q
    static_mask = s_pad > s

    def kernel(q_ref, k_ref, v_ref, a_ref, o_ref):
        qb = q_ref[0]
        kb = k_ref[0]
        vb = v_ref[0]
        ab = a_ref[0]
        col = None
        if static_mask:
            col = jax.lax.broadcasted_iota(
                jnp.int32, (qb.shape[0], s_pad), 1
            )
        for hh in range(h):
            s2 = jax.lax.dot_general(
                qb[:, hh * d:(hh + 1) * d],
                kb[:, hh * d:(hh + 1) * d],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            p = jnp.exp2(
                jnp.maximum(s2 - ab[:, hh:hh + 1], pa._SHIFT_CLAMP)
            )
            if col is not None:
                p = jnp.where(col < s, p, 0.0)
            acc = jax.lax.dot_general(
                p.astype(vb.dtype),
                vb[:, hh * (d + 1):(hh + 1) * (d + 1)],
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            o_ref[0, :, hh * d:(hh + 1) * d] = (
                acc[:, :d] / acc[:, d:d + 1]
            ).astype(o_ref.dtype)

    out = pl.pallas_call(
        kernel,
        grid=(b, num_q),
        in_specs=[
            pl.BlockSpec((1, block_q, inner), lambda bi, qi: (bi, qi, 0)),
            pl.BlockSpec((1, s_pad, inner), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, s_pad, h * (d + 1)), lambda bi, qi: (bi, 0, 0)),
            pl.BlockSpec((1, block_q, h), lambda bi, qi: (bi, qi, 0)),
        ],
        out_specs=pl.BlockSpec(
            (1, block_q, inner), lambda bi, qi: (bi, qi, 0)
        ),
        out_shape=jax.ShapeDtypeStruct((b, t_pad, inner), q.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * 2 * b * h * t_pad * s_pad * d,
            bytes_accessed=b * (t_pad + 2 * s_pad * num_q) * inner
            * q.dtype.itemsize,
            transcendentals=b * h * t_pad * s_pad,
        ),
        interpret=interpret,
    )(qs, k, va, a_shift.astype(jnp.float32))
    return out[:, :t]


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

    def prod_fn(q, k, v):
        return pa._flash_tpu_packed(q, k, v, num_heads=H, block_q=BQ)

    def bound_fn(q, k, v):
        return fullk_bound(q, k, v, num_heads=H, block_q=BQ)

    prod_out = np.asarray(prod_fn(q, k, v).astype(jnp.float32))
    bound_out = np.asarray(bound_fn(q, k, v).astype(jnp.float32))
    print(f"bound vs prod @T={T}: max|d| = "
          f"{np.abs(bound_out - prod_out).max():.3e}", flush=True)
    dense = np.asarray(pa._dense_flat(
        q.astype(jnp.float32), k.astype(jnp.float32),
        v.astype(jnp.float32), H))
    for name, o in (("prod", prod_out), ("bound", bound_out)):
        print(f"  {name} vs f32 dense: max|d| = "
              f"{np.abs(o - dense).max():.3e}", flush=True)

    lo_i, hi_i = 40, 240  # ~0.5 ms/call: long scans so slope >> 26 ms RPC
    loops = {n: (make_loop(f, lo_i), make_loop(f, hi_i))
             for n, f in (("prod", prod_fn), ("bound", bound_fn))}
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
            print(f"round {r} {n:>5}: {per:7.3f} ms/call", flush=True)

    med = {n: sorted(v)[len(v) // 2] for n, v in ms.items()}
    wins = sum(a > b for a, b in zip(ms["prod"], ms["bound"]))
    print(f"\nmedians: prod {med['prod']:.3f} ms, bound {med['bound']:.3f} "
          f"ms -> {med['prod'] / med['bound']:.3f}x, bound wins "
          f"{wins}/{rounds} paired rounds", flush=True)


if __name__ == "__main__":
    main()
