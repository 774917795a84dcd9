"""Fused GEGLU feed-forward kernel.

The unfused chain (Dense 192->1536, split, h*gelu(gate), Dense 768->192)
writes the (B, T, 1536) projection to HBM and reads it back (16.6 MB at
T=3600), and the out-matmul fusion is dominated by the exact-erf gelu
(~92 us of the step's 3.5 ms, x4 blocks). This kernel keeps the
projection in VMEM: per T-block, both matmuls run back-to-back on the
MXU with the gelu-mul in f32 between them — one HBM read of x, one
write of the output.

Numerics: matmuls accumulate f32; gelu is the exact erf form evaluated
in f32 (the reference uses torch F.gelu default = erf). Routing and the
jnp twin live in ``said_tpu.models.unet1d.FeedForward``; gradients
differentiate the twin via custom_vjp.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _geglu_ffn_jnp(x, w1, b1, w2, b2):
    """jnp twin with the kernel's numerics (f32 projection + gelu)."""
    dt = x.dtype
    h = jax.lax.dot_general(
        x, w1.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b1.astype(jnp.float32)
    inner = w1.shape[1] // 2
    a, g = h[..., :inner], h[..., inner:]
    y = a * 0.5 * g * (1.0 + jax.lax.erf(g * _INV_SQRT2))
    out = jax.lax.dot_general(
        y.astype(dt), w2.astype(dt), (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) + b2.astype(jnp.float32)
    return out.astype(dt)


def ffn_blocks(b: int, t: int, inner2: int, block_t: int = 512):
    """(row_block, t_block) keeping the f32 (rows, 2I) projection temp
    within ~6 MB of VMEM; (None, None) when no dividing block exists
    (fall back to jnp rather than hold a whole pathological row)."""
    from said_tpu.ops.pallas_norms import _pick_block, largest_divisor

    bt = _pick_block(t, block_t)
    rows_cap = max(1, (6 * 1024 * 1024) // (inner2 * 4))
    if bt > rows_cap:
        return None, None
    return largest_divisor(b, max(1, rows_cap // bt)), bt


@jax.custom_vjp
def geglu_ffn(x, w1, b1, w2, b2):
    """Routed GEGLU feed-forward: Pallas kernel on TPU, jnp elsewhere.

    Gradients differentiate the jnp twin (cheap recompute), so the
    kernel needs no backward pass.
    """
    import os

    if os.environ.get("SAID_FFN_INTERPRET"):
        return geglu_ffn_pallas(x, w1, b1, w2, b2, interpret=True)
    if jax.default_backend() == "tpu":
        return geglu_ffn_pallas(x, w1, b1, w2, b2)
    return _geglu_ffn_jnp(x, w1, b1, w2, b2)


def _ffn_fwd(x, w1, b1, w2, b2):
    return geglu_ffn(x, w1, b1, w2, b2), (x, w1, b1, w2, b2)


def _ffn_bwd(res, g):
    _, vjp = jax.vjp(_geglu_ffn_jnp, *res)
    return vjp(g)


geglu_ffn.defvjp(_ffn_fwd, _ffn_bwd)


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def geglu_ffn_pallas(x, w1, b1, w2, b2, block_t: int = 512,
                     interpret: bool = False):
    """x (B, T, C) -> GEGLU FF (B, T, C).

    w1 (C, 2*I), b1 (2*I), w2 (I, C), b2 (C): the flax Dense params of
    the ``proj``/``out`` layers (I = 4C for SAiD).
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    inner2 = w1.shape[1]
    inner = inner2 // 2
    rb, bt = ffn_blocks(b, t, inner2, block_t)
    if rb is None:
        # no viable block (pathological T with no small divisor):
        # whole-row blocks would overrun VMEM — run the jnp twin
        return _geglu_ffn_jnp(x, w1, b1, w2, b2)
    dtype = x.dtype

    def erf(x):
        # Mosaic has no erf lowering; Abramowitz–Stegun 7.1.26 in f32
        # (max abs err 1.5e-7 — far below the bf16 activation rounding).
        ax = jnp.abs(x)
        t = 1.0 / (1.0 + 0.3275911 * ax)
        poly = t * (
            0.254829592
            + t * (
                -0.284496736
                + t * (1.421413741 + t * (-1.453152027 + t * 1.061405429))
            )
        )
        return jnp.sign(x) * (1.0 - poly * jnp.exp(-ax * ax))

    def body(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref):
        xb = x_ref[...].reshape(rb * bt, c)  # sublane-merge, layout no-op
        h = jax.lax.dot_general(
            xb, w1_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b1_ref[0]
        a, g = h[:, :inner], h[:, inner:]
        y = a * 0.5 * g * (1.0 + erf(g * _INV_SQRT2))
        out = jax.lax.dot_general(
            y.astype(dtype), w2_ref[...],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + b2_ref[0]
        o_ref[...] = out.reshape(rb, bt, c).astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b // rb, t // bt),
        in_specs=[
            pl.BlockSpec((rb, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((c, inner2), lambda i, j: (0, 0)),
            pl.BlockSpec((1, inner2), lambda i, j: (0, 0)),
            pl.BlockSpec((inner, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), dtype),
        interpret=interpret,
    )(
        x,
        w1.astype(dtype),
        b1.astype(jnp.float32).reshape(1, inner2),
        w2.astype(dtype),
        b2.astype(jnp.float32).reshape(1, c),
    )
