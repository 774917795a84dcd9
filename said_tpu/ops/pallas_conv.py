"""Fused strided conv + GELU kernel for the wav2vec2 feature extractor.

The reference's HF feature extractor (``said/model/wav2vec2.py`` via
``transformers`` Wav2Vec2FeatureEncoder) runs six k∈{2,3}, stride-2
Conv1d(512→512) layers, each followed by exact-erf GELU. XLA's TPU conv
lowering runs these shapes well below MXU peak (the strided window
prevents the clean im2col tiling it uses for s=1), and the separate
GELU costs an extra HBM round trip of the (B, T', 512) activation.

This kernel turns the strided conv into plain MXU matmuls:

  out[t] = Σ_j x[2t+j] @ W[j]          (VALID, stride 2, K ∈ {2, 3})

Per grid step it loads a contiguous (2·bt, C) input block, merges
sample pairs into lanes — ``(2·bt, C) → (bt, 2C)`` is a row-major
reshape, so taps 0 and 1 become ONE (bt, 2C) @ (2C, C_out) matmul with
a full 128-lane contraction — and, for K=3, adds the third tap as a
(bt, C) @ (C, C_out) matmul over the lane-sliced even rows shifted by
one sublane. The K=3 halo (each block's first output needs the previous
block's last two samples) is carried across grid steps in a VMEM
scratch buffer: TPU Pallas grid steps run sequentially, so the carry
written at step j is read at step j+1 (the flash-attention accumulator
idiom). GELU (exact-erf form, f32) is fused into the epilogue, so the
activation is written to HBM exactly once.

Gradients differentiate the jnp twin (the feature extractor is frozen
in SAiD training — ``script/train.py:547-548`` — so the backward only
exists for API completeness).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp

_INV_SQRT2 = 1.0 / math.sqrt(2.0)


def _gelu_f32(h):
    """Exact-erf GELU on an f32 array (torch F.gelu default)."""
    return h * 0.5 * (1.0 + jax.lax.erf(h * _INV_SQRT2))


def _erf_approx(x):
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


def _strided_conv_gelu_jnp(x, kernel):
    """jnp twin with the kernel's numerics (f32 tap accumulation + f32
    exact-erf GELU). x (B, T, C_in), kernel (K, C_in, C_out), stride 2,
    VALID."""
    k = kernel.shape[0]
    dt = x.dtype
    t_out = (x.shape[1] - k) // 2 + 1
    w = kernel.astype(dt)
    h = None
    for j in range(k):
        tap = jax.lax.slice(
            x,
            (0, j, 0),
            (x.shape[0], j + 2 * (t_out - 1) + 1, x.shape[2]),
            (1, 2, 1),
        )
        contrib = jax.lax.dot_general(
            tap, w[j], (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        h = contrib if h is None else h + contrib
    return _gelu_f32(h).astype(dt)


@jax.custom_vjp
def strided_conv_gelu(x, kernel):
    """Stride-2 VALID conv1d + exact-erf GELU, routed: Pallas kernel on
    TPU (or under SAID_CONV_INTERPRET), jnp twin elsewhere.

    x (B, T, C_in); kernel (K, C_in, C_out) with K ∈ {2, 3} — the flax
    ``nn.Conv`` kernel layout, so checkpoints and the torch importer are
    unaffected. No bias (wav2vec2-base's ``conv_bias=False``).
    """
    import os

    if os.environ.get("SAID_CONV_INTERPRET"):
        return strided_conv_gelu_pallas(x, kernel, interpret=True)
    if (
        jax.default_backend() == "tpu"
        and _kernel_ok(x, kernel)
        and not os.environ.get("SAID_CONV_DISABLE")
    ):
        return strided_conv_gelu_pallas(x, kernel)
    return _strided_conv_gelu_jnp(x, kernel)


def _conv_fwd(x, kernel):
    return strided_conv_gelu(x, kernel), (x, kernel)


def _conv_bwd(res, g):
    _, vjp = jax.vjp(_strided_conv_gelu_jnp, *res)
    return vjp(g)


strided_conv_gelu.defvjp(_conv_fwd, _conv_bwd)


def _kernel_ok(x, kernel) -> bool:
    """Shapes the Pallas path handles: lane-aligned channels (the
    (2·bt, C) → (bt, 2C) merge must be a clean lane regroup) and K∈{2,3}."""
    k, c_in, c_out = kernel.shape
    return (
        k in (2, 3)
        and c_in % 128 == 0
        and c_out % 128 == 0
        and x.shape[1] >= k
    )


@functools.partial(jax.jit, static_argnames=("block_t", "interpret"))
def strided_conv_gelu_pallas(x, kernel, block_t: int = 256,
                             interpret: bool = False):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from said_tpu.ops.pallas_norms import largest_divisor

    b, t, c_in = x.shape
    k, _, c_out = kernel.shape
    assert k in (2, 3), k
    t_out = (t - k) // 2 + 1
    dtype = x.dtype

    # K=3 needs a one-output-row shift (the first output of each block
    # reads the previous block's carry); K=2 tiles exactly.
    delta = 1 if k == 3 else 0
    bt = min(block_t, _round_up(t_out + delta, 16))
    ngrid = -(-(t_out + delta) // bt)
    t_pad = 2 * bt * ngrid
    if t_pad > t:
        x = jnp.pad(x, ((0, 0), (0, t_pad - t), (0, 0)))
    else:
        x = x[:, :t_pad]
    # Row packing: per-row grids pay the grid-step overhead B times. The
    # working set per grid step is ~5 input-block-sized buffers (double-
    # buffered input, carry-extended copy, lane-merged reshape, f32
    # accumulator, output), so budget ~1.25 MB for the input block to
    # stay within the 16 MB VMEM.
    rb = largest_divisor(
        b, max(1, (1280 * 1024) // (2 * bt * c_in * x.dtype.itemsize))
    )

    wk = kernel.astype(dtype)
    w01 = wk[:2].reshape(2 * c_in, c_out)  # taps 0,1: lane-merged pairs
    w2 = wk[2] if k == 3 else None

    def dot(a, w):
        return jax.lax.dot_general(
            a, w, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    if k == 3:

        def body(x_ref, w01_ref, w2_ref, o_ref, carry_ref):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                carry_ref[...] = jnp.zeros_like(carry_ref)

            xb = x_ref[...]  # (rb, 2·bt, C)
            ext = jnp.concatenate([carry_ref[...], xb], axis=1)
            carry_ref[...] = xb[:, -2:, :]
            ext2 = ext.reshape(rb, bt + 1, 2 * c_in)  # sample pairs → lanes
            h = dot(ext2[:, :bt].reshape(rb * bt, 2 * c_in), w01_ref[...])
            h += dot(ext2[:, 1:, :c_in].reshape(rb * bt, c_in), w2_ref[...])
            h = h * 0.5 * (1.0 + _erf_approx(h * _INV_SQRT2))
            o_ref[...] = h.reshape(rb, bt, c_out).astype(o_ref.dtype)

        in_specs = [
            pl.BlockSpec((rb, 2 * bt, c_in), lambda i, j: (i, j, 0)),
            pl.BlockSpec((2 * c_in, c_out), lambda i, j: (0, 0)),
            pl.BlockSpec((c_in, c_out), lambda i, j: (0, 0)),
        ]
        args = (x, w01, w2)
        scratch = [pltpu.VMEM((rb, 2, c_in), dtype)]
        # the carry makes BOTH dims order-dependent (row-major iteration:
        # j inner, reset at j == 0 per row block)
        semantics = ("arbitrary", "arbitrary")
    else:

        def body(x_ref, w01_ref, o_ref):
            xb = x_ref[...]
            ext2 = xb.reshape(rb * bt, 2 * c_in)
            h = dot(ext2, w01_ref[...])
            h = h * 0.5 * (1.0 + _erf_approx(h * _INV_SQRT2))
            o_ref[...] = h.reshape(rb, bt, c_out).astype(o_ref.dtype)

        in_specs = [
            pl.BlockSpec((rb, 2 * bt, c_in), lambda i, j: (i, j, 0)),
            pl.BlockSpec((2 * c_in, c_out), lambda i, j: (0, 0)),
        ]
        args = (x, w01)
        scratch = []
        semantics = ("parallel", "arbitrary")

    out = pl.pallas_call(
        body,
        grid=(b // rb, ngrid),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((rb, bt, c_out), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, bt * ngrid, c_out), dtype),
        scratch_shapes=scratch,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=semantics
        ),
        interpret=interpret,
    )(*args)
    return out[:, delta:delta + t_out]


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m
