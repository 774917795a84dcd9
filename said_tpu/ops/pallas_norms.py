"""Pallas TPU kernels for the float32-statistics norms.

Why these exist (profiled on v5e, T=3600 denoise step): the jnp norms
materialize an ``x.astype(f32)`` tensor whose reductions make XLA pick a
TRANSPOSED layout, inserting a ~25 us relayout copy at every norm; and
every canonical-layout reformulation trades the copy for an equally slow
(~68 us) strided reduce fusion. A fused kernel does the whole norm at
HBM bandwidth (~7 us for (2, 3600, 192)): statistics accumulate in f32
over the bf16 block held in VMEM, the normalize (+ optional SiLU
epilogue, which the ResBlocks always apply) happens in the same pass,
and no transposed intermediate ever exists.

Numerics are IDENTICAL to ``said_tpu.ops.norms``: two-pass mean/var
computed in f32 from the (possibly bf16) input, so torch-parity
tolerances are unaffected.

Routing lives in ``said_tpu.ops.norms``: TPU + static (unmasked) shapes
use these kernels, everything else falls back to the jnp versions. CI
drives the kernels on CPU via ``SAID_NORM_INTERPRET=1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# GroupNorm holds a whole (T, C) row in VMEM (bf16 block + an f32
# centered temp ≈ 6·T·C bytes, double-buffered in/out): cap the element
# count so the 60 s flagship shape (3600, 192) fits with headroom.
_MAX_TC_VMEM = 4096 * 192


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "act", "interpret"),
)
def group_norm_pallas(
    x, scale, bias, num_groups: int, eps: float = 1e-5,
    act: str = "none", interpret: bool = False,
):
    """GroupNorm32 over (B, T, C), stats per (batch, group) over (T, C/G).

    ``act='silu'`` fuses the SiLU the UNet applies right after every
    ResBlock norm (one VMEM pass instead of a separate HBM round-trip).
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g
    n = t * cg

    def body(x_ref, s_ref, b_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)  # (T, C)
        # Group reduce/broadcast via a one-hot (C, G) indicator matmul —
        # Mosaic has no lane-splitting (C,) -> (G, C/G) shape cast, and
        # the tiny matmuls are effectively free on the MXU.
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
        m = (ch // cg == grp).astype(jnp.float32)  # (C, G)
        s_c = jnp.sum(xf, axis=0, keepdims=True)  # (1, C)
        mean_g = jax.lax.dot_general(
            s_c, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / n  # (1, G)
        mean_c = jax.lax.dot_general(
            mean_g, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (1, C)
        d = xf - mean_c
        ss_c = jnp.sum(d * d, axis=0, keepdims=True)
        var_g = jax.lax.dot_general(
            ss_c, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / n
        rstd_c = jax.lax.dot_general(
            jax.lax.rsqrt(var_g + eps), m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d * rstd_c * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "act", "interpret"),
)
def group_norm_masked_pallas(
    x, scale, bias, mask, num_groups: int, eps: float = 1e-5,
    act: str = "none", interpret: bool = False,
):
    """Masked GroupNorm32: statistics ignore padded frames.

    ``mask`` (B, T) float (1 = real frame). Matches
    ``said_tpu.ops.norms.group_norm_masked`` on the real frames; padded
    rows hold finite garbage (their normalize still runs) exactly like
    the jnp version.
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g

    def body(x_ref, s_ref, b_ref, m_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)  # (T, C)
        m = m_ref[0, :, 0:1]  # (T, 1); mask rides lane-padded to (T, 8)
        ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
        grp = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
        ind = (ch // cg == grp).astype(jnp.float32)  # (C, G)
        count = jnp.sum(m) * cg
        s_c = jnp.sum(xf * m, axis=0, keepdims=True)  # (1, C)
        mean_g = jax.lax.dot_general(
            s_c, ind, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / count
        mean_c = jax.lax.dot_general(
            mean_g, ind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        d = xf - mean_c
        ss_c = jnp.sum(jnp.square(d * m), axis=0, keepdims=True)
        var_g = jax.lax.dot_general(
            ss_c, ind, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) / count
        rstd_c = jax.lax.dot_general(
            jax.lax.rsqrt(var_g + eps), ind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        out = d * rstd_c * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, t, 8), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, t, c), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
        jnp.broadcast_to(
            jnp.asarray(mask, jnp.float32).reshape(-1, t)[:, :, None],
            (b, t, 8),
        ),
    )


def _pick_block(t: int, cap: int = 1024) -> int:
    """Largest T-block ≤ cap dividing t; sublane rule: multiple of 8 (or
    the whole axis)."""
    if t <= cap:
        return t
    for bt in range(cap - cap % 8, 0, -8):
        if t % bt == 0:
            return bt
    return t


@functools.partial(
    jax.jit, static_argnames=("eps", "interpret")
)
def layer_norm_pallas(x, scale, bias, eps: float = 1e-5,
                      interpret: bool = False):
    """LayerNorm over the last axis of (B, T, C) with f32 statistics.

    Blocked along T (per-row statistics), so any sequence length works.
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    bt = _pick_block(t)

    def body(x_ref, s_ref, b_ref, o_ref):
        xf = x_ref[0].astype(jnp.float32)  # (bt, C)
        mean = jnp.sum(xf, axis=-1, keepdims=True) / c
        d = xf - mean
        var = jnp.sum(d * d, axis=-1, keepdims=True) / c
        out = d * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
        o_ref[0] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b, t // bt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )
