"""Pallas TPU kernels for the float32-statistics norms.

Why these exist (profiled on v5e, T=3600 denoise step): the jnp norms
materialize an ``x.astype(f32)`` tensor whose reductions make XLA pick a
TRANSPOSED layout, inserting a ~25 us relayout copy at every norm; and
every canonical-layout reformulation trades the copy for an equally slow
(~68 us) strided reduce fusion. A fused kernel does the whole norm at
HBM bandwidth: statistics accumulate in f32 over the bf16 block held in
VMEM, the normalize (+ optional SiLU epilogue, which the ResBlocks
always apply) happens in the same pass, and no transposed intermediate
ever exists.

Grid blocking: one grid step per ROW-BLOCK of the batch, not per row —
at serving batch sizes (64 CFG-doubled rows of 256 frames) per-row
grids pay ~0.7 us of grid overhead 64 times per norm; packing rows
into (rb, T, C) blocks keeps the whole thing vectorized (stats reduce
over axis 1; the group reduce/broadcast is a one-hot matmul, since
Mosaic has no lane-splitting shape casts).

Numerics are IDENTICAL to the jnp twins in ``said_tpu.ops.norms`` (same
two-pass f32 mean/var), so torch-parity tolerances are unaffected.
Routing lives in ``said_tpu.ops.norms``; CI drives the kernels on CPU
via ``SAID_NORM_INTERPRET=1``.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

# A row block (rb, T, C) lives in VMEM as the bf16 block + an f32
# centered temp (~6·rb·T·C bytes, double-buffered in/out): cap the
# per-block element count so the 60 s flagship row (3600, 192) fits
# with headroom.
_MAX_TC_VMEM = 4096 * 192


def largest_divisor(b: int, cap: int) -> int:
    """Largest divisor of b that is ≤ cap (≥ 1)."""
    rb = max(1, min(b, cap))
    while b % rb:
        rb -= 1
    return rb


def _row_block(b: int, t: int, c: int) -> int:
    """Largest divisor of b whose (rb, t, c) block fits the VMEM budget."""
    return largest_divisor(b, max(1, _MAX_TC_VMEM // (t * c)))


def _group_indicator(c: int, g: int):
    ch = jax.lax.broadcasted_iota(jnp.int32, (c, g), 0)
    grp = jax.lax.broadcasted_iota(jnp.int32, (c, g), 1)
    return (ch // (c // g) == grp).astype(jnp.float32)  # (C, G)


def _gdot(a, m):
    """(rb, C) @ (C, G) group reduce (or its transpose broadcast).

    HIGHEST precision is load-bearing: at default precision the TPU
    matmul rounds its f32 inputs to bf16, which would put ~1e-2 error
    on every group statistic (the per-row rb=1 shape happened to avoid
    the bf16 path; the row-packed shapes do not). The one-hot matmuls
    are tiny, so exactness is free.
    """
    return jax.lax.dot_general(
        a, m, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )


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
    rb = _row_block(b, t, c)

    def body(x_ref, s_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)  # (rb, T, C)
        ind = _group_indicator(c, g)
        s_c = jnp.sum(xf, axis=1)  # (rb, C)
        mean_c = _gdot(_gdot(s_c, ind) / n, ind.T)  # (rb, C)
        d = xf - mean_c[:, None, :]
        ss_c = jnp.sum(d * d, axis=1)
        rstd_c = _gdot(
            jax.lax.rsqrt(_gdot(ss_c, ind) / n + eps), ind.T
        )
        out = d * rstd_c[:, None, :] * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b // rb,),
        in_specs=[
            pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0)),
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

    ``mask`` (B, T) float (1 = real frame), lane-padded to (B, T, 8) on
    the way in (sublane rules). Matches
    ``said_tpu.ops.norms.group_norm_masked`` on the real frames; padded
    rows hold finite garbage (their normalize still runs) exactly like
    the jnp version.
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g
    rb = _row_block(b, t, c)

    def body(x_ref, s_ref, b_ref, m_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)  # (rb, T, C)
        m = m_ref[:, :, 0:1]  # (rb, T, 1)
        ind = _group_indicator(c, g)
        count = jnp.sum(m, axis=1) * cg  # (rb, 1)
        s_c = jnp.sum(xf * m, axis=1)  # (rb, C)
        mean_c = _gdot(_gdot(s_c, ind) / count, ind.T)
        d = xf - mean_c[:, None, :]
        ss_c = jnp.sum(jnp.square(d * m), axis=1)
        rstd_c = _gdot(
            jax.lax.rsqrt(_gdot(ss_c, ind) / count + eps), ind.T
        )
        out = d * rstd_c[:, None, :] * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b // rb,),
        in_specs=[
            pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((1, c), lambda i: (0, 0)),
            pl.BlockSpec((rb, t, 8), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, t, c), lambda i: (i, 0, 0)),
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


def _t_block(t: int, c: int) -> int:
    """Largest T-block (multiple of 8, dividing t) whose (1, bt, c) block
    fits the VMEM budget; 0 if none exists (caller falls back to jnp)."""
    cap = _MAX_TC_VMEM // c
    for bt in range(cap - cap % 8, 0, -8):
        if t % bt == 0:
            return bt
    return 0


def _group_stats_combine(s_c, m2_c, counts, num_groups: int, eps: float):
    """Chan-combine per-block group statistics → per-channel mean/rstd.

    ``s_c``/``m2_c``: (B, nT, C) f32 block channel sums and block-mean-
    centered squared sums. ``counts``: (B, nT) f32 element count PER
    GROUP in each block (bt·C/G, mask-reduced for the masked variant).
    Tiny arrays — XLA handles them inline; HIGHEST precision on the
    one-hot group matmuls for the same reason as ``_gdot``.
    """
    b, nt, c = s_c.shape
    g = num_groups
    ind = _group_indicator(c, g)  # (C, G) f32

    def gsum(a):  # (B, nT, C) → (B, nT, G)
        return jax.lax.dot_general(
            a, ind, (((2,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    n_bg = counts[:, :, None]  # (B, nT, 1), per-group count per block
    s_bg = gsum(s_c)
    m2_bg = gsum(m2_c)
    mean_bg = s_bg / jnp.maximum(n_bg, 1.0)
    n_g = jnp.sum(n_bg, axis=1)  # (B, 1) broadcast over G
    mean_g = jnp.sum(s_bg, axis=1) / jnp.maximum(n_g, 1.0)  # (B, G)
    # Chan et al. parallel-variance combine: within-block M2 plus the
    # between-block mean-shift term.
    shift = mean_bg - mean_g[:, None, :]
    m2_g = jnp.sum(m2_bg + n_bg * shift * shift, axis=1)  # (B, G)
    var_g = m2_g / jnp.maximum(n_g, 1.0)
    rstd_g = jax.lax.rsqrt(var_g + eps)

    def to_chan(a):  # (B, G) → (B, C)
        return jax.lax.dot_general(
            a, ind, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    return to_chan(mean_g), to_chan(rstd_g)


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "act", "interpret"),
)
def group_norm_pallas_blocked(
    x, scale, bias, num_groups: int, eps: float = 1e-5,
    act: str = "none", interpret: bool = False,
):
    """Two-phase GroupNorm for rows too long for a single VMEM block
    (T·C > ``_MAX_TC_VMEM``, i.e. clips over ~68 s at the UNet width).

    Phase 1 streams (1, bt, C) blocks computing per-block channel sums
    and block-group-mean-centered squared sums; a tiny jnp Chan-combine
    produces per-(batch, group) mean/rstd; phase 2 streams the blocks
    again for the fused normalize (+SiLU). Numerically the per-block
    centering matches the jnp twin's two-pass variance to f32 tolerance
    (no catastrophic E[x²]−mean² cancellation). Same fp32-statistics
    contract as the reference's ``GroupNorm32``
    (``said/model/ldm/util.py:111-122``).
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g
    bt = _t_block(t, c)
    assert bt > 0, "caller must fall back to jnp when no T-block divides t"
    nt = t // bt

    def stats_body(x_ref, s_ref, m2_ref):
        xf = x_ref[...].astype(jnp.float32)  # (1, bt, C)
        ind = _group_indicator(c, g)
        s_c = jnp.sum(xf, axis=1)  # (1, C)
        mean_c = _gdot(_gdot(s_c, ind) / (bt * cg), ind.T)
        d = xf - mean_c[:, None, :]
        m2_c = jnp.sum(d * d, axis=1)
        s_ref[...] = s_c[:, None, None, :]
        m2_ref[...] = m2_c[:, None, None, :]

    s_c, m2_c = pl.pallas_call(
        stats_body,
        grid=(b, nt),
        in_specs=[pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0))],
        out_specs=(
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nt, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x)

    counts = jnp.full((b, nt), float(bt * cg), jnp.float32)
    mean_c, rstd_c = _group_stats_combine(
        s_c[:, :, 0], m2_c[:, :, 0], counts, g, eps
    )

    def norm_body(x_ref, mu_ref, rs_ref, s_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        out = (xf - mu_ref[0][:, None, :]) * rs_ref[0][:, None, :]
        out = out * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        norm_body,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        mean_c[:, None, :],
        rstd_c[:, None, :],
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )


@functools.partial(
    jax.jit,
    static_argnames=("num_groups", "eps", "act", "interpret"),
)
def group_norm_masked_pallas_blocked(
    x, scale, bias, mask, num_groups: int, eps: float = 1e-5,
    act: str = "none", interpret: bool = False,
):
    """Masked two-phase GroupNorm for long rows — ``group_norm_pallas_blocked``
    with statistics that ignore padded frames (mask (B, T), 1 = real).
    Padded rows still get a finite normalize, like the jnp twin.
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    g = num_groups
    cg = c // g
    bt = _t_block(t, c)
    assert bt > 0, "caller must fall back to jnp when no T-block divides t"
    nt = t // bt

    mask_f = jnp.asarray(mask, jnp.float32).reshape(-1, t)
    mask_f = jnp.broadcast_to(mask_f[:, :, None], (b, t, 8))

    def stats_body(x_ref, m_ref, s_ref, m2_ref):
        xf = x_ref[...].astype(jnp.float32)  # (1, bt, C)
        m = m_ref[:, :, 0:1]  # (1, bt, 1)
        ind = _group_indicator(c, g)
        cnt = jnp.sum(m) * cg  # scalar: per-group count in this block
        s_c = jnp.sum(xf * m, axis=1)  # (1, C)
        mean_c = _gdot(
            _gdot(s_c, ind) / jnp.maximum(cnt, 1.0), ind.T
        )
        d = (xf - mean_c[:, None, :]) * m
        m2_c = jnp.sum(d * d, axis=1)
        s_ref[...] = s_c[:, None, None, :]
        m2_ref[...] = m2_c[:, None, None, :]

    s_c, m2_c = pl.pallas_call(
        stats_body,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, bt, 8), lambda i, j: (i, j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 1, 1, c), lambda i, j: (i, j, 0, 0)),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((b, nt, 1, c), jnp.float32),
            jax.ShapeDtypeStruct((b, nt, 1, c), jnp.float32),
        ),
        interpret=interpret,
    )(x, mask_f)

    counts = (
        jnp.sum(mask_f[:, :, 0].reshape(b, nt, bt), axis=2) * cg
    )  # (B, nT) per-group counts
    mean_c, rstd_c = _group_stats_combine(
        s_c[:, :, 0], m2_c[:, :, 0], counts, g, eps
    )

    def norm_body(x_ref, mu_ref, rs_ref, s_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)
        out = (xf - mu_ref[0][:, None, :]) * rs_ref[0][:, None, :]
        out = out * s_ref[0] + b_ref[0]
        if act == "silu":
            out = out * jax.lax.logistic(out)
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        norm_body,
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, 1, c), lambda i, j: (i, 0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        mean_c[:, None, :],
        rstd_c[:, None, :],
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
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

    Blocked along T (per-row statistics), so any sequence length works;
    batch rows pack into the same block up to the VMEM budget.
    """
    from jax.experimental import pallas as pl

    b, t, c = x.shape
    bt = _pick_block(t)
    if bt * c > _MAX_TC_VMEM:
        # pathological T with no small divisor: a whole-row block would
        # overrun VMEM — let the caller's jnp twin handle it
        from said_tpu.ops.norms import _layer_norm_jnp

        return _layer_norm_jnp(x, scale, bias, eps)
    rb = _row_block(b, bt, c)

    def body(x_ref, s_ref, b_ref, o_ref):
        xf = x_ref[...].astype(jnp.float32)  # (rb, bt, C)
        mean = jnp.sum(xf, axis=-1, keepdims=True) / c
        d = xf - mean
        var = jnp.sum(d * d, axis=-1, keepdims=True) / c
        out = d * jax.lax.rsqrt(var + eps) * s_ref[0] + b_ref[0]
        o_ref[...] = out.astype(o_ref.dtype)

    return pl.pallas_call(
        body,
        grid=(b // rb, t // bt),
        in_specs=[
            pl.BlockSpec((rb, bt, c), lambda i, j: (i, j, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
            pl.BlockSpec((1, c), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((rb, bt, c), lambda i, j: (i, j, 0)),
        out_shape=jax.ShapeDtypeStruct((b, t, c), x.dtype),
        interpret=interpret,
    )(
        x,
        scale.astype(jnp.float32).reshape(1, c),
        bias.astype(jnp.float32).reshape(1, c),
    )
