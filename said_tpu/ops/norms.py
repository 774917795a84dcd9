"""Normalization primitives with explicit float32 statistics.

The reference's UNet normalizes in float32 regardless of activation
dtype (``GroupNorm32``, ``said/model/ldm/util.py:120-122``); we do the
same so bfloat16 compute stays numerically sane on TPU.

Execution routing (profiled on v5e): on TPU, static-shape norms run the
fused Pallas kernels (``said_tpu.ops.pallas_norms``) — the jnp
formulations all lose ~25-70 us per norm to either an XLA relayout copy
of the materialized f32 tensor or a slow canonical-layout strided
reduce; the kernels do the whole norm (+ the SiLU the ResBlocks always
apply next) in one HBM round-trip. Everywhere else (CPU, masked/bucketed
shapes, very long rows) the jnp versions run. Gradients always
differentiate the jnp twin (custom_vjp; norms recompute cheaply), so
training and the kernels never disagree.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp


def _group_norm_jnp(x, num_groups, scale, bias, eps=1e-5, act="none"):
    b, t, c = x.shape
    g = num_groups
    xf = x.astype(jnp.float32).reshape(b, t, g, c // g)
    mean = xf.mean(axis=(1, 3), keepdims=True)
    var = xf.var(axis=(1, 3), keepdims=True)
    xf = (xf - mean) / jnp.sqrt(var + eps)
    xf = xf.reshape(b, t, c)
    out = xf * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


def _layer_norm_jnp(x, scale, bias, eps=1e-5):
    xf = x.astype(jnp.float32)
    mean = xf.mean(axis=-1, keepdims=True)
    var = xf.var(axis=-1, keepdims=True)
    out = (xf - mean) / jnp.sqrt(var + eps)
    out = out * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    return out.astype(x.dtype)


def _norm_backend(t: int, c: int, whole_row: bool) -> str:
    interp = bool(os.environ.get("SAID_NORM_INTERPRET"))
    if not interp and os.environ.get("SAID_NORMS_JNP"):  # A/B kill-switch
        return "jnp"
    if not interp and jax.default_backend() != "tpu":
        return "jnp"
    from said_tpu.ops.pallas_norms import _MAX_TC_VMEM, _t_block

    if whole_row and t * c > _MAX_TC_VMEM:
        # rows too long for one VMEM block: two-phase blocked kernel
        # (clips over ~68 s at the UNet width) — jnp only if no T-block
        # divides t (pathological lengths)
        if _t_block(t, c) > 0:
            return "interpret_blocked" if interp else "pallas_blocked"
        return "jnp"
    return "interpret" if interp else "pallas"


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 4, 5))
def group_norm(
    x: jnp.ndarray,
    num_groups: int,
    scale: jnp.ndarray,
    bias: jnp.ndarray,
    eps: float = 1e-5,
    act: str = "none",
) -> jnp.ndarray:
    """GroupNorm over a channels-last sequence tensor (B, T, C).

    Statistics are computed per (batch, group) over (T, C/G) in float32 —
    identical to torch's GroupNorm on the (B, C, T) layout. ``act='silu'``
    fuses the activation the UNet applies right after the norm.
    """
    backend = _norm_backend(x.shape[1], x.shape[2], whole_row=True)
    if backend == "jnp":
        return _group_norm_jnp(x, num_groups, scale, bias, eps, act)
    if backend.endswith("_blocked"):
        from said_tpu.ops.pallas_norms import group_norm_pallas_blocked

        return group_norm_pallas_blocked(
            x, scale, bias, num_groups, eps, act,
            interpret=backend == "interpret_blocked",
        )
    from said_tpu.ops.pallas_norms import group_norm_pallas

    return group_norm_pallas(
        x, scale, bias, num_groups, eps, act,
        interpret=backend == "interpret",
    )


def _gn_fwd(x, num_groups, scale, bias, eps, act):
    return group_norm(x, num_groups, scale, bias, eps, act), (x, scale, bias)


def _gn_bwd(num_groups, eps, act, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_jnp(x_, num_groups, s_, b_, eps, act),
        x, scale, bias,
    )
    return vjp(g)


group_norm.defvjp(_gn_fwd, _gn_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def layer_norm_f32(
    x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray, eps: float = 1e-5
) -> jnp.ndarray:
    """LayerNorm over the last axis with float32 statistics."""
    if x.ndim != 3:
        return _layer_norm_jnp(x, scale, bias, eps)
    backend = _norm_backend(x.shape[1], x.shape[2], whole_row=False)
    if backend == "jnp":
        return _layer_norm_jnp(x, scale, bias, eps)
    from said_tpu.ops.pallas_norms import layer_norm_pallas

    return layer_norm_pallas(
        x, scale, bias, eps, interpret=backend == "interpret"
    )


def _ln_fwd(x, scale, bias, eps):
    return layer_norm_f32(x, scale, bias, eps), (x, scale, bias)


def _ln_bwd(eps, res, g):
    x, scale, bias = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _layer_norm_jnp(x_, s_, b_, eps), x, scale, bias
    )
    return vjp(g)


layer_norm_f32.defvjp(_ln_fwd, _ln_bwd)


def _group_norm_masked_jnp(
    x, num_groups: int, scale, bias, seq_mask, eps: float = 1e-5,
    act: str = "none",
):
    b, t, c = x.shape
    g = num_groups
    if seq_mask.ndim == 1:
        seq_mask = seq_mask[None, :]
    m = seq_mask[:, :, None].astype(jnp.float32)  # (B, T, 1)
    count = m.sum(axis=1, keepdims=True) * (c // g)  # frames × chans/group

    xf = (x.astype(jnp.float32) * m).reshape(b, t, g, c // g)
    mean = xf.sum(axis=(1, 3), keepdims=True) / count[..., None]
    var = (
        ((xf - mean) * m[..., None]) ** 2
    ).sum(axis=(1, 3), keepdims=True) / count[..., None]
    out = (x.astype(jnp.float32).reshape(b, t, g, c // g) - mean) / jnp.sqrt(var + eps)
    out = out.reshape(b, t, c) * scale.astype(jnp.float32) + bias.astype(jnp.float32)
    if act == "silu":
        out = out * jax.lax.logistic(out)
    return out.astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 5, 6))
def group_norm_masked(
    x, num_groups: int, scale, bias, seq_mask, eps: float = 1e-5,
    act: str = "none",
):
    """GroupNorm whose statistics ignore padded frames.

    Produces, at the valid frames, exactly what ``group_norm`` would
    produce on the unpadded tensor. seq_mask: (T,) or (B, T) bool.
    Routed like ``group_norm`` (Pallas kernel on TPU for static shapes,
    the mask riding in as a per-row float input).
    """
    backend = _norm_backend(x.shape[1], x.shape[2], whole_row=True)
    if backend == "jnp":
        return _group_norm_masked_jnp(
            x, num_groups, scale, bias, seq_mask, eps, act
        )
    if backend.endswith("_blocked"):
        from said_tpu.ops.pallas_norms import group_norm_masked_pallas_blocked

        return group_norm_masked_pallas_blocked(
            x, scale, bias, seq_mask, num_groups, eps, act,
            interpret=backend == "interpret_blocked",
        )
    from said_tpu.ops.pallas_norms import group_norm_masked_pallas

    return group_norm_masked_pallas(
        x, scale, bias, seq_mask, num_groups, eps, act,
        interpret=backend == "interpret",
    )


def _gnm_fwd(x, num_groups, scale, bias, seq_mask, eps, act):
    return (
        group_norm_masked(x, num_groups, scale, bias, seq_mask, eps, act),
        (x, scale, bias, seq_mask),
    )


def _gnm_bwd(num_groups, eps, act, res, g):
    import numpy as np

    x, scale, bias, seq_mask = res
    _, vjp = jax.vjp(
        lambda x_, s_, b_: _group_norm_masked_jnp(
            x_, num_groups, s_, b_, seq_mask, eps, act
        ),
        x, scale, bias,
    )
    dx, ds, db = vjp(g)
    ct_mask = np.zeros(np.shape(seq_mask), dtype=jax.dtypes.float0)
    return dx, ds, db, ct_mask


group_norm_masked.defvjp(_gnm_fwd, _gnm_bwd)
