"""Pallas norm kernels (interpret mode on CPU) vs the jnp twins.

The kernels must be numerically identical (same two-pass f32 statistics)
— they are the TPU execution path of GroupNorm32/LayerNormF32, so any
drift would break the torch parity established for the jnp versions.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.norms import _group_norm_jnp, _layer_norm_jnp
from said_tpu.ops.pallas_norms import group_norm_pallas, layer_norm_pallas


@pytest.mark.parametrize("t,c,g", [(96, 192, 32), (128, 64, 8), (100, 512, 512)])
def test_group_norm_kernel_matches_jnp(t, c, g):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((2, t, c)) * 3 + 1.5, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ref = _group_norm_jnp(x, g, scale, bias)
    got = group_norm_pallas(x, scale, bias, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_group_norm_kernel_silu_epilogue():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((2, 64, 192)), jnp.float32)
    scale = jnp.ones((192,), jnp.float32)
    bias = jnp.zeros((192,), jnp.float32)
    ref = _group_norm_jnp(x, 32, scale, bias, act="silu")
    got = group_norm_pallas(x, scale, bias, 32, act="silu", interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)
    # and the fused act really is silu(groupnorm(x))
    base = _group_norm_jnp(x, 32, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(jax.nn.silu(base)), atol=1e-5, rtol=1e-5
    )


@pytest.mark.parametrize("t", [96, 3600])  # divides / falls back in _pick_block
def test_layer_norm_kernel_matches_jnp(t):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((2, t, 192)) * 2 - 0.5, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(192), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(192), jnp.float32)
    ref = _layer_norm_jnp(x, scale, bias)
    got = layer_norm_pallas(x, scale, bias, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_routed_norm_grads_match_jnp(monkeypatch):
    """custom_vjp: kernel forward (interpret), jnp-recompute backward —
    gradients must equal differentiating the jnp version directly."""
    monkeypatch.setenv("SAID_NORM_INTERPRET", "1")
    from said_tpu.ops.norms import group_norm, layer_norm_f32

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 64, 192)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(192), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(192), jnp.float32)

    def loss_routed(x, s, b):
        return (group_norm(x, 32, s, b, 1e-5, "silu") ** 2).sum() + (
            layer_norm_f32(x, s, b) ** 2
        ).sum()

    def loss_jnp(x, s, b):
        return (_group_norm_jnp(x, 32, s, b, 1e-5, "silu") ** 2).sum() + (
            _layer_norm_jnp(x, s, b) ** 2
        ).sum()

    g1 = jax.grad(loss_routed, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(x, scale, bias)
    for a, b_ in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b_), atol=1e-4, rtol=1e-4
        )


def test_group_norm_masked_kernel_matches_jnp():
    from said_tpu.ops.norms import _group_norm_masked_jnp
    from said_tpu.ops.pallas_norms import group_norm_masked_pallas

    rng = np.random.default_rng(4)
    b, t, c, g = 3, 96, 192, 32
    x = jnp.asarray(rng.standard_normal((b, t, c)) * 2 + 0.5, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    lens = np.array([96, 60, 33])
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    ref = _group_norm_masked_jnp(x, g, scale, bias, mask, act="silu")
    got = group_norm_masked_pallas(
        x, scale, bias, mask, g, act="silu", interpret=True
    )
    for i, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=1e-5, rtol=1e-5,
        )
    assert np.all(np.isfinite(np.asarray(got)))
    # masked stats == unpadded run on the real frames
    from said_tpu.ops.norms import _group_norm_jnp
    row1 = _group_norm_jnp(x[1:2, :60], g, scale, bias, act="silu")
    np.testing.assert_allclose(
        np.asarray(got)[1, :60], np.asarray(row1)[0], atol=1e-5, rtol=1e-5
    )


def test_group_norm_masked_grads_match_jnp(monkeypatch):
    monkeypatch.setenv("SAID_NORM_INTERPRET", "1")
    from said_tpu.ops.norms import _group_norm_masked_jnp, group_norm_masked

    rng = np.random.default_rng(5)
    b, t, c, g = 2, 64, 192, 32
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    scale = jnp.asarray(1 + 0.1 * rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
    mask = jnp.asarray(np.arange(t)[None, :] < np.array([[64], [40]]))
    mf = mask[:, :, None].astype(jnp.float32)

    def loss_routed(x, s, b_):
        return ((group_norm_masked(x, g, s, b_, mask) * mf) ** 2).sum()

    def loss_jnp(x, s, b_):
        return ((_group_norm_masked_jnp(x, g, s, b_, mask) * mf) ** 2).sum()

    g1 = jax.grad(loss_routed, argnums=(0, 1, 2))(x, scale, bias)
    g2 = jax.grad(loss_jnp, argnums=(0, 1, 2))(x, scale, bias)
    for a, b2 in zip(g1, g2):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b2), atol=1e-4, rtol=1e-4
        )


def test_row_blocked_grid_multiple_steps():
    """b // rb > 1: the batch index_map must address each row block
    (a collapsed index map would silently reuse block 0's rows)."""
    from said_tpu.ops.pallas_norms import _row_block, group_norm_pallas

    b, t, c, g = 4, 2048, 192, 32
    rb = _row_block(b, t, c)
    assert 1 <= rb < b  # the shape must actually exercise multiple steps
    rng = np.random.default_rng(6)
    x = jnp.asarray(rng.standard_normal((b, t, c)) * 2 + 1, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    from said_tpu.ops.norms import _group_norm_jnp

    ref = _group_norm_jnp(x, g, scale, bias)
    got = group_norm_pallas(x, scale, bias, g, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ffn_row_blocked_grid_multiple_steps():
    from said_tpu.ops.pallas_ffn import _geglu_ffn_jnp, geglu_ffn_pallas

    rng = np.random.default_rng(7)
    b, t, c = 8, 256, 192  # rb=4 -> grid (2, 1)
    inner = c * 4
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, inner * 2)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(inner * 2) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    ref = _geglu_ffn_jnp(x, w1, b1, w2, b2)
    got = geglu_ffn_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_group_norm_blocked_matches_jnp():
    """Two-phase blocked GroupNorm (long rows, T·C over the VMEM cap)
    vs the jnp twin — Chan-combined statistics must match two-pass."""
    from said_tpu.ops.norms import _group_norm_jnp
    from said_tpu.ops.pallas_norms import (
        _MAX_TC_VMEM,
        _t_block,
        group_norm_pallas_blocked,
    )

    b, t, c, g = 2, 4608, 192, 32
    assert t * c > _MAX_TC_VMEM  # the shape really is past the 1-block cap
    assert _t_block(t, c) > 0
    rng = np.random.default_rng(8)
    # offset mean well away from 0: a naive E[x²]−mean² would lose digits
    x = jnp.asarray(rng.standard_normal((b, t, c)) * 2 + 30.0, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    ref = _group_norm_jnp(x, g, scale, bias, act="silu")
    got = group_norm_pallas_blocked(
        x, scale, bias, g, act="silu", interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=2e-5
    )


def test_group_norm_masked_blocked_matches_jnp():
    from said_tpu.ops.norms import _group_norm_jnp, _group_norm_masked_jnp
    from said_tpu.ops.pallas_norms import (
        _MAX_TC_VMEM,
        group_norm_masked_pallas_blocked,
    )

    b, t, c, g = 2, 4608, 192, 32
    assert t * c > _MAX_TC_VMEM
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal((b, t, c)) + 5.0, jnp.float32)
    scale = jnp.asarray(rng.standard_normal(c), jnp.float32)
    bias = jnp.asarray(rng.standard_normal(c), jnp.float32)
    lens = np.array([4608, 2500])  # row 1's last blocks are fully padded
    mask = jnp.asarray(np.arange(t)[None, :] < lens[:, None])
    ref = _group_norm_masked_jnp(x, g, scale, bias, mask)
    got = group_norm_masked_pallas_blocked(
        x, scale, bias, mask, g, interpret=True
    )
    for i, n in enumerate(lens):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=2e-5,
        )
    assert np.all(np.isfinite(np.asarray(got)))
    # masked stats == unpadded run on the real frames
    row1 = _group_norm_jnp(x[1:2, :2500], g, scale, bias)
    np.testing.assert_allclose(
        np.asarray(got)[1, :2500], np.asarray(row1)[0], atol=2e-5, rtol=2e-5
    )


def test_norm_backend_routes_blocked(monkeypatch):
    """Routing: long whole-row shapes pick the blocked kernel on TPU (and
    in interpret CI); pathological lengths with no T-block fall to jnp."""
    from said_tpu.ops import norms

    monkeypatch.setenv("SAID_NORM_INTERPRET", "1")
    assert norms._norm_backend(4608, 192, whole_row=True) == "interpret_blocked"
    assert norms._norm_backend(96, 192, whole_row=True) == "interpret"
    # prime t (no multiple-of-8 divisor): jnp fallback
    assert norms._norm_backend(4099 * 8 + 1, 192, whole_row=True) == "jnp"
