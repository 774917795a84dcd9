"""Flash-attention kernel numerics (interpret mode on CPU).

Covers both kernels (fullk and blocked online-softmax), block-boundary
straddling shapes, and the runtime-length mode (bucketed / mixed-length
batches): real rows must match the dense masked reference exactly,
padded query rows must be finite (zeros).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.pallas_attention import (
    _dense_reference,
    _flash_tpu_blocked,
    _flash_tpu_fullk,
)


def _qkv(t, s, b=1, h=2, d=32):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    return q, k, v


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300), (256, 520)])
def test_blocked_flash_matches_dense(t, s):
    q, k, v = _qkv(t, s)
    ref = _dense_reference(q, k, v)
    got = _flash_tpu_blocked(q, k, v, block_q=128, block_k=256, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300), (256, 520)])
def test_fullk_flash_matches_dense(t, s):
    q, k, v = _qkv(t, s)
    ref = _dense_reference(q, k, v)
    got = _flash_tpu_fullk(q, k, v, block_q=128, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


@pytest.mark.parametrize("kernel,kw", [
    (_flash_tpu_fullk, dict(block_q=128)),
    (_flash_tpu_blocked, dict(block_q=128, block_k=128)),
])
def test_runtime_lengths_match_dense_masked(kernel, kw):
    """Mixed-length batch: each row masked to its own real length."""
    b, h, t = 3, 2, 384
    q, k, v = _qkv(t, t, b=b, h=h)
    lengths = np.array([384, 200, 129], np.int32)  # full, straddle, straddle
    lens_bh = jnp.repeat(jnp.asarray(lengths), h)
    ref = _dense_reference(q, k, v, lengths=lengths)
    got = kernel(q, k, v, lens_bh, has_lens=True, interpret=True, **kw)
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=1e-4,
        )
    # Padded query rows must be FINITE (never NaN — they get multiplied
    # by zero masks downstream and NaN·0 would poison the convs). Rows in
    # straddling blocks hold finite garbage; fully-padded blocks are
    # zero-filled without computing.
    assert np.all(np.isfinite(np.asarray(got)))


def test_router_lengths_dense_path():
    """flash_attention with lengths on the dense (short) path."""
    from said_tpu.ops.pallas_attention import flash_attention

    b, h, t = 2, 2, 64
    q, k, v = _qkv(t, t, b=b, h=h)
    lengths = np.array([64, 40], np.int32)
    ref = _dense_reference(q, k, v, lengths=lengths)
    got = flash_attention(q, k, v, lengths=jnp.asarray(lengths))
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=1e-4,
        )


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300)])
def test_packed_flash_matches_dense(t, s):
    """The packed (B, T, H·D)-layout kernel — the production path, zero
    caller-side transposes — must match dense."""
    from said_tpu.ops.pallas_attention import _flash_tpu_packed

    b, h, d = 2, 2, 32
    q, k, v = _qkv(t, s, b=b, h=h, d=d)
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed(
        q.reshape(b, t, h * d), k.reshape(b, s, h * d), v.reshape(b, s, h * d),
        num_heads=h, block_q=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_flash_runtime_lengths():
    from said_tpu.ops.pallas_attention import _flash_tpu_packed

    b, h, d, t = 3, 2, 32, 384
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    lengths = np.array([384, 200, 129], np.int32)
    ref = _dense_reference(q, k, v, lengths=lengths).reshape(b, t, h * d)
    got = _flash_tpu_packed(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d), v.reshape(b, t, h * d),
        jnp.asarray(lengths), num_heads=h, block_q=128, has_lens=True,
        interpret=True,
    )
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=1e-4,
        )
    assert np.all(np.isfinite(np.asarray(got)))


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300), (256, 520)])
def test_packed_blocked_flash_matches_dense(t, s):
    """The packed-layout ONLINE-SOFTMAX kernel (the >4-minute-clip path:
    key axis streamed in blocks) must match dense, including shapes that
    straddle both the query and key block boundaries."""
    from said_tpu.ops.pallas_attention import _flash_tpu_packed_blocked

    b, h, d = 2, 2, 32
    q, k, v = _qkv(t, s, b=b, h=h, d=d)
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        q.reshape(b, t, h * d), k.reshape(b, s, h * d), v.reshape(b, s, h * d),
        num_heads=h, block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_blocked_flash_runtime_lengths():
    from said_tpu.ops.pallas_attention import _flash_tpu_packed_blocked

    b, h, d, t = 3, 2, 32, 384
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    lengths = np.array([384, 200, 129], np.int32)  # full, straddle, straddle
    ref = _dense_reference(q, k, v, lengths=lengths).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d), v.reshape(b, t, h * d),
        jnp.asarray(lengths), num_heads=h, block_q=128, block_k=128,
        has_lens=True, interpret=True,
    )
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=1e-4,
        )
    assert np.all(np.isfinite(np.asarray(got)))
