"""Flash-attention kernel numerics (interpret mode on CPU).

Covers the packed-layout kernels (fullk and online-softmax blocked),
block-boundary straddling shapes, the runtime-length mode (bucketed /
mixed-length batches), and the routers: real rows must match the dense
masked reference exactly, padded query rows must be finite (zeros).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.pallas_attention import (
    _dense_reference,
    _flash_tpu_packed,
    _flash_tpu_packed_blocked,
)


def _qkv(t, s, b=1, h=2, d=32):
    q = jax.random.normal(jax.random.PRNGKey(0), (b, t, h, d))
    k = jax.random.normal(jax.random.PRNGKey(1), (b, s, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, s, h, d))
    return q, k, v


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


def test_bthd_wrapper_matches_flat_router(monkeypatch):
    """The (B, T, H, D) wrapper must equal the flat router bit-for-bit
    (it IS the flat router plus free reshapes) — driven through the real
    packed kernel via interpret mode."""
    monkeypatch.setenv("SAID_FLASH_INTERPRET", "1")
    from said_tpu.ops.pallas_attention import (
        flash_attention,
        flash_attention_flat,
    )

    b, h, d, t = 2, 2, 32, 192
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    got = flash_attention(q, k, v)
    flat = flash_attention_flat(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d),
        v.reshape(b, t, h * d), h,
    )
    np.testing.assert_array_equal(
        np.asarray(got), np.asarray(flat).reshape(b, t, h, d)
    )


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300)])
def test_packed_flash_matches_dense(t, s):
    """The packed (B, T, H·D)-layout kernel — the production path, zero
    caller-side transposes — must match dense."""
    b, h, d = 2, 2, 32
    q, k, v = _qkv(t, s, b=b, h=h, d=d)
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed(
        q.reshape(b, t, h * d), k.reshape(b, s, h * d), v.reshape(b, s, h * d),
        num_heads=h, block_q=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_flash_runtime_lengths():
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
    # Padded query rows must be FINITE (never NaN — they get multiplied
    # by zero masks downstream and NaN·0 would poison the convs). Rows in
    # straddling blocks hold finite garbage; fully-padded blocks are
    # zero-filled without computing.
    assert np.all(np.isfinite(np.asarray(got)))


@pytest.mark.parametrize("t,s", [(256, 256), (300, 300), (256, 520)])
def test_packed_blocked_flash_matches_dense(t, s):
    """The packed-layout ONLINE-SOFTMAX kernel (the >4-minute-clip path:
    key axis streamed in blocks) must match dense, including shapes that
    straddle both the query and key block boundaries."""
    b, h, d = 2, 2, 32
    q, k, v = _qkv(t, s, b=b, h=h, d=d)
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        q.reshape(b, t, h * d), k.reshape(b, s, h * d), v.reshape(b, s, h * d),
        num_heads=h, block_q=128, block_k=128, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)


def test_packed_blocked_flash_runtime_lengths():
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


def test_vmem_block_scaling_with_model_width():
    """Kernel/router block sizing must scale with the packed inner dim:
    the round-3 6-minute bench exposed a VMEM OOM when the 768-wide
    wav2vec2 encoder hit block sizes tuned for the 192-wide denoiser."""
    from said_tpu.ops.pallas_attention import _blocked_blocks, _fullk_smax

    # denoiser (6 heads x 32, bf16): reproduces the tuned (512, 2048)
    assert _blocked_blocks(192, 6, 2) == (512, 2048)
    # wav2vec2 encoder (12 heads x 64, bf16): smaller blocks
    bq, bk = _blocked_blocks(768, 12, 2)
    assert bq <= 512 and bk < 2048
    # double-buffered K+V blocks stay under ~8 MB at any width
    for inner, h in [(192, 6), (768, 12), (1024, 16), (4096, 32)]:
        bq, bk = _blocked_blocks(inner, h, 2)
        assert bk * (2 * inner + h) * 2 * 2 <= 8 * 1024 * 1024 + 1
        assert bq % 128 == 0 and bk % 128 == 0
    # full-K ceiling: ~14.7k keys at inner=192, ~3.7k at inner=768
    assert _fullk_smax(192, 6, 2) >= 14400
    assert _fullk_smax(768, 12, 2) < 4000


def test_packed_blocked_flash_wide_model():
    """Blocked kernel at the wav2vec2 encoder width (12 heads x 64) with
    the production block sizes from _blocked_blocks."""
    from said_tpu.ops.pallas_attention import _blocked_blocks

    b, h, d, t = 1, 12, 64, 320
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    bq, bk = _blocked_blocks(h * d, h, 4)
    got = _flash_tpu_packed_blocked(
        q.reshape(b, t, h * d), k.reshape(b, t, h * d), v.reshape(b, t, h * d),
        num_heads=h, block_q=min(bq, 128), block_k=min(bk, 128),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4)
