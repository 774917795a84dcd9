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


# --- max-free blocked kernel: exp2-shift-bound safety properties --------
#
# The blocked kernel's exp2 shift is a precomputed per-row bound
# (pallas_attention._exp2_shift_bound) instead of an online running max.
# These tests pin the adversarial regimes the construction was designed
# for — a naive Cauchy-Schwarz-bound-with-clamp shift SILENTLY collapses
# toward uniform attention in each of them (the bound goes
# clamp-units loose), which is exactly why production uses
# min(CS bound, landmark max + slack).


def _flat(q, k, v):
    b, t, h, d = q.shape
    return (
        q.reshape(b, t, h * d),
        k.reshape(b, k.shape[1], h * d),
        v.reshape(b, v.shape[1], h * d),
    )


def test_blocked_shift_outlier_key_missed_by_landmarks():
    """One 50x-norm key at an index OFF the landmark stride: the
    Cauchy-Schwarz bound is ~300 log2 units loose for every row, but the
    min(M, L+slack) shift keeps the result exact (clamped entries carry
    < 2^-40 of the true mass)."""
    b, h, d, t = 1, 2, 32, 384
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    k = k.at[:, 100].multiply(50.0)  # 100 is not a multiple of 256
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        *_flat(q, k, v), num_heads=h, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)
    assert np.all(np.isfinite(np.asarray(got)))


def test_blocked_shift_aligned_maxnorm_outlier():
    """A query row strongly ALIGNED with a huge-norm key (the attention-
    sink shape: true max score towers over every strided landmark). The
    max-norm key is always in the landmark set, so L is tight and the
    output stays exact — softmax here is effectively one-hot on the
    outlier key."""
    b, h, d, t = 1, 2, 32, 384
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    k = k.at[:, 37].set(40.0 * q[:, 5] / jnp.linalg.norm(
        q[:, 5], axis=-1, keepdims=True))
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        *_flat(q, k, v), num_heads=h, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_blocked_shift_all_scores_very_negative():
    """Every real score far below zero (queries anti-aligned with a
    common key direction): the shift must follow the scores DOWN — a
    0-score phantom landmark (e.g. from zero padding) would pin the
    shift ~64 units above the true max and clamp away the entire row."""
    b, h, d, t = 1, 2, 32, 300  # t=300 also straddles the key blocks
    base = jax.random.normal(jax.random.PRNGKey(7), (1, 1, h, d))
    base = base / jnp.linalg.norm(base, axis=-1, keepdims=True)
    noise = 0.05 * jax.random.normal(jax.random.PRNGKey(8), (b, t, h, d))
    k = 12.0 * base + noise
    q = -12.0 * base + 0.05 * jax.random.normal(
        jax.random.PRNGKey(9), (b, t, h, d))
    v = jax.random.normal(jax.random.PRNGKey(2), (b, t, h, d))
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        *_flat(q, k, v), num_heads=h, block_q=128, block_k=128,
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=1e-4)


def test_blocked_shift_garbage_beyond_runtime_lengths():
    """Runtime-length mode with HUGE garbage in the padded key region:
    padded keys must influence neither the landmark max (would loosen or
    falsely tighten the shift) nor the max-norm candidate, and the
    where-zero mask must kill them after exp2."""
    b, h, d, t = 2, 2, 32, 384
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    lengths = np.array([384, 200], np.int32)
    # poison the padded tail of row 1 with enormous values
    k = k.at[1, 200:].set(1e4)
    v = v.at[1, 200:].set(1e4)
    ref = _dense_reference(q, k, v, lengths=lengths).reshape(b, t, h * d)
    got = _flash_tpu_packed_blocked(
        *_flat(q, k, v), jnp.asarray(lengths), num_heads=h,
        block_q=128, block_k=128, has_lens=True, interpret=True,
    )
    for i, n in enumerate(lengths):
        np.testing.assert_allclose(
            np.asarray(got)[i, :n], np.asarray(ref)[i, :n],
            atol=2e-5, rtol=1e-4,
        )
    assert np.all(np.isfinite(np.asarray(got)))


def test_blocked_shift_zero_length_row():
    """A zero-length row: no key block ever runs, the shift's isfinite
    guard keeps A finite, and the finalize zero-fills (no 0/0)."""
    b, h, d, t = 2, 2, 32, 256
    q, k, v = _qkv(t, t, b=b, h=h, d=d)
    lengths = np.array([256, 0], np.int32)
    got = np.asarray(_flash_tpu_packed_blocked(
        *_flat(q, k, v), jnp.asarray(lengths), num_heads=h,
        block_q=128, block_k=128, has_lens=True, interpret=True,
    ))
    ref = _dense_reference(q, k, v).reshape(b, t, h * d)
    np.testing.assert_allclose(got[0], np.asarray(ref)[0],
                               atol=2e-5, rtol=1e-4)
    assert np.all(got[1] == 0.0)
    assert np.all(np.isfinite(got))


def test_shift_bound_accuracy_envelope():
    """The unconditional guarantee the kernel relies on:
    A <= truemax + _SHIFT_SLACK for every row/head, on random data, on
    every adversarial shape above, and WITH runtime lengths."""
    from said_tpu.ops.pallas_attention import (
        _LOG2E,
        _SHIFT_SLACK,
        _exp2_shift_bound,
    )

    b, h, d, t = 2, 2, 32, 384
    q, k, _ = _qkv(t, t, b=b, h=h, d=d)
    k = k.at[0, 100].multiply(50.0)
    k = k.at[1, 301].set(-30.0)
    lengths = jnp.asarray([384, 320], jnp.int32)
    qf = (q * (d**-0.5 * _LOG2E)).reshape(b, t, h * d)
    a = _exp2_shift_bound(qf, k.reshape(b, t, h * d), h, lengths=lengths)
    scores = jnp.einsum(
        "bthd,bshd->bhts", q.astype(jnp.float32) * (d**-0.5 * _LOG2E),
        k.astype(jnp.float32),
    )
    valid = jnp.arange(t)[None, :] < lengths[:, None]
    scores = jnp.where(valid[:, None, None, :], scores, -jnp.inf)
    truemax = scores.max(axis=-1).transpose(0, 2, 1)  # (b, t, h)
    slack = np.asarray(a - truemax)
    assert slack.max() <= _SHIFT_SLACK + 1.0 + 1e-3  # +1 = the CS slop pad
