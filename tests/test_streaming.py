"""Streaming long-clip serving (``SAIDPipeline.inference_streaming``).

Windows after the first are generated through the masked-editing path
with their leading frames pinned to the already-generated coefficients
(reference editing mechanism: ``said/model/diffusion.py:446-456``); the
inpainting re-noising makes the pinned region land bit-exactly on the
previous window's values at the final step, so stitching is seamless by
construction. These tests pin that contract plus the window/stride
bookkeeping (final-window re-alignment, audio slicing, delegation).
"""

import numpy as np
import pytest

import jax

from said_tpu.models.said import SAID, SAIDPipeline, process_audio
from said_tpu.models.wav2vec2 import Wav2Vec2Config

FPS = 60
SR = 16000


@pytest.fixture(scope="module")
def small_pipeline():
    cfg = Wav2Vec2Config(
        conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
        conv_bias=False, hidden_size=24, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=48,
        num_conv_pos_embeddings=16, num_conv_pos_embedding_groups=4,
        output_hidden_size=24,
    )
    model = SAID(audio_config=cfg)
    from said_tpu.cli._common import init_said_params

    params = init_said_params(model, seed=0)
    return SAIDPipeline(model, params)


def _wave(frames: int, seed: int = 0, batch: int = 1) -> np.ndarray:
    n = int(round(frames * SR / FPS))
    rng = np.random.default_rng(seed)
    return process_audio(rng.standard_normal((batch, n)).astype(np.float32))


def test_short_clip_delegates_to_plain_inference(small_pipeline):
    """A clip that fits one window must be bit-equal to inference()."""
    wave = _wave(24)
    rng = jax.random.PRNGKey(5)
    want = small_pipeline.inference(
        wave, num_inference_steps=6, guidance_scale=2.0, rng=rng
    ).result
    got = small_pipeline.inference_streaming(
        wave, window_frames=24, overlap_frames=6,
        num_inference_steps=6, guidance_scale=2.0, rng=rng,
    ).result
    np.testing.assert_array_equal(got, want)


def test_streaming_shape_range_and_exact_pinning(small_pipeline):
    """Multi-window run: output covers every frame, stays in [0,1], and
    re-running a later window's inference by hand shows its pinned
    region equals the stitched output EXACTLY (the seam contract)."""
    total = 60  # windows: starts 0, 18, 36 (stride 18), final realigned to 36
    w, o = 24, 6
    wave = _wave(total, seed=1)
    rng = jax.random.PRNGKey(7)
    steps = dict(num_inference_steps=6, guidance_scale=2.0)
    out = small_pipeline.inference_streaming(
        wave, window_frames=w, overlap_frames=o, rng=rng, **steps
    ).result
    assert out.shape == (1, total, 32)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0

    # Reproduce window 1 by hand with the same per-window rng and assert
    # the masked region of its raw result is the pinned values exactly.
    stride = w - o
    starts = [0]
    while starts[-1] + w < total:
        starts.append(min(starts[-1] + stride, total - w))
    rngs = jax.random.split(rng, len(starts))
    start, covered = starts[1], starts[0] + w
    kept = covered - start
    init = np.zeros((1, w, 32), np.float32)
    init[:, :kept] = out[:, start:covered]
    mask = np.zeros((1, w, 32), np.float32)
    mask[:, :kept] = 1.0
    s0 = int(round(start * SR / FPS))
    wave_k = wave[:, s0 : s0 + (w * SR) // FPS]
    res = small_pipeline.inference(
        wave_k, init_samples=init, mask=mask, rng=rngs[1], **steps
    ).result
    np.testing.assert_array_equal(res[:, :kept], init[:, :kept])
    # ... and the free region is what was stitched into the output.
    np.testing.assert_array_equal(res[:, kept:], out[:, covered : start + w])


def test_final_window_realigns_to_clip_end(small_pipeline):
    """When the stride overshoots, the final window slides back to end
    exactly at the last frame (more pinned context, never a short or
    padded window)."""
    total, w, o = 40, 24, 6  # starts: 0, 16 (realigned from 18)
    wave = _wave(total, seed=2)
    out = small_pipeline.inference_streaming(
        wave, window_frames=w, overlap_frames=o,
        num_inference_steps=4, guidance_scale=2.0,
        rng=jax.random.PRNGKey(3),
    ).result
    assert out.shape == (1, total, 32)
    assert np.all(np.isfinite(out))
    # every frame was written (window 0 writes [0,24), window 1 [24,40);
    # a hole would be exactly 0 across all 32 channels — vanishingly
    # improbable for generated coefficients)
    assert not np.any(np.all(out == 0.0, axis=-1))


def test_streaming_batch_rows_are_independent_lengthwise(small_pipeline):
    out = small_pipeline.inference_streaming(
        _wave(42, seed=3, batch=2), window_frames=24, overlap_frames=9,
        num_inference_steps=4, guidance_scale=2.0,
        rng=jax.random.PRNGKey(11),
    ).result
    assert out.shape == (2, 42, 32)
    assert np.all(np.isfinite(out))


def test_streaming_validation(small_pipeline):
    wave = _wave(30)
    with pytest.raises(ValueError, match="multiple of 3"):
        small_pipeline.inference_streaming(wave, window_frames=20)
    with pytest.raises(ValueError, match="overlap_frames"):
        small_pipeline.inference_streaming(
            wave, window_frames=24, overlap_frames=24
        )
    with pytest.raises(ValueError, match="overlap_frames"):
        small_pipeline.inference_streaming(
            wave, window_frames=24, overlap_frames=0
        )


def test_hour_scale_compile_bound_and_every_seam(small_pipeline):
    """The claims that make hour-scale streaming serving affordable,
    pinned: stitching ≥4 windows costs exactly TWO denoise program
    families (first window unmasked + ONE masked program shared by all
    later windows) and ONE prepare program — so per-second compute is
    constant and compile cost is O(1) in clip length — and the pinned
    overlap lands bit-exactly at EVERY seam, not just the first."""
    pipe = SAIDPipeline(small_pipeline.model, small_pipeline.params)  # fresh jit cache
    total, w, o = 96, 24, 6  # starts 0,18,36,54,72 → 5 windows, 4 seams
    wave = _wave(total, seed=9)
    steps = dict(num_inference_steps=4, guidance_scale=2.0)

    calls = []
    orig = pipe.inference

    def spy(*a, **kw):
        res = orig(*a, **kw)
        calls.append((kw.get("init_samples"), kw.get("mask"), res.result))
        return res

    pipe.inference = spy
    try:
        out = pipe.inference_streaming(
            wave, window_frames=w, overlap_frames=o,
            rng=jax.random.PRNGKey(17), **steps,
        ).result
    finally:
        pipe.inference = orig
    assert out.shape == (1, total, 32) and np.all(np.isfinite(out))
    assert len(calls) == 5

    denoise_keys = [k for k in pipe._jit_cache if k[0] == "denoise"]
    prepare_keys = [k for k in pipe._jit_cache if k[0] == "prepare"]
    assert len(denoise_keys) == 2, denoise_keys  # unmasked + masked, shared
    assert len(prepare_keys) == 1, prepare_keys  # keyed on geometry only

    # every seam: each later window's raw result is bit-exact on its
    # pinned region (the stitched output then contains no discontinuity
    # the model didn't generate)
    assert all(c[0] is not None for c in calls[1:])
    for init, mask, res in calls[1:]:
        kept = int(mask[0, :, 0].sum())
        assert kept >= o
        np.testing.assert_array_equal(res[:, :kept], init[:, :kept])


def test_streaming_dpmpp_solver(small_pipeline):
    """The seam contract holds under the DPM++ solver too (the mask
    path re-noises identically there; the stitched result must be
    finite and in range)."""
    out = small_pipeline.inference_streaming(
        _wave(48, seed=4), window_frames=24, overlap_frames=6,
        num_inference_steps=5, guidance_scale=2.0, solver="dpmpp_2m",
        rng=jax.random.PRNGKey(13),
    ).result
    assert out.shape == (1, 48, 32)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0
