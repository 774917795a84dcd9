"""All Pallas kernels together, end-to-end through the sampler on CPU.

Each kernel (flash attention, GroupNorm32/LayerNorm, masked GroupNorm,
GEGLU FFN, strided conv+GELU) has isolated interpret-mode parity tests; this drives the
REAL kernel code paths composed inside the full inference pipeline and
checks the result against the plain jnp execution — the closest CI can
get to the TPU production configuration without a chip.
"""

import numpy as np
import pytest

import jax

from said_tpu.cli._common import init_said_params
from said_tpu.models.said import SAID, SAIDPipeline, process_audio
from said_tpu.models.wav2vec2 import Wav2Vec2Config

TINY = Wav2Vec2Config(
    conv_dim=(32, 32),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    hidden_size=64,
    num_hidden_layers=1,
    num_attention_heads=2,
    intermediate_size=128,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    output_hidden_size=64,
)


def _infer(impl, length_bucket=0, lengths=None):
    model = SAID(audio_config=TINY, self_attn_impl=impl)
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)
    rng = np.random.default_rng(0)
    n = 2 if lengths is None else len(lengths)
    t_a = 16000  # 60 frames
    waves = rng.standard_normal((n, t_a)).astype(np.float32)
    if lengths is not None:
        for i, ln in enumerate(lengths):
            waves[i, ln:] = 0.0
    return pipeline.inference(
        waveform_processed=process_audio(waves),
        num_inference_steps=4,
        guidance_scale=2.0,
        rng=jax.random.PRNGKey(0),
        length_bucket=length_bucket,
        waveform_lengths=(
            None if lengths is None else np.asarray(lengths)
        ),
    ).result


def test_all_kernels_through_sampler(monkeypatch):
    ref = _infer("dense")
    monkeypatch.setenv("SAID_FLASH_INTERPRET", "1")
    monkeypatch.setenv("SAID_NORM_INTERPRET", "1")
    monkeypatch.setenv("SAID_FFN_INTERPRET", "1")
    monkeypatch.setenv("SAID_CONV_INTERPRET", "1")
    got = _infer("flash")
    np.testing.assert_allclose(got, ref, atol=5e-4, rtol=1e-3)


def test_all_kernels_through_bucketed_sampler(monkeypatch):
    lengths = [16000, 11000]
    ref = _infer("dense", length_bucket=16, lengths=lengths)
    monkeypatch.setenv("SAID_FLASH_INTERPRET", "1")
    monkeypatch.setenv("SAID_NORM_INTERPRET", "1")
    monkeypatch.setenv("SAID_FFN_INTERPRET", "1")
    monkeypatch.setenv("SAID_CONV_INTERPRET", "1")
    got = _infer("flash", length_bucket=16, lengths=lengths)
    for i, ln in enumerate(lengths):
        frames = int(ln / 16000 * 60)
        np.testing.assert_allclose(
            got[i, :frames], ref[i, :frames], atol=5e-4, rtol=1e-3
        )
    assert np.all(np.isfinite(got))
