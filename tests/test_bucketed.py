"""Length-bucketed execution must be EXACT on the real frames.

The whole point of the bucketed mode: one compiled program serves all
clip lengths in a bucket, with masked norms/attention and pre-conv pad
zeroing making the valid region bit-match an unpadded run.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.models.said import SAID, SAIDPipeline, process_audio
from said_tpu.models.unet1d import UNet1DConditionModel
from said_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

SMALL_CFG = Wav2Vec2Config(
    conv_dim=(16, 16),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    hidden_size=32,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=64,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
    output_hidden_size=32,
)


def test_wav2vec2_dynamic_matches_exact():
    model = Wav2Vec2Encoder(SMALL_CFG)
    rng = jax.random.PRNGKey(0)
    wav_real = jax.random.normal(rng, (2, 3200))
    params = model.init({"params": rng}, wav_real, 60)["params"]

    exact = model.apply({"params": params}, wav_real, 60)

    wav_pad = jnp.pad(wav_real, ((0, 0), (0, 800)))
    dyn = model.apply(
        {"params": params},
        wav_pad,
        80,
        input_length=jnp.asarray(3200),
        num_frames_real=jnp.asarray(60),
    )
    np.testing.assert_allclose(
        np.asarray(dyn[:, :60]), np.asarray(exact), atol=2e-5, rtol=1e-4
    )


def test_unet_dynamic_matches_exact():
    model = UNet1DConditionModel()
    rng = jax.random.PRNGKey(1)
    t_real, t_pad = 30, 48
    x_real = jax.random.normal(rng, (2, t_real, 32))
    ctx_real = jax.random.normal(jax.random.PRNGKey(2), (2, t_real, 768))
    ts = jnp.array([100, 900])
    params = model.init({"params": rng}, x_real, ts, ctx_real)["params"]

    exact = model.apply({"params": params}, x_real, ts, ctx_real)

    x_pad = jnp.pad(x_real, ((0, 0), (0, t_pad - t_real), (0, 0)))
    ctx_pad = jnp.pad(ctx_real, ((0, 0), (0, t_pad - t_real), (0, 0)))
    dyn = model.apply(
        {"params": params},
        x_pad,
        ts,
        ctx_pad,
        seq_len_real=jnp.asarray(t_real),
    )
    np.testing.assert_allclose(
        np.asarray(dyn[:, :t_real]), np.asarray(exact), atol=3e-5, rtol=1e-4
    )


def test_pipeline_bucketed_matches_exact():
    """Full inference: bucketed result == exact result on real frames,
    and one compiled program serves two different lengths."""
    from said_tpu.cli._common import init_said_params

    model = SAID(audio_config=SMALL_CFG)
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)

    rng = np.random.default_rng(0)
    results = {}
    for n_frames in [20, 26]:
        # smallest sample count whose int(t_a/sr·fps) equals n_frames
        t_a = int(np.ceil(n_frames * 16000 / 60))
        wave = process_audio(rng.standard_normal((1, t_a)).astype(np.float32))
        latents = rng.standard_normal((1, n_frames, 32)).astype(np.float32)
        exact = pipeline.inference(
            waveform_processed=wave,
            num_inference_steps=3,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(7),
            latents=latents,
        )
        bucketed = pipeline.inference(
            waveform_processed=wave,
            num_inference_steps=3,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(7),
            latents=latents,
            length_bucket=32,
        )
        np.testing.assert_allclose(
            bucketed.result[:, :n_frames], exact.result, atol=5e-5, rtol=1e-3
        )
        results[n_frames] = bucketed

    # Both lengths hit the same bucket → exactly ONE dynamic prepare
    # compile and ONE dynamic denoise compile. Key layouts:
    # ("prepare", do_cfg, window, dynamic, sp) /
    # ("denoise", config, use_init, use_mask, save_interm, dynamic, chunk)
    dyn_prep = [
        k for k in pipeline._jit_cache if k[0] == "prepare" and k[-2] is True
    ]
    dyn_dn = [
        k for k in pipeline._jit_cache if k[0] == "denoise" and k[-2] is True
    ]
    assert len(dyn_prep) == 1 and len(dyn_dn) == 1


def test_mixed_length_batch_matches_individual_runs():
    """Two clips of DIFFERENT lengths in one batch must each reproduce
    their own exact-shape single-clip run (per-row masked numerics)."""
    from said_tpu.cli._common import init_said_params

    model = SAID(audio_config=SMALL_CFG)
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)

    rng = np.random.default_rng(3)
    frames = [18, 26]
    t_as = [int(np.ceil(n * 16000 / 60)) for n in frames]
    waves = [
        process_audio(rng.standard_normal((1, t)).astype(np.float32))[0]
        for t in t_as
    ]
    latents = [
        rng.standard_normal((n, 32)).astype(np.float32) for n in frames
    ]

    # individual exact-shape runs
    singles = []
    for w, lat, n in zip(waves, latents, frames):
        out = pipeline.inference(
            waveform_processed=w[None],
            num_inference_steps=3,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(5),
            latents=lat[None],
        )
        singles.append(out.result[0, :n])

    # one mixed batch: zero-pad rows to the widest clip
    t_max = max(t_as)
    n_max = max(frames)
    wave_batch = np.zeros((2, t_max), np.float32)
    lat_batch = np.zeros((2, n_max, 32), np.float32)
    for i, (w, lat) in enumerate(zip(waves, latents)):
        wave_batch[i, : len(w)] = w
        lat_batch[i, : frames[i]] = lat

    out = pipeline.inference(
        waveform_processed=wave_batch,
        num_inference_steps=3,
        guidance_scale=2.0,
        rng=jax.random.PRNGKey(5),
        latents=lat_batch,
        length_bucket=32,
        waveform_lengths=np.asarray(t_as),
    )
    for i, n in enumerate(frames):
        np.testing.assert_allclose(
            out.result[i, :n], singles[i], atol=5e-5, rtol=1e-3,
            err_msg=f"row {i}",
        )
