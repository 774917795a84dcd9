"""Sequence parallelism: frame-axis sharding over a 'seq' mesh.

The reference has no sequence/context parallelism of any kind (SURVEY
§2.9); long clips run a single-device dense O(T^2) attention
(``said/model/diffusion.py:359-364``). Here the frame axis shards over
the mesh: GSPMD partitions convs/norms spatially and the flash kernel's
``custom_partitioning`` rule keeps attention blockwise (Q sharded, K/V
gathered per shard). These tests prove on an 8-virtual-device CPU mesh
that the sharded program computes EXACTLY what the unsharded one does.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from said_tpu.ops.pallas_attention import _dense_flat, flash_attention_flat_sp


def _seq_mesh(n):
    devs = jax.devices()
    if len(devs) < n:
        pytest.skip(f"needs {n} devices")
    return Mesh(np.asarray(devs[:n]), ("seq",))


def test_sp_attention_matches_dense():
    """custom_partitioning rule: sharded-Q/gathered-KV == dense."""
    b, h, d, t = 2, 2, 32, 256
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    ref = _dense_flat(q, k, v, h)

    mesh = _seq_mesh(4)
    shard = NamedSharding(mesh, P(None, "seq", None))
    qs = jax.device_put(q, shard)
    ks = jax.device_put(k, shard)
    vs = jax.device_put(v, shard)

    got = jax.jit(lambda a, b_, c: flash_attention_flat_sp(a, b_, c, h))(
        qs, ks, vs
    )
    assert got.sharding.is_equivalent_to(shard, 3)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=2e-5, rtol=1e-4
    )


def test_sp_attention_grads_match_dense():
    """flash_sp is differentiable: its custom_vjp recomputes the dense
    backward (GSPMD-partitioned einsums), so grads through the sharded
    kernel equal grads through plain dense attention. The reference has
    no sequence-parallel training at all (SURVEY §2.9)."""
    b, h, d, t = 2, 2, 32, 256
    rng = np.random.default_rng(1)
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)

    def loss_sp(a, b_, c):
        return (flash_attention_flat_sp(a, b_, c, h) * w).sum()

    def loss_ref(a, b_, c):
        return (_dense_flat(a, b_, c, h) * w).sum()

    ref_grads = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)

    mesh = _seq_mesh(4)
    shard = NamedSharding(mesh, P(None, "seq", None))
    qs, ks, vs = (jax.device_put(x, shard) for x in (q, k, v))
    got_grads = jax.jit(jax.grad(loss_sp, argnums=(0, 1, 2)))(qs, ks, vs)

    for got, ref in zip(got_grads, ref_grads):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(ref), atol=5e-4, rtol=1e-4
        )


def test_sp_train_step_runs():
    """One full SAiD training step with the window (frame) axis sharded
    over a 'seq' mesh and the flash_sp denoiser: compiles, runs, and the
    updated params stay finite — sequence-parallel TRAINING, which the
    reference cannot express (it caps windows instead,
    ``script/dataset/dataset_voca.py:553-554``)."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.models.said import SAID, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.train.said_train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    cfg = Wav2Vec2Config(
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
    model = SAID(audio_config=cfg, self_attn_impl="flash_sp")
    schedule = DiffusionSchedule.create(model.diffusion_steps)
    config = TrainConfig()
    params = init_said_params(model, seed=0)
    state = create_train_state(config, params)

    mesh = _seq_mesh(4)
    b, window = 2, 128
    rng = np.random.default_rng(0)
    wave = process_audio(
        rng.standard_normal((b, 34134)).astype(np.float32)
    )  # -> 128 frames at 60 fps
    coeffs = rng.uniform(0, 1, (b, window, 32)).astype(np.float32)
    batch = {
        "waveform": jax.device_put(
            jnp.asarray(wave), NamedSharding(mesh, P(None, None))
        ),
        "coeffs": jax.device_put(
            jnp.asarray(coeffs), NamedSharding(mesh, P(None, "seq", None))
        ),
        "cond": jax.device_put(
            jnp.ones((b,), bool), NamedSharding(mesh, P(None))
        ),
    }

    train_step = jax.jit(make_train_step(model, schedule, config))
    new_state, metrics = train_step(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["nan_skipped"]) == 0.0
    assert int(new_state.step) == 1
    leaves = jax.tree_util.tree_leaves(new_state.params)
    assert all(np.all(np.isfinite(np.asarray(x))) for x in leaves)


def test_sp_unet_forward_matches_unsharded():
    """Full denoiser forward with frame-sharded latents: GSPMD convs
    (halo exchange), norms, banded cross-attention, and the flash_sp
    self-attention must reproduce the single-device result."""
    from said_tpu.models.unet1d import UNet1DConditionModel

    t, b = 256, 2
    model_sp = UNet1DConditionModel(self_attn_impl="flash_sp")
    model_ref = UNet1DConditionModel(self_attn_impl="dense")
    rng = jax.random.PRNGKey(0)
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t, 32))
    ts = jnp.array([5, 700], jnp.int32)
    ctx = jax.random.normal(jax.random.PRNGKey(2), (b, t, 768))
    params = model_ref.init({"params": rng}, sample, ts, ctx)["params"]

    ref = model_ref.apply({"params": params}, sample, ts, ctx)

    mesh = _seq_mesh(4)
    shard = NamedSharding(mesh, P(None, "seq", None))
    got = jax.jit(
        lambda s, c: model_sp.apply({"params": params}, s, ts, c)
    )(jax.device_put(sample, shard), jax.device_put(ctx, shard))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_sp_pipeline_inference_matches_unsharded():
    """End-to-end sampling with seq_mesh: K/V caches and latents sharded
    along frames; result equals the unsharded pipeline bit-for-bit at
    f32 tolerances."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.models.said import SAID, SAIDPipeline, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config

    cfg = Wav2Vec2Config(
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
    rng = np.random.default_rng(0)
    t_a = 34134  # int(t_a/16000*60) == 128 frames -> divisible by 4 shards
    wave = process_audio(rng.standard_normal((1, t_a)).astype(np.float32))

    outs = {}
    for impl, mesh in (
        ("dense", None),
        ("flash_sp", _seq_mesh(4)),
    ):
        # flash_sp on BOTH attention stacks: the denoise chain and the
        # audio-encoder prepare stage run frame-sharded (split-prepare
        # path: conv feats unsharded, then device_put('seq') + sharded
        # encoder + K/V gather).
        model = SAID(
            audio_config=cfg, self_attn_impl=impl,
            encoder_attn_impl=impl if impl == "flash_sp" else "dense",
        )
        params = init_said_params(model, seed=0)
        pipeline = SAIDPipeline(model, params)
        outs[impl] = pipeline.inference(
            waveform_processed=wave,
            num_inference_steps=4,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(0),
            seq_mesh=mesh,
        ).result

    np.testing.assert_allclose(
        outs["flash_sp"], outs["dense"], atol=1e-4, rtol=1e-3
    )


def test_sp_encoder_matches_unsharded():
    """The audio-encoder transformer (prepare stage) with frame-sharded
    features: flash_sp attention + jnp norms + GSPMD positional conv
    (halo exchange) must equal the unsharded dense encoder."""
    from said_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

    cfg = Wav2Vec2Config(
        conv_dim=(32, 32),
        conv_stride=(5, 2),
        conv_kernel=(10, 3),
        hidden_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        intermediate_size=128,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        output_hidden_size=64,
    )
    enc_sp = Wav2Vec2Encoder(cfg, attn_impl="flash_sp")
    enc_ref = Wav2Vec2Encoder(cfg, attn_impl="dense")
    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.standard_normal((2, 128, 32)), jnp.float32)
    params = enc_ref.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 2000)), 16
    )["params"]

    def run(enc, f):
        return enc.apply(
            {"params": params}, f, method=Wav2Vec2Encoder.encode_features
        )

    ref = run(enc_ref, feats)

    mesh = _seq_mesh(4)
    shard = NamedSharding(mesh, P(None, "seq", None))
    got = jax.jit(lambda f: run(enc_sp, f))(jax.device_put(feats, shard))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), atol=5e-5, rtol=1e-4
    )


def test_sp_pipeline_dpmpp_matches_unsharded():
    """Sequence-parallel sampling composes with the DPM-Solver++(2M)
    fast sampler: the solver tables ride the scan as per-step scalars,
    orthogonal to the frame sharding."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.models.said import SAID, SAIDPipeline, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config

    cfg = Wav2Vec2Config(
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
    rng = np.random.default_rng(0)
    t_a = 34134  # 128 frames -> divisible by 4 shards
    wave = process_audio(rng.standard_normal((1, t_a)).astype(np.float32))

    outs = {}
    for impl, mesh in (("dense", None), ("flash_sp", _seq_mesh(4))):
        model = SAID(
            audio_config=cfg, self_attn_impl=impl,
            encoder_attn_impl=impl if impl == "flash_sp" else "dense",
        )
        params = init_said_params(model, seed=0)
        outs[impl] = SAIDPipeline(model, params).inference(
            waveform_processed=wave,
            num_inference_steps=4,
            guidance_scale=2.0,
            solver="dpmpp_2m",
            rng=jax.random.PRNGKey(0),
            seq_mesh=mesh,
        ).result

    np.testing.assert_allclose(
        outs["flash_sp"], outs["dense"], atol=1e-4, rtol=1e-3
    )


def test_sp_rejects_indivisible_frames():
    from said_tpu.cli._common import init_said_params
    from said_tpu.models.said import SAID, SAIDPipeline, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config

    cfg = Wav2Vec2Config(
        conv_dim=(32,), conv_stride=(5,), conv_kernel=(10,),
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=128, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, output_hidden_size=64,
    )
    model = SAID(audio_config=cfg, self_attn_impl="flash_sp")
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)
    wave = process_audio(np.zeros((1, 27200), np.float32))  # 102 frames
    with pytest.raises(ValueError, match="must divide the frame count"):
        pipeline.inference(
            waveform_processed=wave,
            num_inference_steps=2,
            rng=jax.random.PRNGKey(0),
            seq_mesh=_seq_mesh(4),
        )
