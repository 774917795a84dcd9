"""Checkpoint interop: orbax round trip and torch export/import inverse."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.core.checkpoint import (
    export_unet1d_to_torch,
    latest_checkpoint,
    restore_train_state,
    save_train_state,
)
from said_tpu.models.unet1d import UNet1DConditionModel
from said_tpu.utils.torch_import import convert_unet1d


def test_torch_export_import_round_trip():
    """export_unet1d_to_torch must be the exact inverse of convert_unet1d."""
    model = UNet1DConditionModel()
    rng = jax.random.PRNGKey(0)
    params = model.init(
        {"params": rng},
        jnp.zeros((1, 8, 32)),
        jnp.zeros((1,), jnp.int32),
        jnp.zeros((1, 8, 768)),
    )["params"]
    params = jax.tree_util.tree_map(np.asarray, params)

    sd = export_unet1d_to_torch(params, prefix="denoiser.model.")
    back = convert_unet1d(sd, prefix="denoiser.model.")

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {tuple(str(k) for k in p): v for p, v in jax.tree_util.tree_flatten_with_path(back)[0]}
    assert len(flat_a) == len(flat_b)
    for path, leaf in flat_a:
        key = tuple(str(k) for k in path)
        np.testing.assert_array_equal(leaf, flat_b[key], err_msg=str(key))


def test_orbax_train_state_round_trip(tmp_path):
    from said_tpu.train.vae_train import VAETrainConfig, create_train_state
    from said_tpu.models.vae import BCVAE

    model = BCVAE()
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 120, 32)),
        use_noise=False,
    )
    state = create_train_state(
        VAETrainConfig(), variables["params"], variables.get("batch_stats", {})
    )
    state = state.replace(step=jnp.asarray(7, jnp.int32))

    path = save_train_state(str(tmp_path / "ckpt"), state, 7)
    assert latest_checkpoint(str(tmp_path / "ckpt")) == path

    target = create_train_state(
        VAETrainConfig(), variables["params"], variables.get("batch_stats", {})
    )
    restored = restore_train_state(path, target)
    assert int(restored.step) == 7
    a = jax.tree_util.tree_leaves(state.params)
    b = jax.tree_util.tree_leaves(restored.params)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_legacy_full_tree_checkpoint_migrates_on_resume(tmp_path):
    """Pre-r4 checkpoints carried opt_state/ema_params over the FULL
    param tree (frozen encoder included). restore_train_state_any_layout
    must load them into the current trainable-subset layout: trainable
    leaves carried over bit-exactly, redundant frozen subtrees dropped,
    and the migrated state must run a train step."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.models.said import SAID, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.train.said_train import (
        TrainConfig,
        TrainState,
        create_train_state,
        make_optimizer,
        make_train_step,
        restore_train_state_any_layout,
        trainable_subset,
    )

    cfg = Wav2Vec2Config.tiny()
    model = SAID(audio_config=cfg)
    config = TrainConfig()
    params = init_said_params(model, seed=0)

    # the PRE-r4 layout, exactly as the old create_train_state built it:
    # optimizer state over the full tree (optax.masked placeholders for
    # the frozen encoder), EMA = a copy of the full tree
    legacy = TrainState(
        step=jnp.asarray(11, jnp.int32),
        params=params,
        opt_state=make_optimizer(config).init(params),
        ema_params=jax.tree_util.tree_map(jnp.asarray, params),
    )
    path = save_train_state(str(tmp_path / "legacy"), legacy, 11)

    fresh = create_train_state(config, init_said_params(model, seed=3))
    restored = restore_train_state_any_layout(path, fresh, config)

    assert int(restored.step) == 11
    assert "audio_encoder" not in restored.ema_params
    assert set(restored.ema_params) == set(trainable_subset(params))
    # identical tree structure to the current layout
    assert jax.tree_util.tree_structure(
        restored.opt_state
    ) == jax.tree_util.tree_structure(fresh.opt_state)
    # every trainable leaf (params, EMA, optimizer) carried bit-exactly
    for got, want in (
        (restored.params, params),
        (restored.ema_params, trainable_subset(params)),
    ):
        for (pa, a), (pb, b) in zip(
            jax.tree_util.tree_flatten_with_path(got)[0],
            jax.tree_util.tree_flatten_with_path(want)[0],
        ):
            assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a CURRENT-layout checkpoint still restores unchanged through the
    # same entry point
    current = create_train_state(config, params).replace(
        step=jnp.asarray(4, jnp.int32)
    )
    path2 = save_train_state(str(tmp_path / "current"), current, 4)
    again = restore_train_state_any_layout(path2, fresh, config)
    assert int(again.step) == 4

    # ... and a garbage checkpoint raises the clear two-layout error
    with pytest.raises(Exception, match="neither|Error|error"):
        restore_train_state_any_layout(str(tmp_path / "nope"), fresh, config)

    # the migrated state trains
    schedule = DiffusionSchedule.create(model.diffusion_steps)
    step_fn = jax.jit(make_train_step(model, schedule, config))
    rng = np.random.default_rng(0)
    batch = {
        "waveform": jnp.asarray(
            process_audio(rng.standard_normal((1, (16000 * 8) // 60)).astype(np.float32))
        ),
        "coeffs": jnp.asarray(rng.uniform(0, 1, (1, 8, 32)).astype(np.float32)),
        "cond": jnp.ones((1,), bool),
    }
    restored = jax.tree_util.tree_map(jnp.asarray, restored)
    new_state, metrics = step_fn(restored, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert int(new_state.step) == 12


def test_said_export_import_round_trip():
    """Full SAID export → import must reproduce every parameter."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.core.checkpoint import export_said_to_torch
    from said_tpu.models.said import SAID
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.utils.torch_import import convert_said

    cfg = Wav2Vec2Config(
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
    model = SAID(audio_config=cfg)
    params = jax.tree_util.tree_map(np.asarray, init_said_params(model, seed=0))

    sd = export_said_to_torch(params)
    back = convert_said(sd)

    flat_a = jax.tree_util.tree_flatten_with_path(params)[0]
    flat_b = {
        tuple(str(k) for k in p): v
        for p, v in jax.tree_util.tree_flatten_with_path(back)[0]
    }
    assert len(flat_a) == len(flat_b), (len(flat_a), len(flat_b))
    for path, leaf in flat_a:
        key = tuple(str(k) for k in path)
        np.testing.assert_allclose(
            leaf, flat_b[key], atol=1e-6, rtol=1e-6, err_msg=str(key)
        )
