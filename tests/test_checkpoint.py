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
