"""Sharded training on the 8-device virtual CPU mesh."""

import numpy as np
import pytest

import jax

from said_tpu.parallel.mesh import MeshConfig, make_mesh, param_sharding_rules, shard_params
from jax.sharding import PartitionSpec as P


def test_virtual_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_mesh_shapes():
    mesh = make_mesh(MeshConfig(data=-1, model=2))
    assert mesh.shape == {"data": 4, "model": 2, "seq": 1}
    mesh = make_mesh(MeshConfig())
    assert mesh.shape == {"data": 8, "model": 1, "seq": 1}
    mesh = make_mesh(MeshConfig(data=-1, model=2, seq=2))
    assert mesh.shape == {"data": 2, "model": 2, "seq": 2}


def test_tp_rules():
    assert param_sharding_rules("denoiser/input_attn/block_0/attn1/to_q/kernel") == P(None, "model")
    assert param_sharding_rules("denoiser/input_attn/block_0/attn1/to_out/kernel") == P("model", None)
    assert param_sharding_rules("audio_encoder/layer_3/ff_inter/kernel") == P(None, "model")
    assert param_sharding_rules("audio_encoder/layer_3/ff_out/kernel") == P("model", None)
    assert param_sharding_rules("denoiser/input_conv/kernel") == P()
    assert param_sharding_rules("null_cond_emb") == P()


def test_dryrun_multichip_8():
    """The driver's multi-chip gate: full train step on an 8-device mesh."""
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


def test_union_slice_math():
    """Pure host-slice math used for multi-host batch feeding."""
    from said_tpu.parallel.mesh import _union_slice

    # contiguous per-device blocks (what a process owns under P('data'))
    assert _union_slice([slice(2, 4), slice(0, 2), slice(4, 6)], 8) == slice(0, 6)
    # replicated: every device holds the full axis
    assert _union_slice([slice(0, 8)] * 4, 8) == slice(0, 8)
    # open-ended slices normalize against the dim size
    assert _union_slice([slice(None, None)], 8) == slice(0, 8)
    # duplicated spans: devices along 'model'/'seq' hold the same rows
    assert _union_slice(
        [slice(0, 2), slice(0, 2), slice(2, 4), slice(2, 4)], 8
    ) == slice(0, 4)
    with pytest.raises(ValueError):
        _union_slice([slice(0, 2), slice(4, 6)], 8)  # gap → not one block


def test_host_local_slice_and_put_global():
    """Single-process: put_global must equal device_put; the slice is full."""
    from said_tpu.parallel.mesh import batch_sharding, host_local_slice, put_global

    mesh = make_mesh(MeshConfig())
    shard = batch_sharding(mesh)
    x = np.arange(8 * 3, dtype=np.float32).reshape(8, 3)
    # one process owns all devices → local block is the whole batch
    assert host_local_slice(x.shape, shard) == slice(0, 8)
    out = put_global(x, shard)
    np.testing.assert_array_equal(np.asarray(out), x)
    assert out.sharding == shard


def test_host_local_slice_two_process_map():
    """Simulate the 2-host device→indices map and check each host's rows."""
    from said_tpu.parallel.mesh import _union_slice

    # 8-way data sharding of a 16-row batch over 2 hosts × 4 devices:
    # host 0 owns devices 0-3 → rows 0:8, host 1 owns 4-7 → rows 8:16.
    per_dev = [slice(2 * d, 2 * d + 2) for d in range(8)]
    assert _union_slice(per_dev[:4], 16) == slice(0, 8)
    assert _union_slice(per_dev[4:], 16) == slice(8, 16)


def test_dp_equals_single_device_loss():
    """The sharded loss must match an unsharded run bit-for-bit-ish."""
    import jax.numpy as jnp

    from said_tpu.cli._common import init_said_params
    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.models.said import SAID, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config
    from said_tpu.parallel.mesh import batch_sharding
    from said_tpu.train.said_train import TrainConfig, said_loss

    audio_config = Wav2Vec2Config(
        conv_dim=(16, 16),
        conv_stride=(5, 2),
        conv_kernel=(10, 3),
        hidden_size=32,
        num_hidden_layers=1,
        num_attention_heads=2,
        intermediate_size=64,
        num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        output_hidden_size=32,
    )
    model = SAID(audio_config=audio_config)
    schedule = DiffusionSchedule.create(1000)
    config = TrainConfig()
    params = init_said_params(model, seed=0)

    rng = np.random.default_rng(0)
    b, window = 8, 16
    wave = process_audio(rng.standard_normal((b, (16000 * window) // 60)).astype(np.float32))
    coeffs = rng.uniform(0, 1, (b, window, 32)).astype(np.float32)
    cond = np.ones((b,), dtype=bool)

    key = jax.random.PRNGKey(0)

    def loss_of(w, c, cd, p):
        loss, _ = said_loss(
            model, schedule, p, key, jnp.asarray(w), jnp.asarray(c), jnp.asarray(cd),
            None, None, config, train=False,
        )
        return loss

    loss_plain = float(jax.jit(loss_of)(wave, coeffs, cond, params))

    mesh = make_mesh(MeshConfig())
    shard = batch_sharding(mesh)
    params_sharded = shard_params(params, mesh)
    loss_sharded = float(
        jax.jit(loss_of)(
            jax.device_put(wave, shard),
            jax.device_put(coeffs, shard),
            jax.device_put(cond, shard),
            params_sharded,
        )
    )
    assert abs(loss_plain - loss_sharded) < 1e-5 * max(1.0, abs(loss_plain))
