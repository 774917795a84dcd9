"""Training-loss semantics: vertex loss, std reweighting, spec augment,
prediction types, frozen-encoder optimizer mask."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from said_tpu.cli._common import init_said_params
from said_tpu.diffusion.schedule import DiffusionSchedule
from said_tpu.models.said import SAID, process_audio
from said_tpu.models.wav2vec2 import Wav2Vec2Config, compute_time_mask_indices
from said_tpu.train.said_train import TrainConfig, make_optimizer, said_loss

TINY = Wav2Vec2Config(
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


@pytest.fixture(scope="module")
def setup():
    model = SAID(audio_config=TINY)
    params = init_said_params(model, seed=0)
    schedule = DiffusionSchedule.create(1000)
    rng = np.random.default_rng(0)
    b, window = 2, 16
    wave = jnp.asarray(
        process_audio(rng.standard_normal((b, (16000 * window) // 60)).astype(np.float32))
    )
    coeffs = jnp.asarray(rng.uniform(0, 1, (b, window, 32)).astype(np.float32))
    cond = jnp.asarray(np.array([True, False]))
    return model, params, schedule, wave, coeffs, cond


def _loss(setup_t, config=TrainConfig(), **kw):
    model, params, schedule, wave, coeffs, cond = setup_t
    return said_loss(
        model, schedule, params, jax.random.PRNGKey(0),
        wave, coeffs, cond,
        kw.pop("std", None), kw.pop("blendshape_delta", None),
        config, train=kw.pop("train", False), **kw,
    )


def test_vertex_loss_included(setup):
    rng = np.random.default_rng(1)
    delta = jnp.asarray(rng.standard_normal((2, 32, 50, 3)).astype(np.float32))
    loss_with, metrics = _loss(setup, blendshape_delta=delta)
    assert "loss_vertex" in metrics
    loss_without, metrics2 = _loss(setup)
    cfg = TrainConfig()
    expected = float(metrics2["loss"]) + cfg.weight_vertex * float(metrics["loss_vertex"])
    # pred/velocity parts identical (same rng) → totals differ by the
    # weighted vertex term
    np.testing.assert_allclose(float(loss_with), expected, rtol=1e-5)


def test_std_reweighting_changes_loss(setup):
    std = jnp.asarray(np.linspace(0.5, 2.0, 32).astype(np.float32))
    _, m_plain = _loss(setup)
    _, m_std = _loss(setup, std=std)
    assert abs(float(m_plain["loss"]) - float(m_std["loss"])) > 1e-6


@pytest.mark.parametrize("pt", ["epsilon", "sample", "v_prediction"])
def test_prediction_types_finite(setup, pt):
    loss, _ = _loss(setup, config=TrainConfig(prediction_type=pt))
    assert np.isfinite(float(loss))


def test_spec_augment_changes_embedding_path(setup):
    model, params, schedule, wave, coeffs, cond = setup
    # Fresh params have zero-initialized output convs (guided-diffusion
    # convention) — both the UNet's final conv AND every transformer's
    # proj_out — so at init the prediction is blind to the conditioning.
    # Perturb them so the loss can see the embedding.
    params = jax.tree_util.tree_map(jnp.array, params)
    den = params["denoiser"]
    keys = jax.random.split(jax.random.PRNGKey(3), 5)
    den["out_conv"]["kernel"] = (
        jax.random.normal(keys[0], den["out_conv"]["kernel"].shape) * 0.05
    )
    for i, name in enumerate(
        ["input_attn", "middle_attn", "output_attn0", "output_attn1"]
    ):
        k = den[name]["proj_out"]["kernel"]
        den[name]["proj_out"]["kernel"] = (
            jax.random.normal(keys[i + 1], k.shape, k.dtype) * 0.05
        )
    perturbed = (model, params, schedule, wave, coeffs, cond)

    mask = compute_time_mask_indices((2, 16), mask_prob=0.5, mask_length=4,
                                     rng=np.random.default_rng(0))
    assert mask.any()
    _, m_plain = _loss(perturbed)
    _, m_masked = _loss(perturbed, mask_time_indices=jnp.asarray(mask))
    assert abs(float(m_plain["loss"]) - float(m_masked["loss"])) > 1e-8


def test_audio_encoder_frozen_by_optimizer_mask(setup):
    model, params, schedule, wave, coeffs, cond = setup
    config = TrainConfig()
    tx = make_optimizer(config)
    opt_state = tx.init(params)

    def loss_fn(p):
        l, _ = said_loss(model, schedule, p, jax.random.PRNGKey(0), wave, coeffs,
                         cond, None, None, config, train=False)
        return l

    grads = jax.grad(loss_fn)(params)
    updates, _ = tx.update(grads, opt_state, params)
    new_params = optax.apply_updates(params, updates)

    enc_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["audio_encoder"], new_params["audio_encoder"],
    )
    assert max(jax.tree_util.tree_leaves(enc_diff)) == 0.0
    den_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["denoiser"], new_params["denoiser"],
    )
    assert max(jax.tree_util.tree_leaves(den_diff)) > 0.0


def test_padded_loss_blind_to_pad_contents(setup):
    """With window_real/input_length set, the PAD region must be invisible:
    filling it with garbage instead of zeros changes nothing. (The noise
    draw is shape-dependent, so exact equality with an unpadded run isn't
    defined; the guarantee is pad-content independence + masked stats.)"""
    model, params, schedule, wave, coeffs, cond = setup
    b, ws, c = coeffs.shape
    wave_real = wave.shape[1]

    pad_f, target = 7, coeffs.shape[1] + 7
    wave_target = int(np.ceil(target * 16000 / 60))
    coeffs_p = jnp.pad(coeffs, ((0, 0), (0, pad_f), (0, 0)))
    wave_p = jnp.pad(wave, ((0, 0), (0, wave_target - wave_real)))

    rngk = jax.random.PRNGKey(9)
    coeffs_g = coeffs_p.at[:, ws:].set(
        jax.random.normal(rngk, (b, pad_f, c)) * 5.0
    )
    wave_g = wave_p.at[:, wave_real:].set(
        jax.random.normal(rngk, (b, wave_target - wave_real)) * 5.0
    )

    kw = dict(window_real=jnp.asarray(ws), input_length=jnp.asarray(wave_real))
    _, m_zero = _loss((model, params, schedule, wave_p, coeffs_p, cond), **kw)
    _, m_garb = _loss((model, params, schedule, wave_g, coeffs_g, cond), **kw)
    for k in ("loss", "loss_predict", "loss_velocity"):
        np.testing.assert_allclose(
            float(m_garb[k]), float(m_zero[k]), rtol=1e-5, atol=1e-6, err_msg=k
        )
    assert np.isfinite(float(m_zero["loss"]))


def test_encoder_backward_elided_by_stop_gradient(setup):
    """The frozen encoder must contribute ZERO gradients at the autodiff
    level (stop_gradient before the trainable proj layer) — the optimizer
    mask alone would still make XLA compute the whole encoder backward
    (~40% of the measured train step on TPU)."""
    model, params, schedule, wave, coeffs, cond = setup
    config = TrainConfig()

    def loss_fn(p):
        l, _ = said_loss(model, schedule, p, jax.random.PRNGKey(0), wave,
                         coeffs, cond, None, None, config, train=True)
        return l

    grads = jax.grad(loss_fn)(params)
    enc_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["audio_encoder"])
    )
    assert enc_norm == 0.0
    # trainable parts still receive gradients (null_cond_emb's grad is
    # zero at fresh init — the zero-initialized output convs make the
    # prediction conditioning-blind — so check the denoiser)
    den_norm = sum(
        float(jnp.abs(g).sum())
        for g in jax.tree_util.tree_leaves(grads["denoiser"])
    )
    assert den_norm > 0.0


def test_train_state_tracks_only_trainable_in_opt_and_ema(setup):
    """Optimizer state and EMA cover only the trainable subset: EMA of a
    frozen param is identically the param (ema0 = p; d·p + (1−d)·p = p),
    so dropping the encoder from both is bit-equivalent to the
    reference's EMA-over-all-parameters (script/train.py:578) while
    skipping ~1.1 GB/step of HBM traffic on the 94M frozen weights."""
    from said_tpu.train.said_train import (
        create_train_state,
        make_train_step,
        merge_trainable,
        trainable_subset,
    )

    model, params, schedule, wave, coeffs, cond = setup
    config = TrainConfig(encoder_train_mode=False)
    state = create_train_state(config, params)
    assert "audio_encoder" not in state.ema_params
    assert set(state.ema_params) == set(trainable_subset(params))

    step_fn = jax.jit(make_train_step(model, schedule, config))
    batch = {"waveform": wave, "coeffs": coeffs, "cond": cond}
    new_state, metrics = step_fn(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert float(metrics["nan_skipped"]) == 0.0

    # frozen encoder bit-unchanged; trainable params moved
    enc_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["audio_encoder"], new_state.params["audio_encoder"],
    )
    assert max(jax.tree_util.tree_leaves(enc_diff)) == 0.0
    den_diff = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        params["denoiser"], new_state.params["denoiser"],
    )
    assert max(jax.tree_util.tree_leaves(den_diff)) > 0.0

    # one-step EMA identity on a trainable leaf: warmed decay at step 0
    # is min(0.9999, 1/10) = 0.1 → ema1 = 0.1·p0 + 0.9·p1
    leaf0 = params["denoiser"]["input_conv"]["kernel"]
    leaf1 = new_state.params["denoiser"]["input_conv"]["kernel"]
    np.testing.assert_allclose(
        np.asarray(new_state.ema_params["denoiser"]["input_conv"]["kernel"]),
        0.1 * np.asarray(leaf0) + 0.9 * np.asarray(leaf1),
        rtol=1e-6, atol=1e-7,
    )

    # the merged overlay restores the full tree (validation / export path)
    full_ema = merge_trainable(new_state.params, new_state.ema_params)
    assert set(full_ema) == set(params)
    enc_same = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        full_ema["audio_encoder"], params["audio_encoder"],
    )
    assert max(jax.tree_util.tree_leaves(enc_same)) == 0.0
    # ema disabled → merge is the identity
    assert merge_trainable(params, None) is params


def test_train_step_supports_state_donation(setup):
    """The train CLIs jit the step with donate_argnums=(0,) (one dispatch
    per step → in-place state update). Guard the contract that makes
    that safe: the step must consume the state exactly once and never
    need the old buffers after returning — two donated steps must run
    and match the undonated step bit-for-bit."""
    from said_tpu.train.said_train import create_train_state, make_train_step

    model, params, schedule, wave, coeffs, cond = setup
    config = TrainConfig()
    batch = {"waveform": wave, "coeffs": coeffs, "cond": cond}

    plain = jax.jit(make_train_step(model, schedule, config))
    donating = jax.jit(
        make_train_step(model, schedule, config), donate_argnums=(0,)
    )

    s_ref = create_train_state(config, params)
    s_ref, m_ref = plain(s_ref, batch, jax.random.PRNGKey(3))
    s_ref, m_ref = plain(s_ref, batch, jax.random.PRNGKey(4))

    # deep-copy the params: the donating step invalidates its input
    # buffers, and the module-scoped fixture's arrays must survive for
    # the other tests
    params_copy = jax.tree_util.tree_map(jnp.array, params)
    s_don = create_train_state(config, params_copy)
    s_don, _ = donating(s_don, batch, jax.random.PRNGKey(3))
    s_don, m_don = donating(s_don, batch, jax.random.PRNGKey(4))

    np.testing.assert_array_equal(
        np.asarray(m_ref["loss"]), np.asarray(m_don["loss"])
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s_ref.params),
        jax.tree_util.tree_leaves(s_don.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
