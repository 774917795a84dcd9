"""Learning-dynamics evidence: the trainers LEARN, not just run.

Every structural property of the losses/optimizer is pinned elsewhere
(test_train_losses, test_parity_losses); nothing there would catch a
sign error that still produces finite, reference-matching single-step
values but never improves the model. Here a tiny model overfits ONE
repeated batch on CPU through the real jitted train step (grad → clip
→ AdamW → EMA → NaN-guard) and the evaluation loss must drop below a
pinned threshold — for the raw params AND the EMA overlay.

Reference analog: ``script/train.py`` demonstrably trains; this is the
equivalent evidence for this framework, at test scale.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.cli._common import init_said_params
from said_tpu.diffusion.schedule import DiffusionSchedule
from said_tpu.models.said import SAID, process_audio
from said_tpu.models.vae import BCVAE
from said_tpu.models.wav2vec2 import Wav2Vec2Config
from said_tpu.train import said_train, vae_train

# the SAME config object bench.py's train_loss_drop_overfit300 uses —
# these thresholds pin the dynamics that metric reports
TINY = Wav2Vec2Config.tiny()


def test_said_trainer_overfits_one_batch():
    """300 steps on one batch: eval loss (fixed noise/timestep draws)
    must fall well below its init value — measured 1.91 → 0.83 raw /
    0.72 EMA at these seeds; thresholds leave margin for backend/version
    drift while staying far below any no-learning outcome."""
    model = SAID(audio_config=TINY)
    params = init_said_params(model, seed=0)
    schedule = DiffusionSchedule.create(1000)

    rng = np.random.default_rng(0)
    b, window = 2, 16
    wave = jnp.asarray(
        process_audio(
            rng.standard_normal((b, (16000 * window) // 60)).astype(np.float32)
        )
    )
    coeffs = jnp.asarray(rng.uniform(0, 1, (b, window, 32)).astype(np.float32))
    cond = jnp.asarray(np.array([True, True]))
    batch = {"waveform": wave, "coeffs": coeffs, "cond": cond}

    # lr 1e-3 (vs the production 1e-5): overfit-at-test-scale needs a
    # few hundred steps, not the reference's tens of thousands
    config = said_train.TrainConfig(learning_rate=1e-3, encoder_train_mode=False)
    state = said_train.create_train_state(config, params)
    step_fn = jax.jit(
        said_train.make_train_step(model, schedule, config), donate_argnums=(0,)
    )

    def eval_loss(p):
        total = 0.0
        for k in range(4):  # fixed eval draws of (timesteps, noise)
            loss, _ = said_train.said_loss(
                model, schedule, p, jax.random.PRNGKey(1000 + k),
                wave, coeffs, cond, None, None, config, train=False,
            )
            total += float(loss)
        return total / 4

    initial = eval_loss(params)
    assert np.isfinite(initial) and initial > 1.0  # ≈E|N(0,1)|-scale at init

    key = jax.random.PRNGKey(42)
    for _ in range(300):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, batch, sub)
    assert float(metrics["nan_skipped"]) == 0.0
    assert int(state.step) == 300

    final = eval_loss(state.params)
    final_ema = eval_loss(
        said_train.merge_trainable(state.params, state.ema_params)
    )
    assert final < 0.65 * initial and final < 1.3, (initial, final)
    assert final_ema < 0.65 * initial and final_ema < 1.3, (initial, final_ema)


def test_vae_trainer_overfits_one_batch():
    """Same evidence for the BCVAE ELBO trainer (reconstruction must
    improve; KL held near-off via a tiny beta, as the cyclical schedule
    does at cycle starts)."""
    model = BCVAE()
    rng0 = jax.random.PRNGKey(0)
    variables = model.init(
        {"params": rng0}, jnp.zeros((1, 120, 32), jnp.float32), use_noise=False
    )
    params = dict(variables["params"])
    batch_stats = dict(variables.get("batch_stats", {}))

    rng = np.random.default_rng(5)
    coeffs = jnp.asarray(rng.uniform(0, 1, (4, 120, 32)).astype(np.float32))
    beta = jnp.asarray(1e-4, jnp.float32)

    config = vae_train.VAETrainConfig(learning_rate=1e-3)
    state = vae_train.create_train_state(config, params, batch_stats)
    step_fn = jax.jit(vae_train.make_train_step(model, config))

    eval_fn = jax.jit(vae_train.make_eval_step(model, config))
    initial = float(
        eval_fn(state.params, state.batch_stats, coeffs, None, beta,
                jax.random.PRNGKey(99))["loss"]
    )

    key = jax.random.PRNGKey(7)
    for _ in range(200):
        key, sub = jax.random.split(key)
        state, metrics = step_fn(state, coeffs, None, beta, sub)
    assert np.isfinite(float(metrics["loss"]))

    final = float(
        eval_fn(state.params, state.batch_stats, coeffs, None, beta,
                jax.random.PRNGKey(99))["loss"]
    )
    final_ema = float(
        eval_fn(state.ema_params, state.batch_stats, coeffs, None, beta,
                jax.random.PRNGKey(99))["loss"]
    )
    assert final < 0.5 * initial, (initial, final)
    assert final_ema < 0.7 * initial, (initial, final_ema)
