"""DPM-Solver++(2M) sampler — a beyond-reference capability.

The reference samples with DDIM only (``said/model/diffusion.py:100-104``,
step at 441-443). DPM-Solver++(2M) (Lu et al. 2022, arXiv:2211.01095) is
a second-order multistep ODE solver over the same schedule: comparable
sample quality at ~20x fewer denoiser calls. These tests pin the
implementation against an independent numpy re-derivation of the paper's
update, its exact-boundary behavior, and the full pipeline path.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.diffusion.sampler import SamplerConfig, sample
from said_tpu.diffusion.schedule import DiffusionSchedule, inference_timesteps


def _toy_denoiser(w):
    """A smooth deterministic 'model': eps = tanh(x) * w + sin(t/1000)."""

    def fn(x, t, context):
        del context
        return jnp.tanh(x) * w + jnp.sin(t.astype(x.dtype) / 1000.0)[:, None, None]

    return fn


def _numpy_dpmpp_2m(schedule, eps_fn, x, num_steps):
    """Independent DPM-Solver++(2M) loop, straight from the paper:
    data-prediction multistep with lambda = log(alpha/sigma)."""
    acp = np.asarray(schedule.alphas_cumprod, np.float64)
    T = schedule.num_train_timesteps
    ts = inference_timesteps(T, num_steps)
    step = T // num_steps

    def lam_of(a):
        alpha, sigma = np.sqrt(a), np.sqrt(1.0 - a)
        return alpha, sigma, np.log(alpha) - np.log(sigma) if sigma > 0 else np.inf

    prev_x0 = None
    prev_lam = None
    for i, t in enumerate(ts):
        a_cur = acp[t]
        tp = t - step
        a_prev = acp[tp] if tp >= 0 else float(schedule.final_alpha_cumprod)
        alpha_c, sigma_c, lam_c = lam_of(a_cur)
        alpha_p, sigma_p, lam_p = lam_of(a_prev)

        eps = eps_fn(x, np.int64(t))
        x0 = (x - np.sqrt(1.0 - a_cur) * eps) / np.sqrt(a_cur)
        x0 = np.clip(x0, -1.0, 1.0)  # schedule.clip_sample

        h = lam_p - lam_c
        if prev_x0 is None or not np.isfinite(h):
            # first step / sigma_p == 0 boundary: first-order (exact there)
            if np.isfinite(h):
                x = (sigma_p / sigma_c) * x - alpha_p * np.expm1(-h) * x0
            else:
                x = x0.copy()
        else:
            h0 = lam_c - prev_lam
            r0 = h0 / h
            d1 = (x0 - prev_x0) / r0
            x = (
                (sigma_p / sigma_c) * x
                - alpha_p * np.expm1(-h) * (x0 + 0.5 * d1)
            )
        prev_x0, prev_lam = x0, lam_c
    return np.clip(x, 0.0, 1.0)


def _run_sampler(schedule, denoise_fn, latents, num_steps, solver):
    result, _ = sample(
        schedule,
        denoise_fn,
        jax.random.PRNGKey(0),
        jnp.asarray(latents),
        audio_embedding=jnp.zeros((latents.shape[0], 4, 8), jnp.float32),
        uncond_embedding=None,
        config=SamplerConfig(
            num_inference_steps=num_steps,
            guidance_scale=1.0,  # CFG off
            solver=solver,
        ),
    )
    return np.asarray(result)


def test_dpmpp_matches_numpy_oracle():
    schedule = DiffusionSchedule.create(1000)
    rng = np.random.default_rng(0)
    x_init = rng.standard_normal((2, 12, 4)).astype(np.float32)
    w = rng.uniform(0.5, 1.5, (4,)).astype(np.float32)

    def eps_np(x, t):
        return np.tanh(x) * w + np.sin(np.float64(t) / 1000.0)

    got = _run_sampler(
        schedule, _toy_denoiser(jnp.asarray(w)), x_init, 20, "dpmpp_2m"
    )
    ref = _numpy_dpmpp_2m(schedule, eps_np, x_init.astype(np.float64), 20)
    np.testing.assert_allclose(got, ref, atol=5e-5, rtol=1e-4)


def test_dpmpp_exact_on_delta_data():
    """With the ideal eps-predictor for a point-mass data distribution,
    the solver must land exactly on that point (the final
    set_alpha_to_one boundary step is x = x0)."""
    schedule = DiffusionSchedule.create(1000)
    acp = schedule.alphas_cumprod
    x_star = jnp.asarray(
        np.random.default_rng(1).uniform(0.1, 0.9, (1, 8, 4)), jnp.float32
    )

    def ideal(x, t, context):
        del context
        a = acp[t][:, None, None].astype(x.dtype)
        return (x - jnp.sqrt(a) * x_star) / jnp.sqrt(1.0 - a)

    x_init = np.asarray(
        jax.random.normal(jax.random.PRNGKey(2), (1, 8, 4)), np.float32
    )
    got = _run_sampler(schedule, ideal, x_init, 8, "dpmpp_2m")
    np.testing.assert_allclose(got, np.asarray(x_star), atol=1e-5)


def test_dpmpp_solver_order_on_analytic_ode():
    """Solver-order check against the EXACT probability-flow solution.

    For Gaussian data N(mu, s^2 I) the ideal eps-predictor is analytic
    and the ODE preserves the standardized coordinate
    z = (x - sqrt(a) mu) / sqrt(a s^2 + 1 - a), so the exact endpoint at
    the set_alpha_to_one boundary (a = 1) is mu + s z. Assertions
    (measured: ddim 0.153/0.0049, dpm 0.016/0.00018 at 10/500 steps):

    - few-step regime (10): 2M error is several times below DDIM's —
      the practical point of the solver;
    - high-step regime (500): 2M converges at second order, an order
      of magnitude past DDIM's first-order tail.
    """
    schedule = DiffusionSchedule.create(1000)
    acp_np = np.asarray(schedule.alphas_cumprod, np.float64)
    acp = schedule.alphas_cumprod
    rng = np.random.default_rng(3)
    mu_np = rng.uniform(0.3, 0.7, (1, 1, 4))
    mu = jnp.asarray(mu_np, jnp.float32)
    s2 = 0.01  # data std 0.1: x0 estimates stay inside the clip range

    def ideal(x, t, context):
        del context
        a = acp[t][:, None, None].astype(x.dtype)
        denom = a * s2 + (1.0 - a)
        x0_hat = mu + (jnp.sqrt(a) * s2 / denom) * (x - jnp.sqrt(a) * mu)
        return (x - jnp.sqrt(a) * x0_hat) / jnp.sqrt(1.0 - a)

    x_init = rng.standard_normal((1, 16, 4))

    def exact(n):
        # the "leading" grid starts each n at its own t0; the exact
        # endpoint depends on it
        t0 = inference_timesteps(1000, n)[0]
        a0 = acp_np[t0]
        z = (x_init - np.sqrt(a0) * mu_np) / np.sqrt(a0 * s2 + 1.0 - a0)
        return np.clip(mu_np + np.sqrt(s2) * z, 0.0, 1.0)

    def err(n, solver):
        got = _run_sampler(
            schedule, ideal, x_init.astype(np.float32), n, solver
        )
        return np.abs(got - exact(n)).max()

    e_ddim_10, e_dpm_10 = err(10, "ddim"), err(10, "dpmpp_2m")
    assert e_dpm_10 < e_ddim_10 / 3, (e_dpm_10, e_ddim_10)

    e_ddim_500, e_dpm_500 = err(500, "ddim"), err(500, "dpmpp_2m")
    assert e_dpm_500 < e_ddim_500 / 10, (e_dpm_500, e_ddim_500)
    assert e_dpm_500 < 1e-3


def test_dpmpp_rejects_eta():
    schedule = DiffusionSchedule.create(1000)
    with pytest.raises(ValueError, match="deterministic"):
        sample(
            schedule,
            lambda x, t, c: x,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 2)),
            audio_embedding=jnp.zeros((1, 2, 4)),
            uncond_embedding=None,
            config=SamplerConfig(
                num_inference_steps=4, guidance_scale=1.0, eta=0.5,
                solver="dpmpp_2m",
            ),
        )


def test_unknown_solver_rejected():
    schedule = DiffusionSchedule.create(1000)
    with pytest.raises(ValueError, match="unknown solver"):
        sample(
            schedule,
            lambda x, t, c: x,
            jax.random.PRNGKey(0),
            jnp.zeros((1, 4, 2)),
            audio_embedding=jnp.zeros((1, 2, 4)),
            uncond_embedding=None,
            config=SamplerConfig(num_inference_steps=4, solver="heun"),
        )


def test_dpmpp_exact_on_delta_data_v_prediction():
    """Same exactness property with a v-prediction model: pins the
    pred_x0 conversion for the non-epsilon branches."""
    schedule = DiffusionSchedule.create(1000, prediction_type="v_prediction")
    acp = schedule.alphas_cumprod
    x_star = jnp.asarray(
        np.random.default_rng(4).uniform(0.1, 0.9, (1, 8, 4)), jnp.float32
    )

    def ideal_v(x, t, context):
        del context
        a = acp[t][:, None, None].astype(x.dtype)
        # eps implied by x0 = x_star at (x, t); v = sqrt(a) eps - sqrt(1-a) x0
        eps = (x - jnp.sqrt(a) * x_star) / jnp.sqrt(1.0 - a)
        return jnp.sqrt(a) * eps - jnp.sqrt(1.0 - a) * x_star

    x_init = np.asarray(
        jax.random.normal(jax.random.PRNGKey(5), (1, 8, 4)), np.float32
    )
    got = _run_sampler(schedule, ideal_v, x_init, 8, "dpmpp_2m")
    np.testing.assert_allclose(got, np.asarray(x_star), atol=1e-5)


def test_dpmpp_pipeline_end_to_end():
    """Full SAIDPipeline with solver='dpmpp_2m' (CFG on): compiles, runs,
    output in [0, 1] with the right frame count."""
    from said_tpu.cli._common import init_said_params
    from said_tpu.models.said import SAID, SAIDPipeline, process_audio
    from said_tpu.models.wav2vec2 import Wav2Vec2Config

    cfg = Wav2Vec2Config(
        conv_dim=(32,), conv_stride=(5,), conv_kernel=(10,),
        hidden_size=64, num_hidden_layers=1, num_attention_heads=2,
        intermediate_size=128, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4, output_hidden_size=64,
    )
    model = SAID(audio_config=cfg)
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)
    wave = process_audio(
        np.random.default_rng(0).standard_normal((1, 16000)).astype(np.float32)
    )
    out = pipeline.inference(
        waveform_processed=wave,
        num_inference_steps=4,
        guidance_scale=2.0,
        solver="dpmpp_2m",
        rng=jax.random.PRNGKey(0),
    ).result
    assert out.shape == (1, 60, 32)
    assert np.all(np.isfinite(out))
    assert out.min() >= 0.0 and out.max() <= 1.0
