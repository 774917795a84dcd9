"""Golden tests for the diffusion schedule and DDIM stepping.

The numpy reference implementations here follow the published DDIM /
improved-DDPM equations with the exact option set the reference model
constructs (squaredcos_cap_v2 betas, leading spacing, clip_sample,
set_alpha_to_one) — see said_tpu/diffusion/schedule.py docstring.
"""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from said_tpu.diffusion import (
    DiffusionSchedule,
    betas_squaredcos_cap_v2,
    ddim_step,
    inference_timesteps,
    rescale_noise_cfg,
)


def _np_alpha_bar(t):
    return math.cos((t + 0.008) / 1.008 * math.pi / 2) ** 2


def test_betas_cosine_golden():
    T = 1000
    betas = betas_squaredcos_cap_v2(T)
    # endpoint values computed independently
    for i in [0, 1, 499, 998, 999]:
        expect = min(1 - _np_alpha_bar((i + 1) / T) / _np_alpha_bar(i / T), 0.999)
        assert abs(float(betas[i]) - expect) < 1e-7, i
    assert betas.shape == (T,)
    assert (betas > 0).all() and (betas <= 0.999).all()


def test_alphas_cumprod_monotone():
    s = DiffusionSchedule.create(1000)
    a = np.asarray(s.alphas_cumprod)
    assert np.all(np.diff(a) < 0)
    assert 0 < a[-1] < a[0] < 1


@pytest.mark.parametrize("n", [1000, 100, 50, 3])
def test_inference_timesteps_leading(n):
    ts = inference_timesteps(1000, n)
    ratio = 1000 // n
    expect = (np.arange(n) * ratio).round()[::-1].astype(np.int64)
    np.testing.assert_array_equal(ts, expect)
    assert ts[0] == (n - 1) * ratio


def test_add_noise_and_velocity():
    s = DiffusionSchedule.create(1000)
    rng = np.random.default_rng(0)
    x0 = rng.standard_normal((2, 5, 32)).astype(np.float32)
    eps = rng.standard_normal((2, 5, 32)).astype(np.float32)
    t = np.array([10, 700])
    a = np.asarray(s.alphas_cumprod)[t][:, None, None]
    noisy = np.asarray(s.add_noise(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t)))
    np.testing.assert_allclose(
        noisy, np.sqrt(a) * x0 + np.sqrt(1 - a) * eps, rtol=1e-5, atol=1e-6
    )
    vel = np.asarray(s.get_velocity(jnp.asarray(x0), jnp.asarray(eps), jnp.asarray(t)))
    np.testing.assert_allclose(
        vel, np.sqrt(a) * eps - np.sqrt(1 - a) * x0, rtol=1e-5, atol=1e-6
    )
    # Round trip: pred_original_sample(add_noise(x0)) == x0
    x0_rec = np.asarray(
        s.pred_original_sample(jnp.asarray(noisy), jnp.asarray(eps), jnp.asarray(t))
    )
    np.testing.assert_allclose(x0_rec, x0, rtol=1e-4, atol=1e-5)


def _np_ddim_step(acp, model_output, t, sample, num_inference_steps, prediction_type,
                  eta=0.0, noise=None, clip_sample=True, num_train=1000):
    prev_t = t - num_train // num_inference_steps
    a_t = acp[t]
    a_prev = acp[prev_t] if prev_t >= 0 else 1.0
    b_t = 1 - a_t
    if prediction_type == "epsilon":
        x0 = (sample - b_t**0.5 * model_output) / a_t**0.5
        eps = model_output
    elif prediction_type == "sample":
        x0 = model_output
        eps = (sample - a_t**0.5 * x0) / b_t**0.5
    else:
        x0 = a_t**0.5 * sample - b_t**0.5 * model_output
        eps = a_t**0.5 * model_output + b_t**0.5 * sample
    if clip_sample:
        x0 = np.clip(x0, -1, 1)
    var = (1 - a_prev) / (1 - a_t) * (1 - a_t / a_prev)
    std = eta * var**0.5
    prev = a_prev**0.5 * x0 + (1 - a_prev - std**2) ** 0.5 * eps
    if eta > 0:
        prev = prev + std * noise
    return prev


@pytest.mark.parametrize("prediction_type", ["epsilon", "sample", "v_prediction"])
@pytest.mark.parametrize("eta", [0.0, 0.5])
def test_ddim_step_matches_numpy(prediction_type, eta):
    s = DiffusionSchedule.create(1000, prediction_type=prediction_type)
    acp = np.asarray(s.alphas_cumprod, dtype=np.float64)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 32)).astype(np.float32)
    out = rng.standard_normal((2, 7, 32)).astype(np.float32)
    noise = rng.standard_normal((2, 7, 32)).astype(np.float32)
    n_inf = 50
    for t in [999, 519, 19]:
        got = np.asarray(
            ddim_step(s, jnp.asarray(out), jnp.asarray(t), jnp.asarray(x), n_inf,
                      eta=eta, noise=jnp.asarray(noise))
        )
        want = _np_ddim_step(acp, out.astype(np.float64), t, x.astype(np.float64),
                             n_inf, prediction_type, eta, noise.astype(np.float64))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_final_step_alpha_to_one():
    """prev_t < 0 on the last step → alpha_prev = 1 (set_alpha_to_one)."""
    s = DiffusionSchedule.create(1000)
    x = jnp.ones((1, 4, 32))
    eps = jnp.zeros((1, 4, 32))
    # t=0, 1000 steps → prev_t = -1 → x_{prev} = clip(x0, ±1)
    got = np.asarray(ddim_step(s, eps, jnp.asarray(0), x, 1000))
    a0 = float(s.alphas_cumprod[0])
    np.testing.assert_allclose(got, np.clip(1.0 / a0**0.5, -1, 1), rtol=1e-5)


def test_rescale_noise_cfg_unbiased_std():
    rng = np.random.default_rng(2)
    cfg = rng.standard_normal((2, 6, 4)).astype(np.float32)
    text = rng.standard_normal((2, 6, 4)).astype(np.float32)
    gr = 0.7
    got = np.asarray(rescale_noise_cfg(jnp.asarray(cfg), jnp.asarray(text), gr))
    std_t = text.reshape(2, -1).std(axis=1, ddof=1)[:, None, None]
    std_c = cfg.reshape(2, -1).std(axis=1, ddof=1)[:, None, None]
    want = gr * (cfg * std_t / std_c) + (1 - gr) * cfg
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
