"""Sampler semantics: CFG plumbing, masking, strength, intermediates."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.diffusion import DiffusionSchedule, SamplerConfig, sample


@pytest.fixture(scope="module")
def schedule():
    return DiffusionSchedule.create(1000)


def _linear_denoiser(scale=0.9):
    """A fake denoiser: eps_hat = scale * x + mean(context)."""

    def fn(x, t, ctx):
        return scale * x + ctx.mean(axis=(1, 2), keepdims=True)

    return fn


def test_sample_shapes_and_range(schedule):
    b, t, c = 2, 24, 32
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (b, t, c))
    audio = jnp.ones((b, t, 8))
    uncond = jnp.zeros((b, t, 8))
    cfg = SamplerConfig(num_inference_steps=10, guidance_scale=2.0)
    result, interms = sample(
        schedule, _linear_denoiser(), rng, latents, audio, uncond, cfg
    )
    assert result.shape == (b, t, c)
    assert interms is None
    r = np.asarray(result)
    assert (r >= 0).all() and (r <= 1).all()


def test_cfg_doubles_batch(schedule):
    """The denoiser must see 2B rows under CFG, B rows without."""
    seen = []

    def spy(x, t, ctx):
        seen.append(x.shape[0])
        return jnp.zeros_like(x)

    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (3, 8, 32))
    audio = jnp.ones((3, 8, 4))
    uncond = jnp.zeros((3, 8, 4))

    sample(schedule, spy, rng, latents, audio, uncond,
           SamplerConfig(num_inference_steps=2, guidance_scale=2.0))
    assert seen[0] == 6
    seen.clear()
    sample(schedule, spy, rng, latents, audio, None,
           SamplerConfig(num_inference_steps=2, guidance_scale=1.0))
    assert seen[0] == 3


def test_mask_keeps_region(schedule):
    """mask==1 region must equal the init sample at the end (t_next < 0
    on the final step → un-noised init latents are written back)."""
    b, t, c = 1, 12, 32
    rng = jax.random.PRNGKey(1)
    init = jnp.full((b, t, c), 0.25)
    mask = jnp.zeros((b, t, c)).at[:, :6].set(1.0)
    audio = jnp.ones((b, t, 4))
    uncond = jnp.zeros((b, t, 4))
    cfg = SamplerConfig(num_inference_steps=5, guidance_scale=2.0)
    result, _ = sample(
        schedule,
        _linear_denoiser(),
        rng,
        init,  # latents start from encode(init) = init
        audio,
        uncond,
        cfg,
        init_samples=init,
        mask=mask,
    )
    r = np.asarray(result)
    np.testing.assert_allclose(r[:, :6], 0.25, atol=1e-6)


def test_strength_skips_steps(schedule):
    def zero_denoiser(x, t, ctx):
        return jnp.zeros_like(x)

    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (1, 8, 32))
    audio = jnp.ones((1, 8, 4))
    # strength 0.5 of 10 steps → only 5 denoise iterations, starting midway
    _, interms = sample(
        schedule, zero_denoiser, rng, latents, audio, None,
        SamplerConfig(num_inference_steps=10, strength=0.5, guidance_scale=1.0),
        init_samples=latents,
        save_intermediate=True,
    )
    assert interms.shape[0] == 5
    # The chain starts from the inits noised to timesteps[-5] = 400 with
    # the sampler's own rng split — reproduce it and compare.
    _, init_rng = jax.random.split(rng)
    noise = jax.random.normal(init_rng, latents.shape, latents.dtype)
    expected0 = schedule.add_noise(latents, noise, jnp.asarray(400))
    np.testing.assert_allclose(
        np.asarray(interms[0]), np.asarray(expected0), atol=1e-6
    )


def test_save_intermediate(schedule):
    rng = jax.random.PRNGKey(0)
    latents = jax.random.normal(rng, (1, 8, 32))
    audio = jnp.ones((1, 8, 4))
    result, interms = sample(
        schedule, _linear_denoiser(), rng, latents, audio, None,
        SamplerConfig(num_inference_steps=4, guidance_scale=1.0),
        save_intermediate=True,
    )
    assert interms.shape == (4, 1, 8, 32)
    # first intermediate is the initial latents (pre-step), as in the
    # reference which appends before each step
    np.testing.assert_allclose(np.asarray(interms[0]), np.asarray(latents), atol=1e-6)
