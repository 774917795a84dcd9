"""Sampling fast path (cached K/V + timestep table) must be exact."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.models.unet1d import (
    UNet1DConditionModel,
    build_kv_caches,
    time_embed_table,
)


def test_cached_denoise_matches_plain():
    model = UNet1DConditionModel()
    rng = jax.random.PRNGKey(0)
    b, t, s = 2, 30, 30
    sample = jax.random.normal(rng, (b, t, 32))
    timesteps = jnp.array([17, 801])
    context = jax.random.normal(jax.random.PRNGKey(1), (b, s, 768))
    params = model.init({"params": rng}, sample, timesteps, context)["params"]

    plain = model.apply({"params": params}, sample, timesteps, context)

    caches = build_kv_caches(params, context, t, num_heads=6)
    table = time_embed_table(params, np.arange(1000))
    fast = model.apply(
        {"params": params},
        sample,
        timesteps,
        None,
        kv_caches=caches,
        emb=table[timesteps],
    )
    np.testing.assert_allclose(np.asarray(fast), np.asarray(plain), atol=2e-5, rtol=1e-4)


def test_time_embed_table_matches_mlp():
    model = UNet1DConditionModel()
    rng = jax.random.PRNGKey(0)
    sample = jnp.zeros((1, 8, 32))
    context = jnp.zeros((1, 8, 768))
    params = model.init({"params": rng}, sample, jnp.array([0]), context)["params"]
    table = time_embed_table(params, np.arange(0, 1000, 97))
    assert table.shape == (11, 768)
    assert np.isfinite(np.asarray(table)).all()
