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


@pytest.mark.parametrize("bucketed", [False, True])
def test_cfg_fold_matches_unfolded(bucketed):
    """CFG shared-prefix fold: un-duplicated latent in, 2B predictions out,
    identical (per-row math only) to running the duplicated batch."""
    model = UNet1DConditionModel()
    rng = jax.random.PRNGKey(0)
    b, t, s = 2, 32, 32
    sample = jax.random.normal(jax.random.PRNGKey(1), (b, t, 32))
    timesteps = jnp.array([500, 37])
    context2 = jax.random.normal(jax.random.PRNGKey(2), (2 * b, s, 768))
    params = model.init(
        {"params": rng}, jnp.zeros((2 * b, t, 32)), jnp.zeros((2 * b,), jnp.int32), context2
    )["params"]

    slr = jnp.asarray(25, jnp.int32) if bucketed else None
    caches = build_kv_caches(params, context2, t, num_heads=6, seq_len_real=slr)
    table = time_embed_table(params, np.arange(1000))

    t2 = jnp.concatenate([timesteps, timesteps])
    unfolded = model.apply(
        {"params": params},
        jnp.concatenate([sample, sample], axis=0),
        t2,
        None,
        kv_caches=caches,
        emb=table[t2],
        seq_len_real=slr,
    )
    folded = model.apply(
        {"params": params},
        sample,
        timesteps,
        None,
        kv_caches=caches,
        emb=table[timesteps],
        seq_len_real=slr,
        cfg_fold=True,
    )
    assert folded.shape == unfolded.shape
    np.testing.assert_allclose(
        np.asarray(folded), np.asarray(unfolded), atol=1e-6, rtol=1e-6
    )


def test_cfg_fold_rejects_per_row_lengths():
    model = UNet1DConditionModel()
    b, t = 2, 16
    sample = jnp.zeros((b, t, 32))
    context2 = jnp.zeros((2 * b, t, 768))
    params = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((2 * b, t, 32)),
        jnp.zeros((2 * b,), jnp.int32),
        context2,
    )["params"]
    caches = build_kv_caches(params, context2, t, num_heads=6)
    table = time_embed_table(params, np.arange(1000))
    with pytest.raises(ValueError, match="scalar"):
        model.apply(
            {"params": params},
            sample,
            jnp.zeros((b,), jnp.int32),
            None,
            kv_caches=caches,
            emb=table[jnp.zeros((b,), jnp.int32)],
            seq_len_real=jnp.array([10, 12, 10, 12], jnp.int32),
            cfg_fold=True,
        )
