"""Bucketed/mixed-length batches through the REAL flash kernel.

``SAID_FLASH_INTERPRET=1`` forces the packed Pallas kernel (interpret
mode) on CPU, so this drives the production flash path — runtime
per-row lengths, skipped padded blocks — end to end through the UNet
and asserts the real frames of a padded mixed-length batch match each
row's own unpadded run (the same guarantee the dense-masked path has,
now on the path that actually serves long bucketed clips on TPU).
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.models.unet1d import UNet1DConditionModel


@pytest.fixture()
def force_flash_interpret(monkeypatch):
    monkeypatch.setenv("SAID_FLASH_INTERPRET", "1")


def test_mixed_length_bucketed_unet_matches_unpadded(force_flash_interpret):
    unet = UNet1DConditionModel(
        cross_attention_dim=32, dropout=0.0, self_attn_impl="flash"
    )
    t_pad = 160
    lengths = np.array([160, 130, 97], np.int32)
    b = len(lengths)
    rng = np.random.default_rng(0)
    x = rng.standard_normal((b, t_pad, 32)).astype(np.float32)
    ctx = rng.standard_normal((b, t_pad, 32)).astype(np.float32)
    for i, n in enumerate(lengths):
        x[i, n:] = 0.0
        ctx[i, n:] = 0.0
    t = jnp.asarray(np.array([500] * b, np.int32))

    params = unet.init(
        {"params": jax.random.PRNGKey(0)}, jnp.asarray(x), t, jnp.asarray(ctx)
    )["params"]

    padded = unet.apply(
        {"params": params}, jnp.asarray(x), t, jnp.asarray(ctx),
        seq_len_real=jnp.asarray(lengths),
    )

    for i, n in enumerate(lengths):
        exact = unet.apply(
            {"params": params},
            jnp.asarray(x[i : i + 1, :n]),
            t[i : i + 1],
            jnp.asarray(ctx[i : i + 1, :n]),
        )
        np.testing.assert_allclose(
            np.asarray(padded)[i, :n], np.asarray(exact)[0],
            atol=2e-4, rtol=1e-3,
        )
    assert np.all(np.isfinite(np.asarray(padded)))


def test_flash_grad_matches_dense(force_flash_interpret):
    """The custom VJP: forward through the packed kernel, backward via
    dense recompute — gradients must equal the all-dense path."""
    from said_tpu.ops.pallas_attention import _dense_flat, flash_attention_flat

    b, h, d, t = 2, 2, 32, 192
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    v = jnp.asarray(rng.standard_normal((b, t, h * d)), jnp.float32)
    lengths = jnp.asarray(np.array([192, 130], np.int32))

    def loss_flash(q, k, v):
        out = flash_attention_flat(q, k, v, h, lengths)
        # only real frames contribute (padded rows are unspecified)
        m = (np.arange(t)[None, :, None] < np.asarray(lengths)[:, None, None])
        return (out * m).sum()

    def loss_dense(q, k, v):
        out = _dense_flat(q, k, v, h, lengths)
        m = (np.arange(t)[None, :, None] < np.asarray(lengths)[:, None, None])
        return (out * m).sum()

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_dense = jax.grad(loss_dense, argnums=(0, 1, 2))(q, k, v)
    for a, b_ in zip(g_flash, g_dense):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b_), atol=2e-4, rtol=1e-3)
