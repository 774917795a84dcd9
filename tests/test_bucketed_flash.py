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
