"""Fused GEGLU feed-forward kernel vs its jnp twin and the reference
formulation (Dense -> split -> h*gelu_exact(gate) -> Dense)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.pallas_ffn import _geglu_ffn_jnp, geglu_ffn_pallas


def _params(c=192, mult=4, seed=0):
    rng = np.random.default_rng(seed)
    inner = c * mult
    x = jnp.asarray(rng.standard_normal((2, 96, c)), jnp.float32)
    w1 = jnp.asarray(rng.standard_normal((c, inner * 2)) * 0.05, jnp.float32)
    b1 = jnp.asarray(rng.standard_normal(inner * 2) * 0.1, jnp.float32)
    w2 = jnp.asarray(rng.standard_normal((inner, c)) * 0.05, jnp.float32)
    b2 = jnp.asarray(rng.standard_normal(c) * 0.1, jnp.float32)
    return x, w1, b1, w2, b2


def test_ffn_kernel_matches_jnp_twin():
    x, w1, b1, w2, b2 = _params()
    ref = _geglu_ffn_jnp(x, w1, b1, w2, b2)
    got = geglu_ffn_pallas(x, w1, b1, w2, b2, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_ffn_twin_matches_reference_formulation():
    x, w1, b1, w2, b2 = _params()
    h = x @ w1 + b1
    a, g = jnp.split(h, 2, axis=-1)
    ref = (a * jax.nn.gelu(g, approximate=False)) @ w2 + b2
    got = _geglu_ffn_jnp(x, w1, b1, w2, b2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4)


def test_ffn_grads_match_twin(monkeypatch):
    monkeypatch.setenv("SAID_FFN_INTERPRET", "1")
    from said_tpu.ops.pallas_ffn import geglu_ffn

    x, w1, b1, w2, b2 = _params(seed=1)

    g1 = jax.grad(lambda *a: (geglu_ffn(*a) ** 2).sum(), argnums=(0, 1, 2, 3, 4))(
        x, w1, b1, w2, b2
    )
    g2 = jax.grad(
        lambda *a: (_geglu_ffn_jnp(*a) ** 2).sum(), argnums=(0, 1, 2, 3, 4)
    )(x, w1, b1, w2, b2)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)
