"""Fused strided conv+GELU kernel vs its jnp twin and the nn.Conv
reference formulation (the wav2vec2 feature-extractor layers,
``said/model/wav2vec2.py`` via HF Wav2Vec2FeatureEncoder: k∈{2,3},
stride 2, VALID, no bias, exact-erf GELU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from said_tpu.ops.pallas_conv import (
    _strided_conv_gelu_jnp,
    strided_conv_gelu,
    strided_conv_gelu_pallas,
)


def _conv_gelu_ref(x, kernel):
    y = jax.lax.conv_general_dilated(
        x, kernel, (2,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
    )
    return jax.nn.gelu(y, approximate=False)


def _data(b, t, c_in, c_out, k, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((b, t, c_in)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, c_in, c_out)) * 0.05, jnp.float32)
    return x, w


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("t", [257, 258, 259, 260])
def test_twin_matches_conv_reference(k, t):
    x, w = _data(2, t, 64, 96, k)
    ref = _conv_gelu_ref(x, w)
    got = _strided_conv_gelu_jnp(x, w)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


@pytest.mark.parametrize("k", [2, 3])
@pytest.mark.parametrize("t", [515, 516])
def test_kernel_matches_twin_multiblock(k, t):
    """block_t=16 forces many grid steps, exercising the K=3 carry that
    hands each block's first output the previous block's last samples."""
    x, w = _data(4, t, 128, 128, k, seed=1)
    ref = _strided_conv_gelu_jnp(x, w)
    got = strided_conv_gelu_pallas(x, w, block_t=16, interpret=True)
    assert got.shape == ref.shape
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_kernel_single_block_short_input():
    x, w = _data(1, 37, 128, 128, 3, seed=2)
    ref = _strided_conv_gelu_jnp(x, w)
    got = strided_conv_gelu_pallas(x, w, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_routed_entry_interpret(monkeypatch):
    monkeypatch.setenv("SAID_CONV_INTERPRET", "1")
    x, w = _data(2, 300, 128, 128, 3, seed=3)
    got = strided_conv_gelu(x, w)
    ref = _conv_gelu_ref(x, w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-5)


def test_grads_match_twin(monkeypatch):
    monkeypatch.setenv("SAID_CONV_INTERPRET", "1")
    x, w = _data(1, 64, 128, 128, 3, seed=4)
    g1 = jax.grad(lambda *a: (strided_conv_gelu(*a) ** 2).sum(), argnums=(0, 1))(x, w)
    g2 = jax.grad(
        lambda *a: (_strided_conv_gelu_jnp(*a) ** 2).sum(), argnums=(0, 1)
    )(x, w)
    for a, b in zip(g1, g2):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4, rtol=1e-4)


def test_feature_extractor_uses_fused_path_and_matches():
    """The wav2vec2 FeatureExtractor routes conv_1.. through the fused
    path with an UNCHANGED param pytree; outputs match a pure-nn.Conv
    build of the same stack."""
    from said_tpu.models.wav2vec2 import FeatureExtractor, Wav2Vec2Config

    cfg = Wav2Vec2Config(
        conv_dim=(128, 128, 128),
        conv_stride=(5, 2, 2),
        conv_kernel=(10, 3, 2),
    )
    fe = FeatureExtractor(cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 4000)), jnp.float32)
    params = fe.init(jax.random.PRNGKey(0), x)["params"]
    # param tree identical to the nn.Conv layout
    assert set(params["conv_1"]) == {"conv"}
    assert params["conv_1"]["conv"]["kernel"].shape == (3, 128, 128)
    assert params["conv_2"]["conv"]["kernel"].shape == (2, 128, 128)

    got, _ = fe.apply({"params": params}, x)

    def ref_stack(x, params, cfg):
        h = x[:, :, None]
        for i, (k, s) in enumerate(zip(cfg.conv_kernel, cfg.conv_stride)):
            w = params[f"conv_{i}"]["conv"]["kernel"]
            h = jax.lax.conv_general_dilated(
                h, w, (s,), "VALID", dimension_numbers=("NWC", "WIO", "NWC")
            )
            if i == 0:
                from said_tpu.ops.norms import group_norm

                h = group_norm(
                    h,
                    h.shape[-1],
                    params["conv_0"]["norm_scale"],
                    params["conv_0"]["norm_bias"],
                    cfg.layer_norm_eps,
                )
            h = jax.nn.gelu(h, approximate=False)
        return h

    ref = ref_stack(x, params, cfg)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5, rtol=1e-4)
