"""Parity: JAX Wav2Vec2 encoder vs HF torch Wav2Vec2 (reference's
``ModifiedWav2Vec2Model`` wrapper with frame-count interpolation).

Uses a small random-initialized config so the test is fast; the
architecture code paths (group-norm conv layer, SamePad positional
conv with weight-norm, post-norm encoder) are identical to base size.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax.numpy as jnp

from said_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
from said_tpu.ops.resample import linear_interp_time
from said_tpu.utils.torch_import import convert_wav2vec2

SMALL = dict(
    conv_dim=(16, 16),
    conv_stride=(5, 2),
    conv_kernel=(10, 3),
    conv_bias=False,
    hidden_size=24,
    num_hidden_layers=2,
    num_attention_heads=2,
    intermediate_size=48,
    num_conv_pos_embeddings=16,
    num_conv_pos_embedding_groups=4,
)


def _hf_config():
    return transformers.Wav2Vec2Config(
        **SMALL,
        feat_extract_norm="group",
        do_stable_layer_norm=False,
        feat_extract_activation="gelu",
        hidden_act="gelu",
        apply_spec_augment=False,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )


@pytest.fixture(scope="module")
def torch_model(reference_on_path):
    from said.model.wav2vec2 import ModifiedWav2Vec2Model

    torch.manual_seed(0)
    m = ModifiedWav2Vec2Model(_hf_config())
    m.eval()
    return m


@pytest.fixture(scope="module")
def jax_setup(torch_model):
    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    params = convert_wav2vec2(sd)
    cfg = Wav2Vec2Config(
        conv_dim=SMALL["conv_dim"],
        conv_stride=SMALL["conv_stride"],
        conv_kernel=SMALL["conv_kernel"],
        conv_bias=SMALL["conv_bias"],
        hidden_size=SMALL["hidden_size"],
        num_hidden_layers=SMALL["num_hidden_layers"],
        num_attention_heads=SMALL["num_attention_heads"],
        intermediate_size=SMALL["intermediate_size"],
        num_conv_pos_embeddings=SMALL["num_conv_pos_embeddings"],
        num_conv_pos_embedding_groups=SMALL["num_conv_pos_embedding_groups"],
        output_hidden_size=SMALL["hidden_size"],
    )
    return Wav2Vec2Encoder(cfg), params


@pytest.mark.parametrize("num_frames", [None, 60, 97])
def test_wav2vec2_parity(torch_model, jax_setup, num_frames):
    model, params = jax_setup
    rng = np.random.default_rng(3)
    wav = rng.standard_normal((2, 3200)).astype(np.float32)

    with torch.no_grad():
        t_out = torch_model(
            torch.from_numpy(wav), num_frames=num_frames
        ).last_hidden_state.numpy()

    j_out = model.apply({"params": params}, jnp.asarray(wav), num_frames)
    assert j_out.shape == t_out.shape
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=3e-5, rtol=1e-3)


def test_interp_matches_torch_align_corners():
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 49, 8)).astype(np.float32)
    for out_len in [60, 97, 13, 49]:
        want = (
            torch.nn.functional.interpolate(
                torch.from_numpy(x.transpose(0, 2, 1)),
                size=out_len,
                mode="linear",
                align_corners=True,
            )
            .numpy()
            .transpose(0, 2, 1)
        )
        got = np.asarray(linear_interp_time(jnp.asarray(x), out_len))
        # torch computes the source coordinate in float32; tiny frac
        # rounding differences are expected.
        np.testing.assert_allclose(got, want, atol=3e-5, rtol=1e-4)


def test_wav2vec2_base_size_parity(reference_on_path):
    """Full base architecture (7 convs, 768 hidden, 12 layers) on a short
    waveform — exercises the real group counts and the 128-wide SamePad
    positional conv that the small config can't."""
    from said.model.wav2vec2 import ModifiedWav2Vec2Model

    torch.manual_seed(1)
    hf_cfg = transformers.Wav2Vec2Config(
        apply_spec_augment=False,
        hidden_dropout=0.0,
        activation_dropout=0.0,
        attention_dropout=0.0,
        feat_proj_dropout=0.0,
        layerdrop=0.0,
    )
    tm = ModifiedWav2Vec2Model(hf_cfg)
    tm.eval()
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    params = convert_wav2vec2(sd)
    model = Wav2Vec2Encoder(Wav2Vec2Config())

    rng = np.random.default_rng(9)
    wav = rng.standard_normal((1, 8000)).astype(np.float32)
    num_frames = 30  # 0.5 s at 60 fps
    with torch.no_grad():
        t_out = tm(torch.from_numpy(wav), num_frames=num_frames).last_hidden_state.numpy()
    j_out = model.apply({"params": params}, jnp.asarray(wav), num_frames)
    assert j_out.shape == t_out.shape == (1, 30, 768)
    np.testing.assert_allclose(np.asarray(j_out), t_out, atol=2e-4, rtol=1e-3)


def test_feature_length_formula(jax_setup):
    model, _ = jax_setup
    cfg = model.config
    for t in [3200, 16000, 12345]:
        length = t
        for k, s in zip(cfg.conv_kernel, cfg.conv_stride):
            length = (length - k) // s + 1
        assert cfg.feature_extract_output_length(t) == length
