"""Convert PyTorch ``state_dict`` checkpoints into flax parameter pytrees.

Bridges the reference's checkpoint formats to this framework:

- SAiD diffusion checkpoints (``{epoch}.pth`` from the reference's
  train.py / released SAiD.pth): audio encoder (HF Wav2Vec2),
  1-D UNet denoiser, null-conditioning embedding.
- The evaluation VAE (``model/vae.pth``), including BatchNorm running
  statistics.
- Bare HF ``Wav2Vec2Model`` state dicts (e.g. facebook/wav2vec2-base-960h).

Layout conventions converted here, once, at the boundary:

- torch Linear weight (O, I)            → flax Dense kernel (I, O)
- torch Conv1d weight (O, I, W)         → flax Conv kernel (W, I, O)
- torch ConvTranspose1d weight (I, O, W)→ flipped-W conv kernel (W, I, O)
  (stride-1 transposed conv == full-padding correlation with flipped kernel)
- weight-normed conv (pos-embedding)    → effective weight g·v/|v|

(torch's channel-major Flatten/Unflatten in the BCVAE is reproduced by
transposes inside the flax model, so Linear weights import unpermuted.)

All functions take/return numpy; ``load_state_dict`` uses torch only to
deserialize the pickle.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


Array = np.ndarray
StateDict = Dict[str, Array]


def load_state_dict(path: str) -> StateDict:
    """Load a checkpoint into a {name: numpy array} dict.

    Accepts a torch ``.pth``/``.bin`` pickle, a ``.safetensors`` file, or
    an HF model directory (e.g. a local facebook/wav2vec2-base-960h
    snapshot) containing either serialization.
    """
    import os

    if os.path.isdir(path):
        for candidate in ("model.safetensors", "pytorch_model.bin"):
            p = os.path.join(path, candidate)
            if os.path.exists(p):
                return load_state_dict(p)
        raise FileNotFoundError(f"no model weights found under {path}")

    if path.endswith(".safetensors"):
        from safetensors.numpy import load_file

        return dict(load_file(path))

    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def _dense(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _dense_nobias(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].T)}


def _conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    out = {"kernel": np.ascontiguousarray(sd[f"{prefix}.weight"].transpose(2, 1, 0))}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _conv_transpose_as_conv(sd: StateDict, prefix: str) -> Dict[str, Array]:
    w = sd[f"{prefix}.weight"]  # (I, O, W)
    kernel = np.ascontiguousarray(np.flip(w, axis=2).transpose(2, 0, 1))  # (W, I, O)
    out = {"kernel": kernel}
    if f"{prefix}.bias" in sd:
        out["bias"] = sd[f"{prefix}.bias"]
    return out


def _norm(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn_params(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"scale": sd[f"{prefix}.weight"], "bias": sd[f"{prefix}.bias"]}


def _bn_stats(sd: StateDict, prefix: str) -> Dict[str, Array]:
    return {"mean": sd[f"{prefix}.running_mean"], "var": sd[f"{prefix}.running_var"]}


# --------------------------------------------------------------------- UNet1D


def _res_block(sd: StateDict, p: str) -> Dict:
    out = {
        "in_norm": _norm(sd, f"{p}.in_layers.0"),
        "in_conv": _conv(sd, f"{p}.in_layers.2"),
        "emb_proj": _dense(sd, f"{p}.emb_layers.1"),
        "out_norm": _norm(sd, f"{p}.out_layers.0"),
        "out_conv": _conv(sd, f"{p}.out_layers.3"),
    }
    if f"{p}.skip_connection.weight" in sd:
        out["skip"] = _conv(sd, f"{p}.skip_connection")
    return out


def _cross_attention(sd: StateDict, p: str) -> Dict:
    return {
        "to_q": _dense_nobias(sd, f"{p}.to_q"),
        "to_k": _dense_nobias(sd, f"{p}.to_k"),
        "to_v": _dense_nobias(sd, f"{p}.to_v"),
        "to_out": _dense(sd, f"{p}.to_out.0"),
    }


def _spatial_transformer(sd: StateDict, p: str, depth: int = 1) -> Dict:
    out = {
        "norm": _norm(sd, f"{p}.norm"),
        "proj_out": _conv(sd, f"{p}.proj_out"),
    }
    for d in range(depth):
        bp = f"{p}.transformer_blocks.{d}"
        out[f"block_{d}"] = {
            "attn1": _cross_attention(sd, f"{bp}.attn1"),
            "attn2": _cross_attention(sd, f"{bp}.attn2"),
            "norm1": _norm(sd, f"{bp}.norm1"),
            "norm2": _norm(sd, f"{bp}.norm2"),
            "norm3": _norm(sd, f"{bp}.norm3"),
            "ff": {
                "proj": _dense(sd, f"{bp}.ff.net.0.proj"),
                "out": _dense(sd, f"{bp}.ff.net.2"),
            },
        }
    return out


def convert_unet1d(sd: StateDict, prefix: str = "denoiser.model.") -> Dict:
    """Reference UNetModel state dict → UNet1DConditionModel flax params."""
    s = {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}
    return {
        "time_embed_0": _dense(s, "time_embed.0"),
        "time_embed_2": _dense(s, "time_embed.2"),
        "input_conv": _conv(s, "input_blocks.0.0"),
        "input_res": _res_block(s, "input_blocks.1.0"),
        "input_attn": _spatial_transformer(s, "input_blocks.1.1"),
        "middle_res1": _res_block(s, "middle_block.0"),
        "middle_attn": _spatial_transformer(s, "middle_block.1"),
        "middle_res2": _res_block(s, "middle_block.2"),
        "output_res0": _res_block(s, "output_blocks.0.0"),
        "output_attn0": _spatial_transformer(s, "output_blocks.0.1"),
        "output_res1": _res_block(s, "output_blocks.1.0"),
        "output_attn1": _spatial_transformer(s, "output_blocks.1.1"),
        "out_norm": _norm(s, "out.0"),
        "out_conv": _conv(s, "out.2"),
    }


# ------------------------------------------------------------------ Wav2Vec2


def _pos_conv_effective_weight(sd: StateDict, p: str) -> Array:
    """Resolve the weight-normed positional conv to its effective weight.

    Handles both the legacy (weight_g/weight_v) and the parametrize-based
    (parametrizations.weight.original0/1) torch serializations.
    """
    if f"{p}.weight_g" in sd:
        g, v = sd[f"{p}.weight_g"], sd[f"{p}.weight_v"]
    elif f"{p}.parametrizations.weight.original0" in sd:
        g = sd[f"{p}.parametrizations.weight.original0"]
        v = sd[f"{p}.parametrizations.weight.original1"]
    else:
        return sd[f"{p}.weight"]
    # weight_norm(dim=2): per-W-position norm over (O, I) dims
    norm = np.sqrt((v.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True))
    return (g * (v / norm)).astype(v.dtype)


def convert_wav2vec2(sd: StateDict, prefix: str = "") -> Dict:
    """HF Wav2Vec2Model state dict → Wav2Vec2Encoder flax params."""
    if prefix:
        sd = {k[len(prefix) :]: v for k, v in sd.items() if k.startswith(prefix)}

    fe: Dict = {}
    i = 0
    while f"feature_extractor.conv_layers.{i}.conv.weight" in sd:
        layer: Dict = {
            "conv": _conv(sd, f"feature_extractor.conv_layers.{i}.conv")
        }
        ln = f"feature_extractor.conv_layers.{i}.layer_norm"
        if f"{ln}.weight" in sd:
            if i == 0:
                layer["norm_scale"] = sd[f"{ln}.weight"]
                layer["norm_bias"] = sd[f"{ln}.bias"]
            else:
                layer["norm"] = _norm(sd, ln)
        fe[f"conv_{i}"] = layer
        i += 1

    pos_w = _pos_conv_effective_weight(sd, "encoder.pos_conv_embed.conv")
    # (O, I/groups, W) → (W, I/groups, O)
    pos_kernel = np.ascontiguousarray(pos_w.transpose(2, 1, 0))

    params: Dict = {
        "feature_extractor": fe,
        "fp_layer_norm": _norm(sd, "feature_projection.layer_norm"),
        "fp_projection": _dense(sd, "feature_projection.projection"),
        "pos_conv": {
            "conv": {
                "kernel": pos_kernel,
                "bias": sd["encoder.pos_conv_embed.conv.bias"],
            }
        },
        "encoder_layer_norm": _norm(sd, "encoder.layer_norm"),
    }
    if "masked_spec_embed" in sd:
        params["masked_spec_embed"] = sd["masked_spec_embed"]

    li = 0
    while f"encoder.layers.{li}.attention.q_proj.weight" in sd:
        lp = f"encoder.layers.{li}"
        params[f"layer_{li}"] = {
            "q_proj": _dense(sd, f"{lp}.attention.q_proj"),
            "k_proj": _dense(sd, f"{lp}.attention.k_proj"),
            "v_proj": _dense(sd, f"{lp}.attention.v_proj"),
            "out_proj": _dense(sd, f"{lp}.attention.out_proj"),
            "layer_norm": _norm(sd, f"{lp}.layer_norm"),
            "ff_inter": _dense(sd, f"{lp}.feed_forward.intermediate_dense"),
            "ff_out": _dense(sd, f"{lp}.feed_forward.output_dense"),
            "final_layer_norm": _norm(sd, f"{lp}.final_layer_norm"),
        }
        li += 1
    return params


# --------------------------------------------------------------------- BCVAE


def _encoder_conv_out_len(seq_len: int) -> int:
    l = seq_len - 2  # k3
    l = l - 2  # k3
    l = (l - 4) // 2 + 1  # k4 s2
    l = l - 2  # k3
    return l


def convert_bcvae(sd: StateDict, seq_len: int = 120) -> Tuple[Dict, Dict]:
    """Reference BCVAE state dict → (params, batch_stats) flax trees."""
    del seq_len  # layout handled in the model; kept for API stability
    # The flax encoder transposes back to (B, C, T) before flattening
    # (said_tpu/models/vae.py), reproducing torch's channel-major flatten,
    # so fc0's weight needs no column permutation.
    enc_params = {
        "conv0": _conv(sd, "encoder.conv_layers.0"),
        "bn0": _bn_params(sd, "encoder.conv_layers.1"),
        "conv1": _conv(sd, "encoder.conv_layers.3"),
        "bn1": _bn_params(sd, "encoder.conv_layers.4"),
        "conv2": _conv(sd, "encoder.conv_layers.6"),
        "bn2": _bn_params(sd, "encoder.conv_layers.7"),
        "conv3": _conv(sd, "encoder.conv_layers.9"),
        "fc0": _dense(sd, "encoder.fc_layers.0"),
        "fc_bn0": _bn_params(sd, "encoder.fc_layers.1"),
        "fc1": _dense(sd, "encoder.fc_layers.3"),
        "fc_bn1": _bn_params(sd, "encoder.fc_layers.4"),
        "fc2": _dense(sd, "encoder.fc_layers.6"),
        "fc_mu": _dense(sd, "encoder.fc_mu"),
        "fc_logvar": _dense(sd, "encoder.fc_logvar"),
    }
    enc_stats = {
        "bn0": _bn_stats(sd, "encoder.conv_layers.1"),
        "bn1": _bn_stats(sd, "encoder.conv_layers.4"),
        "bn2": _bn_stats(sd, "encoder.conv_layers.7"),
        "fc_bn0": _bn_stats(sd, "encoder.fc_layers.1"),
        "fc_bn1": _bn_stats(sd, "encoder.fc_layers.4"),
    }

    dec_params = {
        "fc0": _dense(sd, "decoder.fc_layers.0"),
        "fc_bn0": _bn_params(sd, "decoder.fc_layers.1"),
        "fc1": _dense(sd, "decoder.fc_layers.3"),
        "deconv0": _conv_transpose_as_conv(sd, "decoder.conv_layers.0"),
        "bn0": _bn_params(sd, "decoder.conv_layers.1"),
        "deconv1": _conv_transpose_as_conv(sd, "decoder.conv_layers.3"),
        "bn1": _bn_params(sd, "decoder.conv_layers.4"),
        "conv0": _conv(sd, "decoder.conv_layers.6"),
        "conv1": _conv(sd, "decoder.conv_layers.7"),
    }
    dec_stats = {
        "fc_bn0": _bn_stats(sd, "decoder.fc_layers.1"),
        "bn0": _bn_stats(sd, "decoder.conv_layers.1"),
        "bn1": _bn_stats(sd, "decoder.conv_layers.4"),
    }

    params = {"encoder": enc_params, "decoder": dec_params}
    batch_stats = {"encoder": enc_stats, "decoder": dec_stats}
    return params, batch_stats


# ---------------------------------------------------------------------- SAID


def convert_said(sd: StateDict) -> Dict:
    """Full reference SAiD checkpoint → SAID flax params.

    The reference stores: ``audio_encoder.*`` (HF wav2vec2),
    ``denoiser.model.*`` (UNet), ``null_cond_emb``, and optionally
    ``audio_proj_layer.*`` (``said/model/diffusion.py:106-116``).
    """
    params: Dict = {
        "audio_encoder": convert_wav2vec2(sd, prefix="audio_encoder."),
        "denoiser": convert_unet1d(sd, prefix="denoiser.model."),
        "null_cond_emb": sd["null_cond_emb"],
    }
    if "audio_proj_layer.weight" in sd:
        params["audio_proj_layer"] = _dense(sd, "audio_proj_layer")
    return params
