"""Checkpointing: orbax for full train state, torch-format interop.

Strictly more capable than the reference's save path (which stores only
a model ``state_dict`` every N epochs and cannot resume —
``script/train.py:648-659``, SURVEY §5.4): here the FULL train state
(params, optimizer, EMA, step) round-trips through orbax, and a
``.pth``-compatible export keeps checkpoints consumable by the
reference's torch loaders (and vice versa via
``said_tpu.utils.torch_import``).
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import numpy as np


def save_train_state(ckpt_dir: str, state: Any, step: Optional[int] = None) -> str:
    """Save a pytree train state with orbax. Returns the checkpoint path."""
    import orbax.checkpoint as ocp

    ckpt_dir = os.path.abspath(ckpt_dir)
    step = int(step if step is not None else np.asarray(state.step))
    path = os.path.join(ckpt_dir, str(step))
    ckptr = ocp.StandardCheckpointer()
    state_host = jax.tree_util.tree_map(np.asarray, state)
    ckptr.save(path, state_host, force=True)
    ckptr.wait_until_finished()
    return path


def restore_train_state(path: str, target: Any) -> Any:
    """Restore a train state saved by ``save_train_state``."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target=target)


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    steps = [d for d in os.listdir(ckpt_dir) if d.isdigit()]
    if not steps:
        return None
    return os.path.join(ckpt_dir, max(steps, key=int))


# ----------------------------------------------------------- torch interop


def _dense_to_torch(p: Dict, name: str, out: Dict):
    out[f"{name}.weight"] = np.ascontiguousarray(np.asarray(p["kernel"]).T)
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _conv_to_torch(p: Dict, name: str, out: Dict):
    out[f"{name}.weight"] = np.ascontiguousarray(
        np.asarray(p["kernel"]).transpose(2, 1, 0)
    )
    if "bias" in p:
        out[f"{name}.bias"] = np.asarray(p["bias"])


def _norm_to_torch(p: Dict, name: str, out: Dict):
    out[f"{name}.weight"] = np.asarray(p["scale"])
    out[f"{name}.bias"] = np.asarray(p["bias"])


def export_unet1d_to_torch(params: Dict, prefix: str = "denoiser.model.") -> Dict:
    """Flax UNet1D params → torch state_dict (numpy values).

    Inverse of ``said_tpu.utils.torch_import.convert_unet1d`` so
    checkpoints trained here load into the reference implementation.
    """
    out: Dict[str, np.ndarray] = {}

    def res(fl: Dict, tp: str):
        _norm_to_torch(fl["in_norm"], f"{tp}.in_layers.0", out)
        _conv_to_torch(fl["in_conv"], f"{tp}.in_layers.2", out)
        _dense_to_torch(fl["emb_proj"], f"{tp}.emb_layers.1", out)
        _norm_to_torch(fl["out_norm"], f"{tp}.out_layers.0", out)
        _conv_to_torch(fl["out_conv"], f"{tp}.out_layers.3", out)
        if "skip" in fl:
            _conv_to_torch(fl["skip"], f"{tp}.skip_connection", out)

    def st(fl: Dict, tp: str):
        _norm_to_torch(fl["norm"], f"{tp}.norm", out)
        _conv_to_torch(fl["proj_out"], f"{tp}.proj_out", out)
        d = 0
        while f"block_{d}" in fl:
            b = fl[f"block_{d}"]
            bp = f"{tp}.transformer_blocks.{d}"
            for attn in ("attn1", "attn2"):
                for proj in ("to_q", "to_k", "to_v"):
                    _dense_to_torch(b[attn][proj], f"{bp}.{attn}.{proj}", out)
                _dense_to_torch(b[attn]["to_out"], f"{bp}.{attn}.to_out.0", out)
            for n in ("norm1", "norm2", "norm3"):
                _norm_to_torch(b[n], f"{bp}.{n}", out)
            _dense_to_torch(b["ff"]["proj"], f"{bp}.ff.net.0.proj", out)
            _dense_to_torch(b["ff"]["out"], f"{bp}.ff.net.2", out)
            d += 1

    p = prefix.rstrip(".")
    _dense_to_torch(params["time_embed_0"], f"{p}.time_embed.0", out)
    _dense_to_torch(params["time_embed_2"], f"{p}.time_embed.2", out)
    _conv_to_torch(params["input_conv"], f"{p}.input_blocks.0.0", out)
    res(params["input_res"], f"{p}.input_blocks.1.0")
    st(params["input_attn"], f"{p}.input_blocks.1.1")
    res(params["middle_res1"], f"{p}.middle_block.0")
    st(params["middle_attn"], f"{p}.middle_block.1")
    res(params["middle_res2"], f"{p}.middle_block.2")
    res(params["output_res0"], f"{p}.output_blocks.0.0")
    st(params["output_attn0"], f"{p}.output_blocks.0.1")
    res(params["output_res1"], f"{p}.output_blocks.1.0")
    st(params["output_attn1"], f"{p}.output_blocks.1.1")
    _norm_to_torch(params["out_norm"], f"{p}.out.0", out)
    _conv_to_torch(params["out_conv"], f"{p}.out.2", out)
    return out


def save_torch_state_dict(state_dict: Dict[str, np.ndarray], path: str) -> None:
    """Serialize a numpy state dict as a torch .pth file."""
    import torch

    torch.save({k: torch.from_numpy(np.asarray(v)) for k, v in state_dict.items()}, path)


def export_wav2vec2_to_torch(params: Dict, prefix: str = "audio_encoder.") -> Dict:
    """Flax Wav2Vec2Encoder params → HF torch state_dict (numpy values).

    Inverse of ``said_tpu.utils.torch_import.convert_wav2vec2``. The
    positional conv's weight norm is re-parameterized (g = per-position
    norm, v = weight), which reproduces the effective weight exactly.
    """
    out: Dict[str, np.ndarray] = {}
    p = prefix

    fe = params["feature_extractor"]
    i = 0
    while f"conv_{i}" in fe:
        layer = fe[f"conv_{i}"]
        _conv_to_torch(layer["conv"], f"{p}feature_extractor.conv_layers.{i}.conv", out)
        if "norm_scale" in layer:
            out[f"{p}feature_extractor.conv_layers.{i}.layer_norm.weight"] = np.asarray(
                layer["norm_scale"]
            )
            out[f"{p}feature_extractor.conv_layers.{i}.layer_norm.bias"] = np.asarray(
                layer["norm_bias"]
            )
        i += 1

    _norm_to_torch(params["fp_layer_norm"], f"{p}feature_projection.layer_norm", out)
    _dense_to_torch(params["fp_projection"], f"{p}feature_projection.projection", out)
    if "masked_spec_embed" in params:
        out[f"{p}masked_spec_embed"] = np.asarray(params["masked_spec_embed"])

    # positional conv: effective (W, I/groups, O) → torch (O, I/groups, W),
    # split into weight-norm (g, v) with v = weight (norm over dims 0,1).
    w = np.asarray(params["pos_conv"]["conv"]["kernel"]).transpose(2, 1, 0)
    g = np.sqrt((w.astype(np.float64) ** 2).sum(axis=(0, 1), keepdims=True)).astype(
        w.dtype
    )
    out[f"{p}encoder.pos_conv_embed.conv.weight_g"] = g
    out[f"{p}encoder.pos_conv_embed.conv.weight_v"] = w
    out[f"{p}encoder.pos_conv_embed.conv.bias"] = np.asarray(
        params["pos_conv"]["conv"]["bias"]
    )
    _norm_to_torch(params["encoder_layer_norm"], f"{p}encoder.layer_norm", out)

    li = 0
    while f"layer_{li}" in params:
        lp = params[f"layer_{li}"]
        tp = f"{p}encoder.layers.{li}"
        for ours, theirs in [
            ("q_proj", "attention.q_proj"), ("k_proj", "attention.k_proj"),
            ("v_proj", "attention.v_proj"), ("out_proj", "attention.out_proj"),
            ("ff_inter", "feed_forward.intermediate_dense"),
            ("ff_out", "feed_forward.output_dense"),
        ]:
            _dense_to_torch(lp[ours], f"{tp}.{theirs}", out)
        _norm_to_torch(lp["layer_norm"], f"{tp}.layer_norm", out)
        _norm_to_torch(lp["final_layer_norm"], f"{tp}.final_layer_norm", out)
        li += 1
    return out


def export_said_to_torch(params: Dict) -> Dict:
    """Full SAID flax params → a reference-loadable torch state_dict."""
    out = export_unet1d_to_torch(params["denoiser"], prefix="denoiser.model.")
    out.update(export_wav2vec2_to_torch(params["audio_encoder"]))
    out["null_cond_emb"] = np.asarray(params["null_cond_emb"])
    if "audio_proj_layer" in params:
        _dense_to_torch(params["audio_proj_layer"], "audio_proj_layer", out)
    return out
