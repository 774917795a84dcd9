"""Wav2Vec2 audio encoder in JAX/flax, channels-last throughout.

A from-scratch implementation of the architecture behind
``facebook/wav2vec2-base-960h`` (7-layer strided conv feature extractor,
feature projection, 12-layer post-norm transformer encoder with a
grouped convolutional positional embedding), with the reference's one
modification: after the conv extractor, the feature sequence is
linearly interpolated (align_corners) to exactly the blendshape frame
count (``said/model/wav2vec2.py:41-44``) before projection+encoding.

Weights import from the HF torch checkpoint via
``said_tpu.utils.torch_import.convert_wav2vec2``.

Dropout/spec-augment: inference is deterministic. For training parity,
time-mask indices may be passed in (computed host-side with
``compute_time_mask_indices``) and masked positions are replaced by the
learned ``masked_spec_embed`` vector, as HF does when the module is in
training mode.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from said_tpu.ops.norms import group_norm, group_norm_masked, layer_norm_f32
from said_tpu.ops.resample import linear_interp_time, linear_interp_time_dynamic


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Architecture hyperparameters (defaults = wav2vec2-base)."""

    conv_dim: Tuple[int, ...] = (512,) * 7
    conv_stride: Tuple[int, ...] = (5, 2, 2, 2, 2, 2, 2)
    conv_kernel: Tuple[int, ...] = (10, 3, 3, 3, 3, 2, 2)
    conv_bias: bool = False
    feat_extract_norm: str = "group"  # "group" (base) | "layer" (large)
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    layer_norm_eps: float = 1e-5
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    output_hidden_size: int = 768

    def feature_extract_output_length(self, input_length: int) -> int:
        """Output frame count of the conv stack for a waveform length."""
        length = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length


class _ConvLayer(nn.Module):
    """One feature-extractor conv layer; optional per-channel norm + GELU."""

    out_dim: int
    kernel: int
    stride: int
    use_bias: bool
    use_group_norm: bool
    use_layer_norm: bool
    eps: float
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, seq_mask=None) -> jnp.ndarray:
        x = nn.Conv(
            self.out_dim,
            (self.kernel,),
            strides=(self.stride,),
            padding="VALID",
            use_bias=self.use_bias,
            dtype=self.dtype,
            name="conv",
        )(x)
        if self.use_group_norm:
            # num_groups == num_channels → per-channel instance norm over time
            c = x.shape[-1]
            scale = self.param("norm_scale", nn.initializers.ones, (c,), jnp.float32)
            bias = self.param("norm_bias", nn.initializers.zeros, (c,), jnp.float32)
            if seq_mask is None:
                x = group_norm(x, c, scale, bias, self.eps)
            else:
                x = group_norm_masked(x, c, scale, bias, seq_mask, self.eps)
        elif self.use_layer_norm:
            x = LayerNormW2V(eps=self.eps, name="norm")(x)
        x = jax.nn.gelu(x, approximate=False)
        if seq_mask is not None:
            # Keep padded positions exactly zero so downstream VALID convs
            # of in-range outputs read only real samples.
            m = seq_mask[None, :, None] if seq_mask.ndim == 1 else seq_mask[:, :, None]
            x = x * m.astype(x.dtype)
        return x


class LayerNormW2V(nn.Module):
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        return layer_norm_f32(x, scale, bias, self.eps)


class FeatureExtractor(nn.Module):
    """Strided conv stack: raw waveform (B, T_a) → features (B, T', 512)."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, input_values: jnp.ndarray, input_length=None):
        """Returns features (B, T', C) and, when ``input_length`` (traced
        real sample count) is given, the traced real feature length."""
        cfg = self.config
        x = input_values[:, :, None].astype(self.dtype)  # (B, T, 1)
        real_len = None
        if input_length is not None:
            real_len = jnp.asarray(input_length, jnp.int32)
        for i, (dim, k, s) in enumerate(
            zip(cfg.conv_dim, cfg.conv_kernel, cfg.conv_stride)
        ):
            out_len = (x.shape[1] - k) // s + 1
            seq_mask = None
            if real_len is not None:
                real_len = (real_len - k) // s + 1
                if real_len.ndim == 1:  # per-row lengths
                    seq_mask = jnp.arange(out_len)[None, :] < real_len[:, None]
                else:
                    seq_mask = jnp.arange(out_len) < real_len
            x = _ConvLayer(
                out_dim=dim,
                kernel=k,
                stride=s,
                use_bias=cfg.conv_bias,
                use_group_norm=(cfg.feat_extract_norm == "group" and i == 0),
                use_layer_norm=(cfg.feat_extract_norm == "layer"),
                eps=cfg.layer_norm_eps,
                dtype=self.dtype,
                name=f"conv_{i}",
            )(x, seq_mask)
        return x, real_len


class EncoderLayer(nn.Module):
    """Post-norm transformer layer (wav2vec2-base style)."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, key_mask=None
    ) -> jnp.ndarray:
        cfg = self.config
        h = cfg.hidden_size
        heads = cfg.num_attention_heads
        d = h // heads

        res = x
        q = nn.Dense(h, dtype=self.dtype, name="q_proj")(x)
        k = nn.Dense(h, dtype=self.dtype, name="k_proj")(x)
        v = nn.Dense(h, dtype=self.dtype, name="v_proj")(x)
        b, t, _ = x.shape
        qh = q.reshape(b, t, heads, d) * (d**-0.5)
        kh = k.reshape(b, t, heads, d)
        vh = v.reshape(b, t, heads, d)
        scores = jnp.einsum("bthd,bshd->bhts", qh, kh)
        if key_mask is not None:
            neg = jnp.asarray(-np.finfo(np.float32).max, scores.dtype)
            km = (
                key_mask[:, None, None, :]
                if key_mask.ndim == 2
                else key_mask[None, None, None, :]
            )
            scores = jnp.where(km, scores, neg)
        attn = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        out = jnp.einsum("bhts,bshd->bthd", attn, vh).reshape(b, t, h)
        out = nn.Dense(h, dtype=self.dtype, name="out_proj")(out)
        x = res + out
        x = LayerNormW2V(eps=cfg.layer_norm_eps, name="layer_norm")(x)

        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ff_inter")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dense(h, dtype=self.dtype, name="ff_out")(ff)
        x = x + ff
        x = LayerNormW2V(eps=cfg.layer_norm_eps, name="final_layer_norm")(x)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv positional embedding (kernel 128, 16 groups, SamePad)."""

    config: Wav2Vec2Config
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        cfg = self.config
        k = cfg.num_conv_pos_embeddings
        h = nn.Conv(
            cfg.hidden_size,
            (k,),
            padding=k // 2,
            feature_group_count=cfg.num_conv_pos_embedding_groups,
            dtype=self.dtype,
            name="conv",
        )(x)
        if k % 2 == 0:  # SamePadLayer: drop the trailing extra frame
            h = h[:, :-1, :]
        return jax.nn.gelu(h, approximate=False)


class Wav2Vec2Encoder(nn.Module):
    """Full audio conditioner: waveform → (B, num_frames, hidden).

    ``num_frames`` is a static Python int (the blendshape window size);
    when None, the native ~50 Hz feature rate is kept.
    """

    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_values: jnp.ndarray,
        num_frames: Optional[int] = None,
        mask_time_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        input_length=None,
        num_frames_real=None,
    ) -> jnp.ndarray:
        """Waveform → embedding.

        Length-bucketed mode: when ``input_length``/``num_frames_real``
        (traced scalars, real sample/frame counts within the padded
        buffers) are given, the first ``num_frames_real`` output frames
        equal the exact unpadded computation — ONE compiled program
        serves every clip length up to the bucket size.
        """
        cfg = self.config
        dynamic = input_length is not None

        feats, feat_real_len = FeatureExtractor(
            cfg, self.dtype, name="feature_extractor"
        )(input_values, input_length)
        if num_frames is not None:
            if dynamic:
                feats = linear_interp_time_dynamic(
                    feats, num_frames, feat_real_len, num_frames_real
                )
            else:
                feats = linear_interp_time(feats, num_frames)

        # Feature projection: LN → Dense(512 → hidden)
        h = LayerNormW2V(eps=cfg.layer_norm_eps, name="fp_layer_norm")(feats)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="fp_projection")(h)

        # Spec-augment time masking (training only; indices computed host-side)
        masked_spec_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
            jnp.float32,
        )
        if mask_time_indices is not None:
            h = jnp.where(
                mask_time_indices[:, :, None],
                masked_spec_embed.astype(h.dtype)[None, None, :],
                h,
            )

        frame_mask = None
        if dynamic:
            real_frames = (
                jnp.asarray(num_frames_real, jnp.int32)
                if num_frames is not None
                else feat_real_len
            )
            if real_frames.ndim == 1:  # per-row lengths
                frame_mask = jnp.arange(h.shape[1])[None, :] < real_frames[:, None]
                m = frame_mask[:, :, None]
            else:
                frame_mask = jnp.arange(h.shape[1]) < real_frames
                m = frame_mask[None, :, None]
            # Zero the pads so the SAME-padded positional conv sees exactly
            # the zero boundary the unpadded program would.
            h = h * m.astype(h.dtype)

        # Encoder: positional conv + LN + layers
        h = h + PositionalConvEmbedding(cfg, self.dtype, name="pos_conv")(h)
        h = LayerNormW2V(eps=cfg.layer_norm_eps, name="encoder_layer_norm")(h)
        for i in range(cfg.num_hidden_layers):
            h = EncoderLayer(cfg, self.dtype, name=f"layer_{i}")(
                h, deterministic, key_mask=frame_mask
            )
        return h


def compute_time_mask_indices(
    shape: Tuple[int, int],
    mask_prob: float = 0.05,
    mask_length: int = 10,
    rng: Optional[np.random.Generator] = None,
    min_masks: int = 2,
) -> np.ndarray:
    """Host-side port of HF's spec-augment time-mask index sampling.

    Returns a (B, T) bool array; True marks masked time steps.
    """
    b, t = shape
    rng = rng or np.random.default_rng()
    mask = np.zeros((b, t), dtype=bool)
    if mask_length >= t:
        return mask
    num_spans = int(mask_prob * t / mask_length + rng.random())
    num_spans = max(num_spans, min_masks)
    for i in range(b):
        starts = rng.choice(t - mask_length + 1, size=num_spans, replace=False)
        for s in starts:
            mask[i, s : s + mask_length] = True
    return mask
