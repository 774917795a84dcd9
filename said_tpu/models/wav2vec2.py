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
    # Train-mode stochasticity (HF wav2vec2-base values). The reference
    # trains SAiD with the frozen HF encoder still in TRAIN mode
    # (``script/train.py:547-548`` freezes params only), so these are
    # active on the audio embeddings during SAiD training.
    hidden_dropout: float = 0.1
    activation_dropout: float = 0.1
    attention_dropout: float = 0.1
    feat_proj_dropout: float = 0.1
    layerdrop: float = 0.1

    def feature_extract_output_length(self, input_length: int) -> int:
        """Output frame count of the conv stack for a waveform length."""
        length = input_length
        for k, s in zip(self.conv_kernel, self.conv_stride):
            length = (length - k) // s + 1
        return length

    @classmethod
    def tiny(cls) -> "Wav2Vec2Config":
        """The canonical tiny encoder used by fast tests AND the bench's
        learning-evidence metric. One definition so the CPU-pinned
        overfit thresholds (tests/test_overfit.py) and the TPU-emitted
        ``train_loss_drop_overfit300`` provably run the same dynamics —
        duplicated literals would drift silently."""
        return cls(
            conv_dim=(16, 16), conv_stride=(5, 2), conv_kernel=(10, 3),
            hidden_size=32, num_hidden_layers=1, num_attention_heads=2,
            intermediate_size=64, num_conv_pos_embeddings=16,
            num_conv_pos_embedding_groups=4, output_hidden_size=32,
        )


class _FusedConvGELU(nn.Module):
    """Param holder for the fused stride-2 conv+GELU kernel.

    Instantiated with ``name="conv"`` and a ``kernel`` param of the flax
    ``nn.Conv`` layout (K, C_in, C_out), so the param pytree, the torch
    importer, and checkpoints are identical to the ``nn.Conv`` path.
    """

    out_dim: int
    kernel: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        from said_tpu.ops.pallas_conv import strided_conv_gelu

        w = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (self.kernel, x.shape[-1], self.out_dim),
            jnp.float32,
        )
        return strided_conv_gelu(x.astype(self.dtype), w.astype(self.dtype))


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
        # The norm-free stride-2 layers (conv_1..conv_6 of wav2vec2-base)
        # take the fused conv+GELU path: MXU matmuls instead of XLA's
        # slow strided-conv lowering, GELU in the epilogue. Other shapes
        # (conv_0's k=10/s=5, "layer"-norm configs) keep nn.Conv.
        import os

        if (
            self.stride == 2
            and self.kernel in (2, 3)
            and not self.use_bias
            and not self.use_group_norm
            and not self.use_layer_norm
            and not os.environ.get("SAID_CONV_NNCONV")
        ):
            x = _FusedConvGELU(
                self.out_dim, self.kernel, self.dtype, name="conv"
            )(x)
            if seq_mask is not None:
                m = (
                    seq_mask[None, :, None]
                    if seq_mask.ndim == 1
                    else seq_mask[:, :, None]
                )
                x = x * m.astype(x.dtype)
            return x
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
    # False in sequence-parallel mode: the Pallas norm kernels carry no
    # frame-sharding rule, so GSPMD would gather around the opaque call;
    # the jnp form partitions natively (stats are per-frame anyway).
    fused: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (c,), jnp.float32)
        if not self.fused:
            from said_tpu.ops.norms import _layer_norm_jnp

            return _layer_norm_jnp(x, scale, bias, self.eps)
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
    """Post-norm transformer layer (wav2vec2-base style).

    ``attn_impl`` routes the self-attention in deterministic mode:
    "dense" is the materialized-scores einsum (always used in train mode,
    where HF applies dropout on the attention probabilities); "flash"
    routes through the size/backend router of
    ``said_tpu.ops.pallas_attention`` (dense below ~2k frames / off-TPU,
    the packed Pallas kernel beyond — long clips never materialize the
    (T, T) score matrix); "flash_sp" uses the sequence-parallel
    custom-partitioning rule (frame-sharded Q, gathered K/V).
    ``lengths`` (B,)/scalar real frame counts back the flash paths'
    key masking (the dense path keeps using ``key_mask``).
    """

    config: Wav2Vec2Config
    dtype: Any = jnp.float32
    attn_impl: str = "dense"

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, deterministic: bool = True, key_mask=None,
        lengths=None,
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
        impl = self.attn_impl if deterministic else "dense"
        if impl != "dense":
            from said_tpu.ops.attention import multi_head_attention

            lens = None
            if lengths is not None:
                lens = jnp.broadcast_to(
                    jnp.asarray(lengths, jnp.int32).reshape(-1), (b,)
                )
            out = multi_head_attention(q, k, v, heads, impl=impl, lengths=lens)
        else:
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
            attn = nn.Dropout(cfg.attention_dropout)(attn, deterministic=deterministic)
            out = jnp.einsum("bhts,bshd->bthd", attn, vh).reshape(b, t, h)
        out = nn.Dense(h, dtype=self.dtype, name="out_proj")(out)
        out = nn.Dropout(cfg.hidden_dropout)(out, deterministic=deterministic)
        fused = self.attn_impl != "flash_sp"
        x = res + out
        x = LayerNormW2V(eps=cfg.layer_norm_eps, fused=fused, name="layer_norm")(x)

        ff = nn.Dense(cfg.intermediate_size, dtype=self.dtype, name="ff_inter")(x)
        ff = jax.nn.gelu(ff, approximate=False)
        ff = nn.Dropout(cfg.activation_dropout)(ff, deterministic=deterministic)
        ff = nn.Dense(h, dtype=self.dtype, name="ff_out")(ff)
        ff = nn.Dropout(cfg.hidden_dropout)(ff, deterministic=deterministic)
        x = x + ff
        x = LayerNormW2V(
            eps=cfg.layer_norm_eps, fused=fused, name="final_layer_norm"
        )(x)
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

    Split into ``extract_features`` (conv stack + frame interpolation)
    and ``encode_features`` (projection + transformer encoder) so the
    sequence-parallel pipeline can insert a frame-sharding boundary
    between them: the conv stack runs on the raw waveform (small), the
    encoder — where the O(T²) attention and the (T, hidden) activations
    live — runs frame-sharded. ``__call__`` composes both (the single-
    device path, identical semantics to the reference's
    ``ModifiedWav2Vec2Model.forward``, ``said/model/wav2vec2.py:14-82``).
    """

    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: Any = jnp.float32
    attn_impl: str = "auto"

    def setup(self):
        # Names must match the @nn.compact original (and the torch
        # importer / TP sharding rules): setup derives them from the
        # attribute names — the ``layer`` tuple yields layer_0, layer_1, …
        cfg = self.config
        self.feature_extractor = FeatureExtractor(cfg, self.dtype)
        fused = self.attn_impl != "flash_sp"
        self.fp_layer_norm = LayerNormW2V(eps=cfg.layer_norm_eps, fused=fused)
        self.fp_projection = nn.Dense(cfg.hidden_size, dtype=self.dtype)
        self.fp_dropout = nn.Dropout(cfg.feat_proj_dropout)
        self.masked_spec_embed = self.param(
            "masked_spec_embed",
            nn.initializers.uniform(scale=1.0),
            (cfg.hidden_size,),
            jnp.float32,
        )
        self.pos_conv = PositionalConvEmbedding(cfg, self.dtype)
        self.encoder_layer_norm = LayerNormW2V(
            eps=cfg.layer_norm_eps, fused=fused
        )
        self.enc_dropout = nn.Dropout(cfg.hidden_dropout)
        # "auto" routes deterministic attention through the size/backend
        # router (dense below ~2k frames or off-TPU — numerically the
        # materialized-scores path — and the packed Pallas kernel beyond,
        # so hour-scale clips never materialize a (T, T) encoder score
        # matrix); train mode always runs dense (prob-dropout).
        layer_impl = "flash" if self.attn_impl == "auto" else self.attn_impl
        self.layer = tuple(
            EncoderLayer(cfg, self.dtype, attn_impl=layer_impl)
            for _ in range(cfg.num_hidden_layers)
        )

    def extract_features(
        self,
        input_values: jnp.ndarray,
        num_frames: Optional[int] = None,
        input_length=None,
        num_frames_real=None,
    ):
        """Conv stack + linear frame interpolation: waveform (B, T_a) →
        (features (B, num_frames, 512), traced real frame count or None).
        """
        feats, feat_real_len = self.feature_extractor(input_values, input_length)
        if num_frames is not None:
            if input_length is not None:
                feats = linear_interp_time_dynamic(
                    feats, num_frames, feat_real_len, num_frames_real
                )
            else:
                feats = linear_interp_time(feats, num_frames)
        real_frames = None
        if input_length is not None:
            real_frames = (
                jnp.asarray(num_frames_real, jnp.int32)
                if num_frames is not None
                else feat_real_len
            )
        return feats, real_frames

    def encode_features(
        self,
        feats: jnp.ndarray,
        mask_time_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        real_frames=None,
    ) -> jnp.ndarray:
        """Feature projection + transformer encoder over (B, T, 512)
        features. ``real_frames`` (traced scalar or (B,)): real frame
        counts for length-bucketed mode."""
        cfg = self.config
        h = self.fp_layer_norm(feats)
        h = self.fp_projection(h)
        h = self.fp_dropout(h, deterministic=deterministic)

        # Spec-augment time masking (training only; indices computed host-side)
        if mask_time_indices is not None:
            h = jnp.where(
                mask_time_indices[:, :, None],
                self.masked_spec_embed.astype(h.dtype)[None, None, :],
                h,
            )

        frame_mask = None
        if real_frames is not None:
            if real_frames.ndim == 1:  # per-row lengths
                frame_mask = jnp.arange(h.shape[1])[None, :] < real_frames[:, None]
                m = frame_mask[:, :, None]
            else:
                frame_mask = jnp.arange(h.shape[1]) < real_frames
                m = frame_mask[None, :, None]
            # Zero the pads so the SAME-padded positional conv sees exactly
            # the zero boundary the unpadded program would.
            h = h * m.astype(h.dtype)

        # Encoder: positional conv + LN + dropout + layers (with layerdrop)
        h = h + self.pos_conv(h)
        h = self.encoder_layer_norm(h)
        h = self.enc_dropout(h, deterministic=deterministic)
        use_layerdrop = not deterministic and cfg.layerdrop > 0.0
        for layer in self.layer:
            out = layer(
                h, deterministic, key_mask=frame_mask, lengths=real_frames
            )
            if use_layerdrop:
                # HF skips the whole layer w.p. layerdrop in train mode; as
                # a compiled program we compute and select (the encoder is
                # frozen during SAiD training, so no wasted backward).
                drop = jax.random.bernoulli(
                    self.make_rng("dropout"), cfg.layerdrop
                )
                h = jnp.where(drop, h, out)
            else:
                h = out
        return h

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
        feats, real_frames = self.extract_features(
            input_values, num_frames, input_length, num_frames_real
        )
        return self.encode_features(
            feats, mask_time_indices, deterministic, real_frames
        )


def compute_time_mask_indices(
    shape: Tuple[int, int],
    mask_prob: float = 0.05,
    mask_length: int = 10,
    rng: Optional[np.random.Generator] = None,
    min_masks: int = 2,
    input_lengths: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Host-side port of HF's spec-augment time-mask sampler.

    Faithful to ``transformers`` ``_compute_mask_indices`` (the sampler
    the reference's train-mode encoder runs, ``script/train.py:547-548``
    leaves the module in train mode): ONE epsilon draw per call for
    probabilistic rounding, per-row span counts derived from
    ``input_lengths`` (HF's attention_mask row sums), the two clamps
    (spans·length ≤ T; spans ≤ input_length − mask_length + 1), and
    dummy-index padding of short rows — dummies duplicate an existing
    span, so they add no coverage, exactly like HF.

    Returns a (B, T) bool array; True marks masked time steps.
    tests/test_spec_augment.py checks this port statistically against
    the installed ``transformers`` sampler.
    """
    b, t = shape
    rng = rng or np.random.default_rng()
    mask = np.zeros((b, t), dtype=bool)
    if mask_length >= t:
        # HF raises for mask_length > T; SAiD windows are >= 120 frames so
        # this only triggers in toy tests, where "no masking" is the
        # useful behavior.
        return mask
    if input_lengths is None:
        input_lengths = [t] * b

    epsilon = rng.random()

    def num_spans(input_length: int) -> int:
        n = int(mask_prob * input_length / mask_length + epsilon)
        n = max(n, min_masks)
        if n * mask_length > t:
            n = t // mask_length
        if input_length - (mask_length - 1) < n:
            n = max(input_length - (mask_length - 1), 0)
        return n

    max_spans = num_spans(t)
    if max_spans == 0:
        return mask

    for i, input_length in enumerate(input_lengths):
        n = num_spans(int(input_length))
        starts = rng.choice(int(input_length) - (mask_length - 1), size=n, replace=False)
        if len(starts) == 0:
            # row shorter than one span: HF pads with T-1 (a padding frame)
            dummy = t - 1
        else:
            dummy = starts[0]
        starts = np.concatenate(
            [starts, np.full(max_spans - n, dummy, dtype=np.int64)]
        )
        for s in starts:
            mask[i, s : min(s + mask_length, t)] = True
    return mask
