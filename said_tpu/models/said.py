"""SAID: the complete speech → blendshape-coefficients diffusion model.

Composes the Wav2Vec2 conditioner, the UNet1D denoiser, the learned
null-conditioning embedding, and the DDIM sampling pipeline — the JAX
counterpart of the reference's ``SAID``/``SAID_UNet1D``
(``said/model/diffusion.py:46-527``), re-organized functionally:

- ``SAID`` (flax module) owns parameters and the denoise/embed forwards.
- ``SAIDPipeline`` owns schedule + jit cache and exposes
  ``inference(waveform, ...)`` — one compiled XLA program per
  (batch, window) shape, with the whole denoise chain in a lax.scan.

The identity latent hooks (``encode_samples``/``decode_latent``) and
``latent_scale`` are kept so a future latent-space variant slots in.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from said_tpu.diffusion.sampler import (
    SamplerConfig,
    finalize_chain,
    make_step,
    num_used_steps,
    prepare_chain,
    sample,
)
from said_tpu.diffusion.schedule import DiffusionSchedule
from said_tpu.models.unet1d import UNet1DConditionModel
from said_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder

SAMPLING_RATE = 16000


@dataclasses.dataclass
class SAIDInferenceOutput:
    """result (B, T, C) in [0,1]; intermediates (K, B, T, C) or None."""

    result: np.ndarray
    intermediates: Optional[np.ndarray] = None


class SAID(nn.Module):
    """Parameters + forward passes (denoise, audio embedding)."""

    audio_config: Wav2Vec2Config = Wav2Vec2Config()
    in_channels: int = 32
    feature_dim: int = -1
    diffusion_steps: int = 1000
    latent_scale: float = 1.0
    prediction_type: str = "epsilon"
    dtype: Any = jnp.float32
    self_attn_impl: str = "dense"
    cross_attn_impl: str = "banded"
    # Audio-encoder self-attention routing: "auto" (size/backend router —
    # dense short/off-TPU, packed Pallas kernel for long clips), "dense",
    # or "flash_sp" (frame-sharded prepare on a 'seq' mesh).
    encoder_attn_impl: str = "auto"
    remat: bool = False

    def setup(self):
        cross_dim = (
            self.feature_dim
            if self.feature_dim > 0
            else self.audio_config.hidden_size
        )
        self.audio_encoder = Wav2Vec2Encoder(
            self.audio_config, self.dtype, attn_impl=self.encoder_attn_impl
        )
        self.denoiser = UNet1DConditionModel(
            in_channels=self.in_channels,
            out_channels=self.in_channels,
            cross_attention_dim=cross_dim,
            dropout=0.1,
            dtype=self.dtype,
            self_attn_impl=self.self_attn_impl,
            cross_attn_impl=self.cross_attn_impl,
            remat=self.remat,
        )
        emb_dim = self.feature_dim if self.feature_dim > 0 else self.audio_config.output_hidden_size
        self.null_cond_emb = self.param(
            "null_cond_emb",
            nn.initializers.normal(stddev=1.0),
            (1, 1, emb_dim),
            jnp.float32,
        )
        if self.feature_dim > 0:
            self.audio_proj_layer = nn.Dense(
                self.feature_dim, dtype=self.dtype, name="audio_proj_layer"
            )

    def __call__(
        self,
        noisy_samples: jnp.ndarray,
        timesteps: jnp.ndarray,
        audio_embedding: Optional[jnp.ndarray],
        deterministic: bool = True,
        kv_caches: Optional[dict] = None,
        emb: Optional[jnp.ndarray] = None,
        seq_len_real=None,
        cfg_fold: bool = False,
    ) -> jnp.ndarray:
        """Predict noise: (B, T, C), (B,), (B, S, E) → (B, T, C).

        ``kv_caches``/``emb`` activate the sampling fast path (see
        ``said_tpu.models.unet1d.build_kv_caches``/``time_embed_table``);
        ``seq_len_real`` the length-bucketed mode; ``cfg_fold`` the CFG
        shared-prefix fold (un-duplicated latent in, 2B predictions out —
        see ``UNet1DConditionModel.__call__``).
        """
        return self.denoiser(
            noisy_samples,
            timesteps,
            audio_embedding,
            deterministic,
            kv_caches=kv_caches,
            emb=emb,
            seq_len_real=seq_len_real,
            cfg_fold=cfg_fold,
        )

    def get_audio_embedding(
        self,
        waveform: jnp.ndarray,
        num_frames: Optional[int],
        mask_time_indices: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
        input_length=None,
        num_frames_real=None,
        stop_encoder_grad: bool = False,
    ) -> jnp.ndarray:
        """(B, T_a) processed waveform → (B, num_frames, E) embedding.

        ``stop_encoder_grad``: the trainer freezes the encoder (reference
        ``train.py:547-548``); stopping the gradient HERE (before the
        trainable ``audio_proj_layer``) spares XLA the entire encoder
        backward — the optimizer's mask alone still pays for computing
        the unused weight gradients (~40% of the measured train step).
        """
        feats = self.audio_encoder(
            waveform, num_frames, mask_time_indices, deterministic,
            input_length=input_length, num_frames_real=num_frames_real,
        )
        if stop_encoder_grad:
            feats = jax.lax.stop_gradient(feats)
        if self.feature_dim > 0:
            feats = self.audio_proj_layer(feats)
        return feats

    def get_audio_features(
        self, waveform: jnp.ndarray, num_frames: Optional[int],
        input_length=None, num_frames_real=None,
    ):
        """Stage 1 of the split conditioner: conv stack + frame interp →
        ((B, num_frames, 512) features, traced real frame count or None).
        The sequence-parallel pipeline inserts its frame-sharding
        boundary after this (the conv stack is cheap; the transformer
        encoder is where the O(T²) attention and (T, hidden) activations
        live)."""
        return self.audio_encoder.extract_features(
            waveform, num_frames, input_length, num_frames_real
        )

    def encode_audio_features(
        self, feats: jnp.ndarray, deterministic: bool = True,
        real_frames=None, stop_encoder_grad: bool = False,
    ) -> jnp.ndarray:
        """Stage 2: feature projection + transformer encoder (+ the
        optional trainable ``audio_proj_layer``). Composes with
        ``get_audio_features`` to equal ``get_audio_embedding``."""
        feats = self.audio_encoder.encode_features(
            feats, None, deterministic, real_frames
        )
        if stop_encoder_grad:
            feats = jax.lax.stop_gradient(feats)
        if self.feature_dim > 0:
            feats = self.audio_proj_layer(feats)
        return feats

    def null_embedding(self, batch_size: int, seq_len: int) -> jnp.ndarray:
        """Learned unconditional embedding, broadcast to (B, S, E)."""
        return jnp.broadcast_to(
            self.null_cond_emb.astype(self.dtype),
            (batch_size, seq_len, self.null_cond_emb.shape[-1]),
        )

    # Identity latent hooks (reference diffusion.py:278-306).
    def encode_samples(self, samples: jnp.ndarray) -> jnp.ndarray:
        return samples

    def decode_latent(self, latent: jnp.ndarray) -> jnp.ndarray:
        return latent


def process_audio(waveform: np.ndarray) -> np.ndarray:
    """Wav2Vec2Processor normalization: per-utterance zero-mean/unit-var.

    (The HF processor for wav2vec2-base-960h does exactly this:
    ``(x - mean) / sqrt(var + 1e-7)``.) Accepts (T,) or (B, T).
    """
    x = np.asarray(waveform, dtype=np.float32)
    squeeze = x.ndim == 1
    if squeeze:
        x = x[None]
    mean = x.mean(axis=-1, keepdims=True)
    var = x.var(axis=-1, keepdims=True)
    out = (x - mean) / np.sqrt(var + 1e-7)
    return out


def _shard_seq_tree(tree, mesh, t_frames: int):
    """Place a pytree on a 'seq' mesh, sharding the frame axis.

    Leaf rules (by role): (B, T, ...) tensors — latents, masks, and the
    banded K/V caches (B, T, W, H, D) — shard dim 1; per-frame tables
    (T, W) shard dim 0; everything else replicates.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def place(x):
        spec = [None] * x.ndim
        if x.ndim >= 3 and x.shape[1] == t_frames:
            spec[1] = "seq"
        elif x.ndim == 2 and x.shape[0] == t_frames:
            spec[0] = "seq"
        return jax.device_put(x, NamedSharding(mesh, P(*spec)))

    return jax.tree.map(place, tree)


# One denoise dispatch is kept under ~10 s of device time: a single XLA
# execution lasting minutes trips the TPU worker's liveness machinery
# (reproduced deterministically: T=21600 × 1000 steps as ONE dispatch —
# ~87 s of device time — crashes the worker every time, while the same
# shape at 100 steps runs fine). Attention dominates long clips, so
# dispatch "work" is modeled as cfg_batch·T²·steps; the budget equals
# the verified-good 100-step dispatch at T=21600 (~8.7 s on v5e).
_CHUNK_WORK_BUDGET = 2 * 21600 * 21600 * 100


def _auto_denoise_chunk(
    batch: int, window: int, steps: int, do_cfg: bool
) -> int:
    """Steps per denoise dispatch (0 = whole chain in one dispatch).

    Splits the chain into equal host-dispatched segments of the SAME
    compiled scan program whenever the estimated single-dispatch work
    exceeds ``_CHUNK_WORK_BUDGET``; prefers a divisor of the step count
    (a remainder-sized segment would be a second compile of the same
    scan body). Numerics are unchanged — see ``prepare_chain``.
    """
    work = (2 if do_cfg else 1) * batch * window * window * steps
    n_chunks = -(-work // _CHUNK_WORK_BUDGET)
    if n_chunks <= 1:
        return 0
    target = max(1, steps // n_chunks)
    for c in range(target, 0, -1):
        if steps % c == 0:
            return c
    return target


class SAIDPipeline:
    """Host-side driver: owns params, schedule, and a jit cache.

    One compiled program serves each (batch_size, window_size) pair;
    recompilation is avoided across repeated clips of the same length
    (the eval protocol runs 72 samples per clip in chunks — all one
    compile).
    """

    def __init__(
        self,
        model: SAID,
        params: Dict,
        clip_sample: bool = True,
    ):
        self.model = model
        self.params = params
        self.schedule = DiffusionSchedule.create(
            model.diffusion_steps, model.prediction_type, clip_sample
        )
        self.sampling_rate = SAMPLING_RATE
        self._jit_cache: Dict = {}

    def _denoise_len_fn(self, dynamic: bool, do_cfg: bool):
        def _denoise_len(window_real):
            # Per-row lengths (mixed-length batches) must be tiled for
            # the CFG-doubled batch.
            if dynamic and do_cfg and window_real.ndim == 1:
                return jnp.concatenate([window_real, window_real])
            return window_real

        return _denoise_len

    def _prepare_compiled(self, do_cfg: bool, window_size: int,
                          dynamic: bool, sp: bool):
        """The ``prepare`` device program: audio encoder, null embedding,
        the banded K/V gathers, and the timestep-MLP table (everything
        loop-invariant). Compiled SEPARATELY from the denoise scan for
        two reasons: (1) when the caches are intermediates of one big
        program, XLA assigns them a layout that costs ~2 ms/step extra in
        the banded attention (measured at T=3600: 7.0 vs 4.8 ms/step) —
        as program inputs they get the canonical layout; (2) prepare is
        keyed only on (do_cfg, window, dynamic, sp), so runs that differ
        in solver/steps/eta (e.g. full-quality DDIM and fast DPM++ over
        the same clip) share one prepare compile.

        ``sp`` (sequence-parallel) splits ``prepare`` once more, around
        the frame-sharding boundary: ``prepare_feats`` (conv stack +
        interp, small, unsharded) and ``prepare_encode`` (transformer
        encoder + K/V gather) whose features INPUT the caller shards
        along frames — GSPMD then partitions the whole encoder (the
        flash_sp custom-partitioning rule keeps its attention blockwise),
        so arbitrarily long clips never hold an unsharded (T, hidden)
        activation or encoder attention working set on one chip.
        """
        key = ("prepare", do_cfg, window_size, dynamic, sp)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model

        from said_tpu.models.unet1d import (
            UNet1DConditionModel,
            build_kv_caches,
            time_embed_table,
        )

        # SAID builds its denoiser with the UNet defaults (192 ch / 32
        # per head); setup()-bound submodules aren't readable here.
        mc = UNet1DConditionModel.model_channels
        heads = mc // UNet1DConditionModel.num_head_channels
        _denoise_len = self._denoise_len_fn(dynamic, do_cfg)

        def _caches_from_emb(params, audio_emb, seq_len_real=None):
            uncond = None
            if do_cfg:
                uncond = model.apply(
                    {"params": params},
                    audio_emb.shape[0],
                    audio_emb.shape[1],
                    method=SAID.null_embedding,
                )
            full_context = (
                jnp.concatenate([uncond, audio_emb], axis=0)
                if do_cfg
                else audio_emb
            )
            kv_caches = build_kv_caches(
                params["denoiser"],
                full_context,
                window_size,
                num_heads=heads,
                dtype=model.dtype,
                seq_len_real=seq_len_real,
            )
            emb_table = time_embed_table(
                params["denoiser"], np.arange(model.diffusion_steps), mc
            )
            return kv_caches, emb_table

        def prepare(params, waveform, input_length, window_real):
            audio_emb = model.apply(
                {"params": params},
                waveform,
                window_size,
                method=SAID.get_audio_embedding,
                input_length=input_length if dynamic else None,
                num_frames_real=window_real if dynamic else None,
            )
            return _caches_from_emb(
                params,
                audio_emb,
                seq_len_real=_denoise_len(window_real) if dynamic else None,
            )

        def prepare_feats(params, waveform):
            # SP mode is exclusive with `dynamic`, so no length plumbing.
            feats, _ = model.apply(
                {"params": params},
                waveform,
                window_size,
                method=SAID.get_audio_features,
            )
            return feats

        def prepare_encode(params, feats):
            audio_emb = model.apply(
                {"params": params}, feats, method=SAID.encode_audio_features
            )
            return _caches_from_emb(params, audio_emb)

        if sp:
            fns = (jax.jit(prepare_feats), jax.jit(prepare_encode))
        else:
            fns = (jax.jit(prepare),)
        self._jit_cache[key] = fns
        return fns

    def _denoise_compiled(self, config: SamplerConfig, use_init: bool,
                          use_mask: bool, save_intermediate: bool,
                          dynamic: bool = False, chunk: int = 0):
        """The ``denoise`` device program(s): the whole reverse chain as
        one ``lax.scan`` (``chunk == 0``), or the start/segment/finish
        trio for chunked long-clip dispatch. Takes the K/V caches as
        PROGRAM INPUTS (see ``_prepare_compiled`` for why) and is keyed
        on sampler config + feature flags only — jit itself re-traces per
        input shape, so one cache entry serves every clip geometry.
        """
        key = ("denoise", config, use_init, use_mask, save_intermediate,
               dynamic, chunk)
        if key in self._jit_cache:
            return self._jit_cache[key]

        model = self.model
        schedule = self.schedule
        _denoise_len = self._denoise_len_fn(dynamic, config.do_cfg)

        def _fold_and_fn(params, kv_caches, emb_table, window_real):
            dlen = _denoise_len(window_real) if dynamic else None
            # CFG shared-prefix fold: the denoiser takes the un-duplicated
            # latent and doubles the batch at the first cross-attention
            # (the exact cond/uncond divergence point) — ~10% less work
            # per step. Per-row mixed-length batches keep the unfolded
            # path (their masks are per-CFG-row).
            fold = config.do_cfg and (dlen is None or jnp.ndim(dlen) == 0)

            def denoise_fn(x, t, ctx):
                del ctx  # folded into kv_caches
                return model.apply(
                    {"params": params},
                    x,
                    t,
                    None,
                    deterministic=True,
                    kv_caches=kv_caches,
                    emb=emb_table[t],
                    seq_len_real=dlen,
                    cfg_fold=fold,
                )

            return denoise_fn, fold

        def denoise(params, rng, latents, kv_caches, emb_table,
                    init_samples, mask, window_real):
            denoise_fn, fold = _fold_and_fn(
                params, kv_caches, emb_table, window_real
            )
            return sample(
                schedule,
                denoise_fn,
                rng,
                latents,
                None,
                None,
                config,
                init_samples=init_samples if use_init else None,
                mask=mask if use_mask else None,
                latent_scale=model.latent_scale,
                save_intermediate=save_intermediate,
                cfg_folded=fold,
            )

        # Chunked long-clip mode (``chunk`` > 0): the chain is split into
        # host-dispatched segments of ONE compiled scan program so no
        # single XLA execution runs long enough to trip the TPU worker's
        # liveness machinery (see ``_CHUNK_WORK_BUDGET``). ``chain_start``
        # performs every rng split and pre-scan op exactly as ``sample``
        # would, so chunked == unchunked bit-for-bit
        # (tests/test_chunked_sampler.py).
        def chain_start(params, rng, latents, init_samples):
            return prepare_chain(
                schedule, config, rng, latents,
                init_samples if use_init else None, model.latent_scale,
            )

        def chain_chunk(params, carry, xs_chunk, kv_caches, emb_table,
                        init_latents, noise, mask, window_real):
            denoise_fn, fold = _fold_and_fn(
                params, kv_caches, emb_table, window_real
            )
            step = make_step(
                schedule, denoise_fn, config, None, init_latents, noise,
                mask if use_mask else None, use_mask, save_intermediate,
                fold,
            )
            return jax.lax.scan(step, carry, xs_chunk, unroll=config.unroll)

        def chain_finish(carry):
            return finalize_chain(carry, config, model.latent_scale)

        if chunk:
            fns = (jax.jit(chain_start), jax.jit(chain_chunk),
                   jax.jit(chain_finish))
        else:
            fns = (jax.jit(denoise),)
        self._jit_cache[key] = fns
        return fns

    def inference(
        self,
        waveform_processed: np.ndarray,
        init_samples: Optional[np.ndarray] = None,
        mask: Optional[np.ndarray] = None,
        num_inference_steps: int = 100,
        strength: float = 1.0,
        guidance_scale: float = 2.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        solver: str = "ddim",
        fps: int = 60,
        rng: Optional[jax.Array] = None,
        latents: Optional[np.ndarray] = None,
        save_intermediate: bool = False,
        length_bucket: int = 0,
        scan_unroll: int = 1,
        waveform_lengths: Optional[np.ndarray] = None,
        seq_mesh=None,
        denoise_chunk: Optional[int] = None,
    ) -> SAIDInferenceOutput:
        """Full inference (reference ``SAID.inference`` semantics).

        ``latents`` may be passed explicitly (parity tests inject the
        reference's gaussian draw); otherwise drawn from ``rng``.

        ``solver`` — "ddim" (reference semantics) or "dpmpp_2m"
        (DPM-Solver++(2M) fast sampling, far fewer steps for the same
        error; beyond the reference, which is DDIM-only). Orthogonal to
        bucketing / SP / editing — it only changes the per-step update.

        ``length_bucket`` > 0 enables length-bucketed execution: inputs
        are zero-padded to the next multiple of ``length_bucket`` frames
        and a single compiled program serves every clip length within the
        bucket (real frames are numerically identical to an unpadded run;
        the padded tail of the returned array is garbage — slice to the
        real window size, as the CLIs do).

        ``waveform_lengths`` (with ``length_bucket``) enables MIXED-LENGTH
        batches: rows of ``waveform_processed`` are zero-padded clips of
        different real sample counts; each row's real frames equal its
        own unpadded run (a serving capability the reference lacks — it
        can only batch copies of one clip).

        ``seq_mesh`` — a ``jax.sharding.Mesh`` with a ``'seq'`` axis:
        sequence-parallel sampling for extreme clip lengths. Latents and
        the banded K/V caches are sharded along the frame axis; GSPMD
        partitions convs/norms spatially and the flash kernel's
        custom-partitioning rule keeps attention blockwise (build the
        model with ``self_attn_impl="flash_sp"`` and
        ``encoder_attn_impl="flash_sp"``). The prepare stage is sharded
        too: the conv feature stack runs unsharded (it is tiny — raw
        waveform in, 512-dim features out), then the features are placed
        frame-sharded and the transformer encoder + banded K/V gather run
        under the mesh, so no unsharded (T, hidden) activation or
        encoder-attention working set ever exists on one chip. Requires
        the seq-axis size to divide the frame count (pad the clip via
        ``fit_audio_unet(divisor=...)``) and is exclusive with
        ``length_bucket``.

        ``denoise_chunk`` — steps per denoise DISPATCH. ``None`` (auto,
        the default) splits the chain whenever the estimated device time
        of a single dispatch would be long enough to trip the TPU
        worker's liveness machinery (minutes-long single executions
        crash the worker; see ``_auto_denoise_chunk``); ``0`` forces the
        whole chain into one dispatch; ``> 0`` forces that segment size.
        Chunking is bit-identical to the single dispatch — every rng
        split and traced op is shared (tests/test_chunked_sampler.py) —
        and composes with bucketing, editing, and ``seq_mesh``.
        """
        waveform_processed = jnp.asarray(waveform_processed)
        if waveform_processed.ndim == 1:
            waveform_processed = waveform_processed[None]
        b, t_a = waveform_processed.shape
        window_size = int(t_a / self.sampling_rate * fps)
        c = self.model.in_channels

        dynamic = length_bucket > 0
        if seq_mesh is not None:
            # validate BEFORE compiling/running the prepare program (a
            # long clip's encoder compile takes minutes)
            if dynamic:
                raise ValueError("seq_mesh is exclusive with length_bucket")
            n_seq = seq_mesh.shape["seq"]
            if window_size % n_seq:
                raise ValueError(
                    f"the seq axis size ({n_seq}) must divide the frame "
                    f"count ({window_size}); pad the clip via "
                    "fit_audio_unet(divisor=...)"
                )
        window_real, t_a_real = window_size, t_a
        if waveform_lengths is not None:
            if not dynamic:
                raise ValueError("waveform_lengths requires length_bucket > 0")
            lens = np.asarray(waveform_lengths, np.int64)
            t_a_real = jnp.asarray(lens, jnp.int32)
            window_vec = (lens / self.sampling_rate * fps).astype(np.int64)
            window_real = jnp.asarray(window_vec, jnp.int32)
            window_size = int(window_vec.max())
        if dynamic:
            window_pad = int(np.ceil(window_size / length_bucket) * length_bucket)
            t_a_pad = int(np.ceil(window_pad * self.sampling_rate / fps))
            if t_a_pad < t_a:
                t_a_pad = t_a  # caller's buffer already wider; keep it
            waveform_processed = jnp.pad(
                waveform_processed, ((0, 0), (0, t_a_pad - t_a))
            )
            window_size, t_a = window_pad, t_a_pad

        def pad_frames(arr):
            if not dynamic or arr.shape[1] == window_size:
                return arr
            return jnp.pad(arr, ((0, 0), (0, window_size - arr.shape[1]), (0, 0)))

        if rng is None:
            rng = jax.random.PRNGKey(0)
        rng, lat_rng = jax.random.split(rng)

        if latents is None:
            if init_samples is None:
                latents = jax.random.normal(lat_rng, (b, window_size, c), jnp.float32)
            else:
                latents = pad_frames(jnp.asarray(init_samples, jnp.float32))
        else:
            latents = pad_frames(jnp.asarray(latents, jnp.float32))

        config = SamplerConfig(
            num_inference_steps=num_inference_steps,
            strength=strength,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            solver=solver,
            unroll=scan_unroll,
        )
        use_init = init_samples is not None
        use_mask = use_init and mask is not None
        sp = seq_mesh is not None
        chunk = (
            _auto_denoise_chunk(
                b, window_size, num_used_steps(config), config.do_cfg
            )
            if denoise_chunk is None
            else max(0, int(denoise_chunk))
        )
        if chunk >= num_used_steps(config):
            chunk = 0  # one segment == the whole chain; skip the split
        prep_fns = self._prepare_compiled(
            config.do_cfg, window_size, dynamic, sp
        )
        dn_fns = self._denoise_compiled(
            config, use_init, use_mask, save_intermediate, dynamic, chunk
        )
        if sp:
            feats_fn, encode_fn = prep_fns
        else:
            (prep_fn,) = prep_fns

        init_arg = (
            pad_frames(jnp.asarray(init_samples, jnp.float32))
            if use_init
            else jnp.zeros((b, window_size, c), jnp.float32)
        )
        mask_arg = (
            pad_frames(jnp.asarray(mask, jnp.float32))
            if use_mask
            else jnp.zeros((b, window_size, c), jnp.float32)
        )

        # length args may be scalars or (B,) vectors
        window_real_arg = jnp.asarray(window_real, jnp.int32)
        if sp:
            from jax.sharding import NamedSharding, PartitionSpec as P

            feats = feats_fn(self.params, waveform_processed)
            feats = jax.device_put(
                feats, NamedSharding(seq_mesh, P(None, "seq", None))
            )
            kv_caches, emb_table = encode_fn(self.params, feats)
            kv_caches = _shard_seq_tree(kv_caches, seq_mesh, window_size)
            latents, init_arg, mask_arg = (
                _shard_seq_tree(x, seq_mesh, window_size)
                for x in (latents, init_arg, mask_arg)
            )
        else:
            kv_caches, emb_table = prep_fn(
                self.params,
                waveform_processed,
                jnp.asarray(t_a_real, jnp.int32),
                window_real_arg,
            )
        if chunk:
            start_fn, chunk_fn, finish_fn = dn_fns
            carry, xs, init_latents, noise = start_fn(
                self.params, rng, latents, init_arg
            )
            interm_parts = []
            for i0 in range(0, num_used_steps(config), chunk):
                xs_c = jax.tree.map(lambda a: a[i0 : i0 + chunk], xs)
                carry, outs = chunk_fn(
                    self.params, carry, xs_c, kv_caches, emb_table,
                    init_latents, noise, mask_arg, window_real_arg,
                )
                if save_intermediate:
                    interm_parts.append(np.asarray(outs))
            result = finish_fn(carry)
            interms = (
                np.concatenate(interm_parts, axis=0)
                if save_intermediate
                else None
            )
        else:
            (denoise_fn,) = dn_fns
            result, interms = denoise_fn(
                self.params,
                rng,
                latents,
                kv_caches,
                emb_table,
                init_arg,
                mask_arg,
                window_real_arg,
            )
        return SAIDInferenceOutput(
            result=np.asarray(result),
            intermediates=np.asarray(interms) if save_intermediate else None,
        )

    def inference_streaming(
        self,
        waveform_processed: np.ndarray,
        window_frames: int = 3600,
        overlap_frames: int = 360,
        num_inference_steps: int = 100,
        guidance_scale: float = 2.5,
        guidance_rescale: float = 0.0,
        eta: float = 0.0,
        solver: str = "ddim",
        fps: int = 60,
        rng: Optional[jax.Array] = None,
        scan_unroll: int = 1,
        denoise_chunk: Optional[int] = None,
    ) -> SAIDInferenceOutput:
        """Windowed long-clip serving: generate a clip of ANY length as
        successive ``window_frames``-frame windows stitched through the
        masked-editing (inpainting) path.

        A capability beyond the reference, built from its own editing
        mechanism (``said/model/diffusion.py:446-456``): each window
        after the first is generated with its leading ``overlap_frames``
        frames PINNED (mask = 1) to the coefficients already produced
        for those frames — the inpainting re-noising makes the masked
        region land bit-exactly on the pinned values at the final step,
        so consecutive windows join without seams and the model
        free-generates only the new frames, conditioned on the real
        continuation context.

        Why this exists: the single-sequence path runs full self-
        attention over all T frames — O(T²) work at the head-dim-32 MXU
        ceiling and O(T·block) memory. Windowing caps both at
        ``window_frames`` (compute per clip-second becomes CONSTANT in
        clip length) at the cost of limiting the self-attention
        receptive field to one window — an approximation, but one on the
        model's own terms: training windows are far shorter than a
        window here (``dataset_voca.py:553-554``), and the audio
        cross-attention is already banded to ±(r/2+1) frames. Use the
        single-sequence path (optionally with ``seq_mesh``) when exact
        full-clip semantics matter; use this for production serving of
        long audio.

        All windows share compiles: ``prepare`` is keyed on geometry
        (one compile) and the windows after the first share one denoise
        program, so an hour-long clip costs two denoise compiles total.

        Parameters beyond :meth:`inference`'s shared ones:

        window_frames : int
            Frames per window (default 3600 = 60 s at 60 fps). Must be
            a multiple of 3 so a window spans a whole number of 16 kHz
            samples (16000/60 Hz = 800/3 samples per frame).
        overlap_frames : int
            Frames of continuation context pinned from the previous
            window (default 360 = 6 s). Larger = more context and more
            redundant compute; must satisfy 0 < overlap < window.

        The waveform must be ``process_audio``-normalized over the FULL
        clip (as the CLIs do) so every window sees identically scaled
        audio. Returns the stitched (B, total_frames, C) result;
        ``save_intermediate`` / bucketing / ``seq_mesh`` / user
        init+mask editing are not supported in this mode.
        """
        if window_frames % 3:
            raise ValueError(
                "window_frames must be a multiple of 3 (a frame is 800/3 "
                "samples at 16 kHz / 60 fps, so only 3-frame groups span "
                "whole samples)"
            )
        if not 0 < overlap_frames < window_frames:
            raise ValueError(
                f"overlap_frames ({overlap_frames}) must be in "
                f"(0, window_frames={window_frames})"
            )
        waveform_processed = np.asarray(waveform_processed)
        if waveform_processed.ndim == 1:
            waveform_processed = waveform_processed[None]
        b, t_a = waveform_processed.shape
        total_frames = int(t_a / self.sampling_rate * fps)
        c = self.model.in_channels
        if rng is None:
            rng = jax.random.PRNGKey(0)

        common = dict(
            num_inference_steps=num_inference_steps,
            guidance_scale=guidance_scale,
            guidance_rescale=guidance_rescale,
            eta=eta,
            solver=solver,
            fps=fps,
            scan_unroll=scan_unroll,
            denoise_chunk=denoise_chunk,
        )
        if total_frames <= window_frames:
            return self.inference(waveform_processed, rng=rng, **common)

        w = window_frames
        stride = w - overlap_frames
        starts = [0]
        while starts[-1] + w < total_frames:
            starts.append(min(starts[-1] + stride, total_frames - w))
        rngs = jax.random.split(rng, len(starts))
        spf = self.sampling_rate / fps  # 800/3: not an integer
        wave_len = (w * self.sampling_rate) // fps  # exact: w % 3 == 0

        out = np.zeros((b, total_frames, c), np.float32)
        covered = 0
        for k, start in enumerate(starts):
            # Sample offset rounds to the nearest sample (≤ 1/3-sample
            # shift — inaudible, and the pinned overlap region is exact
            # regardless); the slice never runs past the buffer because
            # start + w ≤ total_frames ≤ t_a·fps/sr.
            s0 = min(int(round(start * spf)), t_a - wave_len)
            wave_k = waveform_processed[:, s0 : s0 + wave_len]
            if k == 0:
                out[:, :w] = self.inference(
                    wave_k, rng=rngs[k], **common
                ).result
            else:
                kept = covered - start  # ≥ overlap; > it only at the end
                init = np.zeros((b, w, c), np.float32)
                init[:, :kept] = out[:, start:covered]
                mask = np.zeros((b, w, c), np.float32)
                mask[:, :kept] = 1.0
                res = self.inference(
                    wave_k,
                    init_samples=init,
                    mask=mask,
                    rng=rngs[k],
                    **common,
                ).result
                out[:, covered : start + w] = res[:, kept:]
            covered = start + w
        return SAIDInferenceOutput(result=out, intermediates=None)
