"""Shared CLI plumbing: model construction and checkpoint loading."""

from __future__ import annotations

import os
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from said_tpu.models.said import SAID
from said_tpu.models.vae import BCVAE


def configure_compilation_cache(cache_dir: str = "") -> str:
    """Enable jax's persistent compilation cache for this process.

    Long-clip programs cost 95-400 s to compile cold on a single host
    core; with the cache a second invocation deserializes the compiled
    executable in seconds. Resolution order: explicit ``cache_dir``
    (the CLIs' ``--compilation_cache_dir``) → the conventional
    ``JAX_COMPILATION_CACHE_DIR`` env var (set through the config API
    too, since some jax builds ignore the env var) →
    ``~/.cache/said_tpu/jax_comp_cache``. Pass ``none``/``off`` to
    disable. Returns the directory used ('' when disabled).
    """
    want = (cache_dir or "").strip()
    if want.lower() in ("none", "off", "0", "disable", "disabled"):
        return ""
    d = want or os.environ.get("JAX_COMPILATION_CACHE_DIR", "") or os.path.join(
        os.path.expanduser("~"), ".cache", "said_tpu", "jax_comp_cache"
    )
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
    except Exception:
        return ""
    # jax only persists entries whose compile took >1 s by default;
    # mirror the conventional env knob through the config API (ignored
    # as an env var by some builds) so tests/tiny-program users can
    # lower it.
    mct = os.environ.get("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "")
    if mct:
        try:
            jax.config.update(
                "jax_persistent_cache_min_compile_time_secs", float(mct)
            )
        except Exception:
            pass
    return d


def configure_platform(device: str = "", compilation_cache_dir: str = "") -> None:
    """Select the jax platform BEFORE first backend use.

    This jax build ignores the ``JAX_PLATFORMS`` env var, so the CLIs
    honor it (and the reference-compatible ``--device`` flag, e.g.
    ``--device cpu``) through the config API instead. ``cuda:0``-style
    values from reference commands fall through to the default backend
    (the accelerator jax selects). No-op once a backend is initialized.

    Also enables the persistent compilation cache (see
    :func:`configure_compilation_cache`) for every CLI.
    """
    configure_compilation_cache(compilation_cache_dir)
    want = (device or os.environ.get("JAX_PLATFORMS", "")).strip().lower()
    if want.startswith("cpu"):
        try:
            jax.config.update("jax_platforms", "cpu")
        except Exception:
            pass  # backend already initialized; use whatever exists
    # honor the conventional virtual-device-count hint too (also an
    # env var this jax build ignores), so multi-device CPU runs of the
    # CLIs (e.g. --mesh_seq on a virtual mesh) work as documented
    import re

    m = re.search(
        r"xla_force_host_platform_device_count=(\d+)",
        os.environ.get("XLA_FLAGS", ""),
    )
    if m:
        try:
            jax.config.update("jax_num_cpu_devices", int(m.group(1)))
        except Exception:
            pass


def str2bool(v) -> bool:
    """Argparse bool that actually parses falsy strings.

    The reference CLIs use ``type=bool`` (e.g.
    ``script/inference.py:61``), under which ``--save_image False``
    silently evaluates True (any non-empty string is truthy). This
    keeps the same ``--flag True/False`` surface but parses
    false/0/no/off correctly.
    """
    if isinstance(v, bool):
        return v
    s = str(v).strip().lower()
    if s in ("true", "1", "yes", "y", "on"):
        return True
    if s in ("false", "0", "no", "n", "off", ""):
        return False
    import argparse

    raise argparse.ArgumentTypeError(f"expected a boolean, got {v!r}")


def build_said_model(
    prediction_type: str = "epsilon",
    feature_dim: int = -1,
    dtype: str = "float32",
    attn_impl: str = "auto",
    remat: bool = False,
) -> SAID:
    """Construct the SAID model with CLI-level options.

    attn_impl 'auto': banded cross-attention everywhere; dense
    self-attention on CPU, Pallas flash on TPU for long sequences.
    """
    dt = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}[dtype]
    if dt == jnp.float32:
        # Full-precision matmuls/convs in fp32 mode (jax's default allows
        # reduced-precision accumulation, which breaks <1e-3 CSV parity).
        jax.config.update("jax_default_matmul_precision", "highest")
    if attn_impl == "auto":
        self_impl = "flash" if jax.default_backend() == "tpu" else "dense"
        cross_impl = "banded"
    elif attn_impl == "dense":
        self_impl, cross_impl = "dense", "dense"
    else:
        self_impl, cross_impl = attn_impl, "banded"
    return SAID(
        feature_dim=feature_dim,
        prediction_type=prediction_type,
        dtype=dt,
        self_attn_impl=self_impl,
        cross_attn_impl=cross_impl,
        # frame-sharded mode shards the audio encoder too (sharded
        # prepare); otherwise the encoder's own router handles it
        encoder_attn_impl="flash_sp" if attn_impl == "flash_sp" else "auto",
        remat=remat,
    )


def init_said_params(model: SAID, seed: int = 0):
    """Random-initialize all SAID params (used when no weights given).

    The denoise and audio-embedding paths touch disjoint submodules, so
    both are initialized and their param trees merged.
    """
    rng = jax.random.PRNGKey(seed)
    wave = jnp.zeros((1, 3200), jnp.float32)
    sample = jnp.zeros((1, 12, model.in_channels), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    emb_dim = model.feature_dim if model.feature_dim > 0 else model.audio_config.hidden_size
    ctx = jnp.zeros((1, 12, emb_dim), jnp.float32)

    params = dict(model.init({"params": rng}, sample, t, ctx)["params"])
    audio_params = dict(
        model.init({"params": rng}, wave, 12, method=SAID.get_audio_embedding)["params"]
    )
    for k, v in audio_params.items():
        params.setdefault(k, v)
    return params


def fast_init(model: SAID, seed: int = 0):
    """Shape-faithful param init with NO device compile.

    ``jax.eval_shape`` over the real flax init gives the exact tree
    structure/shapes/dtypes of :func:`init_said_params`, then host-side
    numpy fills the values (zeros for biases, ones for norm scales,
    0.02-std normal elsewhere) and the tree is committed to the device
    once. Used where init latency matters but weight VALUES don't
    (bench timing, the driver's multichip dryrun, probes): the regular
    init costs ~3 min compiling two init programs over a remote-attached
    TPU; this costs milliseconds.
    """
    import numpy as _np

    rng0 = jax.random.PRNGKey(seed)

    def shapes():
        wave = jnp.zeros((1, 3200), jnp.float32)
        sample = jnp.zeros((1, 12, model.in_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.int32)
        emb_dim = (
            model.feature_dim
            if model.feature_dim > 0
            else model.audio_config.hidden_size
        )
        ctx = jnp.zeros((1, 12, emb_dim), jnp.float32)
        a = jax.eval_shape(
            lambda r, s, tt, c: model.init({"params": r}, s, tt, c),
            rng0, sample, t, ctx,
        )["params"]
        b = jax.eval_shape(
            lambda r, w: model.init(
                {"params": r}, w, 12, method=SAID.get_audio_embedding
            ),
            rng0, wave,
        )["params"]
        merged = dict(a)
        for k, v in b.items():
            merged.setdefault(k, v)
        return merged

    nprng = _np.random.default_rng(seed)

    def materialize(path, leaf):
        name = "/".join(str(p.key) for p in path)
        if leaf.ndim == 0 or "bias" in name:
            return _np.zeros(leaf.shape, leaf.dtype)
        if "scale" in name or "norm" in name.rsplit("/", 1)[-1]:
            return _np.ones(leaf.shape, leaf.dtype)
        return (nprng.standard_normal(leaf.shape) * 0.02).astype(leaf.dtype)

    import jax.tree_util as jtu

    host = jtu.tree_map_with_path(materialize, shapes())
    # numpy leaves would be re-transferred over a remote-attached
    # device's tunnel on EVERY jitted call (measured: 450 ms/train-step
    # vs 11 ms with device arrays) — commit the tree to the device once.
    return jax.device_put(host)


def load_said_params(weights_path: Optional[str], model: SAID, seed: int = 0):
    """Load params: torch .pth (full SAiD), HF wav2vec2 snapshot dir
    (audio encoder only, rest random — the reference's training init),
    orbax checkpoint dir, or random-init when empty."""
    if not weights_path:
        return init_said_params(model, seed)
    if os.path.isdir(weights_path):
        if any(
            os.path.exists(os.path.join(weights_path, f))
            for f in ("model.safetensors", "pytorch_model.bin")
        ):
            from said_tpu.utils.torch_import import convert_wav2vec2, load_state_dict

            params = init_said_params(model, seed)
            sd = load_state_dict(weights_path)
            # HF hub checkpoints may or may not carry the wav2vec2. prefix
            prefix = "wav2vec2." if any(k.startswith("wav2vec2.") for k in sd) else ""
            params["audio_encoder"] = convert_wav2vec2(sd, prefix=prefix)
            return params
        from said_tpu.core.checkpoint import restore_train_state

        target = init_said_params(model, seed)
        return restore_train_state(weights_path, target)
    from said_tpu.utils.torch_import import convert_said, load_state_dict

    return convert_said(load_state_dict(weights_path))


def load_vae(weights_path: Optional[str], seed: int = 0) -> Tuple[BCVAE, dict, dict]:
    """Build the BCVAE and load torch weights (or random-init)."""
    model = BCVAE()
    if weights_path and os.path.isfile(weights_path):
        from said_tpu.utils.torch_import import convert_bcvae, load_state_dict

        params, batch_stats = convert_bcvae(load_state_dict(weights_path))
        return model, params, batch_stats
    rng = jax.random.PRNGKey(seed)
    variables = model.init(
        {"params": rng}, jnp.zeros((1, 120, 32), jnp.float32), use_noise=False
    )
    return model, dict(variables["params"]), dict(variables.get("batch_stats", {}))
