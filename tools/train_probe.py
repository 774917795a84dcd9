"""Train-step rate at the bench shape (batch 8 x window 128), isolating
the feature-extractor conv formulation:

  SAID_CONV_NNCONV=1   flax nn.Conv (XLA conv lowering)
  SAID_CONV_DISABLE=1  jnp twin (strided-slice matmuls)
  (neither)            fused Pallas strided_conv_gelu kernel

Usage: PYTHONPATH=/root/repo:/root/.axon_site python tools/train_probe.py
"""

from __future__ import annotations

import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import numpy as np
from jax import lax


def main():
    import jax.numpy as jnp

    from said_tpu.cli._common import fast_init
    from said_tpu.cli._common import build_said_model
    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.models.said import process_audio
    from said_tpu.train.said_train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    on_tpu = jax.default_backend() == "tpu"
    dtype = "bfloat16" if on_tpu else "float32"
    model = build_said_model(dtype=dtype, attn_impl="auto")
    config = TrainConfig()
    schedule = DiffusionSchedule.create(model.diffusion_steps)
    state = create_train_state(config, fast_init(model, seed=0))
    rng = np.random.default_rng(0)
    bt, wt = (8, 128) if on_tpu else (2, 16)
    sr = 16000
    batch = {
        "waveform": jnp.asarray(
            process_audio(
                rng.standard_normal((bt, (sr * wt) // 60)).astype(np.float32)
            )
        ),
        "coeffs": jnp.asarray(rng.uniform(0, 1, (bt, wt, 32)).astype(np.float32)),
        "cond": jnp.ones((bt,), bool),
    }
    step_fn = make_train_step(model, schedule, config)
    n_train = 20 if on_tpu else 2

    @jax.jit
    def chain_steps(state, keys):
        def body(s, k):
            s2, metrics = step_fn(s, batch, k)
            return s2, metrics["loss"]

        _, losses = lax.scan(body, state, keys)
        return losses.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), n_train)
    t0 = time.perf_counter()
    float(chain_steps(state, keys))
    print(f"compile+warm {time.perf_counter() - t0:.1f}s", flush=True)
    best = None
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain_steps(state, keys))
        w = (time.perf_counter() - t0) / n_train
        best = w if best is None else min(best, w)
    mode = (
        "nn.Conv" if os.environ.get("SAID_CONV_NNCONV")
        else "jnp_twin" if os.environ.get("SAID_CONV_DISABLE")
        else "pallas"
    )
    print(f"conv={mode}: {best*1e3:.2f} ms/step  ({1.0/best:.1f} steps/s)")


if __name__ == "__main__":
    main()
