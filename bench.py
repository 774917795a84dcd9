"""Benchmark: real-time factor of full-chain SAiD sampling on one chip.

Measures RTF = audio-seconds / wall-seconds for the complete inference
pipeline (audio encoding + N DDIM steps with CFG, the whole chain one
jitted lax.scan), matching the reference CLI's default protocol
(1000 steps, guidance 2.0 → CFG-doubled batch).

Prints ONE JSON line:
  {"metric": "rtf_1000step_b1", "value": R, "unit": "x_realtime",
   "vs_baseline": R / 10}
vs_baseline is against the 10× real-time north-star target
(BASELINE.json; the reference repo publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import numpy as np


def main() -> None:
    from said_tpu.cli._common import build_said_model, init_said_params
    from said_tpu.models.said import SAIDPipeline, process_audio

    on_tpu = jax.default_backend() == "tpu"
    audio_secs = 10.0 if on_tpu else 0.5
    num_steps = 1000 if on_tpu else 20
    dtype = "bfloat16" if on_tpu else "float32"

    model = build_said_model(dtype=dtype, attn_impl="auto")
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)

    sr = pipeline.sampling_rate
    rng = np.random.default_rng(0)
    wave = rng.standard_normal((1, int(sr * audio_secs))).astype(np.float32)
    processed = process_audio(wave)

    def run(seed):
        out = pipeline.inference(
            waveform_processed=processed,
            num_inference_steps=num_steps,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(seed),
        )
        return out

    run(0)  # compile
    t0 = time.perf_counter()
    n_iters = 3 if on_tpu else 1
    for i in range(n_iters):
        run(i + 1)
    wall = (time.perf_counter() - t0) / n_iters

    rtf = audio_secs / wall
    result = {
        "metric": f"rtf_{num_steps}step_b1",
        "value": round(rtf, 3),
        "unit": "x_realtime",
        "vs_baseline": round(rtf / 10.0, 3),
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
