"""Benchmark: the full BASELINE.json metric set on one chip.

Prints one JSON line per metric (first line = the headline RTF, same
metric as round 1 for comparability):

  rtf_1000step_b1        RTF of full 1000-step CFG sampling, 10 s clip
  rtf_1000step_b1_60s    same for a 60 s clip (T=3600 self-attention)
  steps_per_sec_b1       denoise steps/sec at batch 1 (10 s clip)
  steps_per_sec_b32      denoise steps/sec at batch 32 (eval-shape clips)
  rtf_1000step_b32       aggregate RTF at batch 32
  rtf_bucketed_mixed     mixed-length bucketed batch (production serving
                         mode: one compiled program, per-row lengths)
  train_steps_per_sec    training step rate, batch 8 x window 128
                         (frozen encoder + UNet fwd/bwd + AdamW + EMA),
                         chained in one program so the measurement is
                         device-bound

RTF = audio-seconds / wall-seconds for the complete pipeline (audio
encoding + N DDIM steps with CFG, the whole chain one jitted lax.scan),
matching the reference CLI's defaults (1000 steps, guidance 2.0).
vs_baseline is against the 10x real-time north-star (BASELINE.json; the
reference repo publishes no numbers of its own).
"""

from __future__ import annotations

import json
import os
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.cache/jax_comp_cache")

import jax
import numpy as np


def _unet_step_flops(t: int, batch: int = 2) -> float:
    """Analytic FLOPs of one denoiser forward (CFG-doubled batch).

    Major terms only (matmuls/convs; norms and the W=3 banded
    cross-attention are negligible). Mirrors
    ``said_tpu/models/unet1d.py``'s structure: in-conv, 5 ResBlocks
    (two with 384-channel concat inputs), 4 transformer blocks
    (self-attention + projections + GEGLU FF + 1x1 proj_out), out-conv.
    """
    B, mc, heads, dh = batch, 192, 6, 32

    def conv3(c1, c2):
        return 2 * B * t * 3 * c1 * c2

    def dense(c1, c2):
        return 2 * B * t * c1 * c2

    def resblock(c_in):
        f = conv3(c_in, mc) + conv3(mc, mc)
        if c_in != mc:
            f += dense(c_in, mc)  # 1x1 skip
        return f

    def transformer():
        attn_proj = 6 * dense(mc, mc)  # self q,k,v,out + cross q,out
        self_attn = 2 * 2 * B * heads * t * t * dh
        ff = dense(mc, mc * 8) + dense(mc * 4, mc)  # GEGLU proj + out
        return attn_proj + self_attn + ff + dense(mc, mc)  # + proj_out

    total = conv3(32, mc) + conv3(mc, 32)
    total += 3 * resblock(mc) + 2 * resblock(2 * mc)
    total += 4 * transformer()
    return float(total)


def main() -> None:
    from said_tpu.cli._common import build_said_model, init_said_params
    from said_tpu.models.said import SAIDPipeline, process_audio

    on_tpu = jax.default_backend() == "tpu"
    num_steps = 1000 if on_tpu else 20
    dtype = "bfloat16" if on_tpu else "float32"

    model = build_said_model(dtype=dtype, attn_impl="auto")
    params = init_said_params(model, seed=0)
    pipeline = SAIDPipeline(model, params)
    sr = pipeline.sampling_rate
    rng = np.random.default_rng(0)

    def timed(batch, secs, n_iters, **kw):
        """Wall-seconds per pipeline.inference call (returns numpy, so the
        timing is a true sync point even over the axon tunnel). One warm
        call after compile lets compile-cache writes / tunnel state
        settle; best of two trial groups guards against host noise."""
        wave = rng.standard_normal((batch, int(sr * secs))).astype(np.float32)
        processed = process_audio(wave)

        def run(seed):
            return pipeline.inference(
                waveform_processed=processed,
                num_inference_steps=num_steps,
                guidance_scale=2.0,
                rng=jax.random.PRNGKey(seed),
                **kw,
            )

        run(0)  # compile
        run(0)  # settle
        best = None
        for _ in range(2 if on_tpu else 1):
            t0 = time.perf_counter()
            for i in range(n_iters):
                run(i + 1)
            wall = (time.perf_counter() - t0) / n_iters
            best = wall if best is None else min(best, wall)
        return best

    results = []

    def emit(metric, value, unit, baseline=10.0):
        results.append(
            {
                "metric": metric,
                "value": round(value, 3),
                "unit": unit,
                "vs_baseline": round(value / baseline, 3),
            }
        )

    # 1. Headline: 10 s clip, batch 1 (round-1 metric, keep comparable).
    secs_b1 = 10.0 if on_tpu else 0.5
    wall = timed(1, secs_b1, 3 if on_tpu else 1)
    emit(f"rtf_{num_steps}step_b1", secs_b1 / wall, "x_realtime")
    emit(f"steps_per_sec_b1", num_steps / wall, "steps/s", baseline=100.0)

    # 2. Long clip: 60 s (T=3600 frames) — the hard shape for attention.
    secs_long = 60.0 if on_tpu else 1.0
    wall = timed(1, secs_long, 2 if on_tpu else 1)
    emit(f"rtf_{num_steps}step_b1_60s", secs_long / wall, "x_realtime")
    # Model-FLOPs utilization of the denoise chain (analytic FLOPs over
    # the measured wall; includes the once-per-clip prepare program, so
    # it slightly UNDERSTATES the scan-region MFU). Peak: v5e bf16.
    t_frames = int(secs_long * 60)
    mfu = (
        _unet_step_flops(t_frames, batch=2) * num_steps / wall / 197e12 * 100
    )
    emit("mfu_denoise_60s_pct", mfu, "percent", baseline=100.0)

    # 3. Batch 32 at the eval-protocol clip length (~4.27 s).
    b32 = 32 if on_tpu else 2
    secs_b32 = 4.27 if on_tpu else 0.5
    wall = timed(b32, secs_b32, 2 if on_tpu else 1)
    emit(f"steps_per_sec_b32", num_steps / wall, "steps/s", baseline=100.0)
    emit(f"rtf_{num_steps}step_b32", b32 * secs_b32 / wall, "x_realtime")

    # 4. Bucketed mixed-length serving mode: one program, per-row lengths.
    bucket = 256 if on_tpu else 64
    lens_s = (3.1, 4.0, 2.4, 4.2) if on_tpu else (0.4, 0.5)
    max_s = max(lens_s)
    waves = rng.standard_normal((len(lens_s), int(sr * max_s))).astype(np.float32)
    lengths = np.array([int(sr * s) for s in lens_s])
    for i, n in enumerate(lengths):
        waves[i, n:] = 0.0
    processed = process_audio(waves)  # normalization per full row is fine here

    def run_bucketed(seed):
        return pipeline.inference(
            waveform_processed=processed,
            num_inference_steps=num_steps,
            guidance_scale=2.0,
            rng=jax.random.PRNGKey(seed),
            length_bucket=bucket,
            waveform_lengths=lengths,
        )

    run_bucketed(0)
    run_bucketed(0)  # settle
    iters = 2 if on_tpu else 1
    wall = None
    for _ in range(2 if on_tpu else 1):
        t0 = time.perf_counter()
        for i in range(iters):
            run_bucketed(i + 1)
        w = (time.perf_counter() - t0) / iters
        wall = w if wall is None else min(wall, w)
    emit("rtf_bucketed_mixed", sum(lens_s) / wall, "x_realtime")

    # 5. Training step rate (batch 8, window 128, the reference's shape).
    from jax import lax

    from said_tpu.diffusion.schedule import DiffusionSchedule
    from said_tpu.train.said_train import (
        TrainConfig,
        create_train_state,
        make_train_step,
    )

    config = TrainConfig()
    schedule = DiffusionSchedule.create(model.diffusion_steps)
    state = create_train_state(config, init_said_params(model, seed=0))
    bt, wt = (8, 128) if on_tpu else (2, 16)
    batch = {
        "waveform": jax.numpy.asarray(
            process_audio(
                rng.standard_normal((bt, (sr * wt) // 60)).astype(np.float32)
            )
        ),
        "coeffs": jax.numpy.asarray(
            rng.uniform(0, 1, (bt, wt, 32)).astype(np.float32)
        ),
        "cond": jax.numpy.ones((bt,), bool),
    }
    step_fn = make_train_step(model, schedule, config)

    n_train = 50 if on_tpu else 2

    @jax.jit
    def chain_steps(state, keys):
        def body(s, k):
            s2, metrics = step_fn(s, batch, k)
            # each step's loss depends on the previous step's FULL param
            # update, so reducing the losses forces the entire chain
            # (returning only a counter lets XLA DCE the training math)
            return s2, metrics["loss"]

        _, losses = lax.scan(body, state, keys)
        return losses.sum()

    keys = jax.random.split(jax.random.PRNGKey(0), n_train)
    float(chain_steps(state, keys))  # compile + warm
    t0 = time.perf_counter()
    float(chain_steps(state, keys))
    wall = (time.perf_counter() - t0) / n_train
    emit("train_steps_per_sec", 1.0 / wall, "steps/s", baseline=100.0)

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
