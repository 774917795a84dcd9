"""Batched generation over the BlendVOCA test split.

Flag-compatible with reference ``script/test_inference.py``: for each
test clip, generates ``num_repeats`` samples in chunks of
``batch_size`` and writes ``sentenceXX-{k}.csv`` per sample. All
chunks of a clip share one compiled program (same shapes), so the whole
eval sweep compiles once per distinct clip length.
"""

from __future__ import annotations

import argparse
import math
import os

import jax
import numpy as np

from said_tpu.cli._common import configure_platform, build_said_model, load_said_params
from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES, BlendVOCATestDataset
from said_tpu.models.said import SAIDPipeline, process_audio
from said_tpu.utils.audio import fit_audio_unet
from said_tpu.utils.blendshape import save_blendshape_coeffs


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Batched SAiD inference over the test split (TPU-native)"
    )
    parser.add_argument("--weights_path", type=str, default="../BlendVOCA/SAiD.pth")
    parser.add_argument("--audio_dir", type=str, default="../BlendVOCA/audio")
    parser.add_argument("--output_dir", type=str, default="../out")
    parser.add_argument("--prediction_type", type=str, default="epsilon")
    parser.add_argument("--num_steps", type=int, default=1000)
    parser.add_argument("--strength", type=float, default=1.0)
    parser.add_argument("--guidance_scale", type=float, default=2.0)
    parser.add_argument("--guidance_rescale", type=float, default=0.0)
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument(
        "--solver", type=str, default="ddim", choices=["ddim", "dpmpp_2m"],
        help="ddim = the reference's sampler; dpmpp_2m = DPM-Solver++(2M) "
             "fast multistep sampling (pair with e.g. --num_steps 25)",
    )
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--divisor_unet", type=int, default=1)
    parser.add_argument("--unet_feature_dim", type=int, default=-1)
    parser.add_argument("--device", type=str, default="", help="cpu forces the host platform; other values use the accelerator jax selects")
    parser.add_argument("--num_repeats", type=int, default=72)
    parser.add_argument("--batch_size", type=int, default=64)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dtype", type=str, default="float32", choices=["float32", "bfloat16"]
    )
    parser.add_argument(
        "--attn_impl", type=str, default="auto", choices=["auto", "dense", "flash"]
    )
    parser.add_argument(
        "--length_bucket", type=int, default=256,
        help="frame bucketing so a handful of compiled programs serve the "
             "whole sweep (0 = exact-shape compile per clip length)",
    )
    parser.add_argument(
        "--mixed_batching", action="store_true",
        help="fill batches with (clip, repeat) pairs across DIFFERENT "
             "clips (length-sorted to minimize padding) instead of "
             "repeating one clip per batch; requires --length_bucket",
    )
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    model = build_said_model(
        prediction_type=args.prediction_type,
        feature_dim=args.unet_feature_dim,
        dtype=args.dtype,
        attn_impl=args.attn_impl,
    )
    params = load_said_params(
        args.weights_path if os.path.exists(args.weights_path) else None, model,
        seed=args.seed,
    )
    pipeline = SAIDPipeline(model, params)

    dataset = BlendVOCATestDataset(audio_dir=args.audio_dir, preload=False)

    rng = jax.random.PRNGKey(args.seed)

    if args.mixed_batching:
        if args.length_bucket <= 0:
            raise SystemExit("--mixed_batching requires --length_bucket > 0")
        _run_mixed(args, pipeline, dataset, rng)
        return

    for ddx in range(len(dataset)):
        item = dataset[ddx]
        path = dataset.data_paths[ddx]
        base = os.path.splitext(os.path.basename(path.audio))[0]
        out_dir = os.path.join(args.output_dir, path.person_id)
        os.makedirs(out_dir, exist_ok=True)

        fit = fit_audio_unet(
            np.asarray(item.waveform), pipeline.sampling_rate, args.fps, args.divisor_unet
        )
        window_len = fit.window_size
        processed = process_audio(fit.waveform)

        rdx = 0
        num_chunks = math.ceil(args.num_repeats / args.batch_size)
        remainder = args.num_repeats - (num_chunks - 1) * args.batch_size
        for cdx in range(num_chunks):
            chunk = args.batch_size if cdx < num_chunks - 1 else remainder
            wav_batch = np.repeat(processed, chunk, axis=0)
            rng, step_rng = jax.random.split(rng)
            output = pipeline.inference(
                waveform_processed=wav_batch,
                num_inference_steps=args.num_steps,
                strength=args.strength,
                guidance_scale=args.guidance_scale,
                guidance_rescale=args.guidance_rescale,
                eta=args.eta,
                solver=args.solver,
                fps=args.fps,
                rng=step_rng,
                length_bucket=args.length_bucket,
            )
            for sdx in range(chunk):
                save_blendshape_coeffs(
                    output.result[sdx, :window_len],
                    BLENDSHAPE_CLASSES,
                    os.path.join(out_dir, f"{base}-{rdx}.csv"),
                )
                rdx += 1
        print(f"[{ddx + 1}/{len(dataset)}] {path.person_id}/{base}: {rdx} samples")


def _run_mixed(args, pipeline, dataset, rng):
    """Mixed-length batching: one task per (clip, repeat), length-sorted.

    Different clips share batches — a serving mode the reference cannot
    express (its loop repeats a single clip per batch); per-row masked
    numerics keep every row identical to its own unpadded run.
    """
    tasks = []  # (window_len, t_a, processed_wave, out_path)
    for ddx in range(len(dataset)):
        item = dataset[ddx]
        path = dataset.data_paths[ddx]
        base = os.path.splitext(os.path.basename(path.audio))[0]
        out_dir = os.path.join(args.output_dir, path.person_id)
        os.makedirs(out_dir, exist_ok=True)
        fit = fit_audio_unet(
            np.asarray(item.waveform), pipeline.sampling_rate, args.fps,
            args.divisor_unet,
        )
        processed = process_audio(fit.waveform)[0]
        for rdx in range(args.num_repeats):
            tasks.append(
                (fit.window_size, len(processed), processed,
                 os.path.join(out_dir, f"{base}-{rdx}.csv"))
            )

    tasks.sort(key=lambda t: t[1])  # minimize padding within a batch
    done = 0
    for lo in range(0, len(tasks), args.batch_size):
        chunk = tasks[lo : lo + args.batch_size]
        t_max = max(t[1] for t in chunk)
        wave = np.zeros((len(chunk), t_max), np.float32)
        lens = np.zeros(len(chunk), np.int64)
        for i, (_, t_a, w, _) in enumerate(chunk):
            wave[i, :t_a] = w
            lens[i] = t_a
        rng, step_rng = jax.random.split(rng)
        output = pipeline.inference(
            waveform_processed=wave,
            num_inference_steps=args.num_steps,
            strength=args.strength,
            guidance_scale=args.guidance_scale,
            guidance_rescale=args.guidance_rescale,
            eta=args.eta,
            solver=args.solver,
            fps=args.fps,
            rng=step_rng,
            length_bucket=args.length_bucket,
            waveform_lengths=lens,
        )
        for i, (window_len, _, _, out_path) in enumerate(chunk):
            save_blendshape_coeffs(
                output.result[i, :window_len], BLENDSHAPE_CLASSES, out_path
            )
        done += len(chunk)
        print(f"mixed batches: {done}/{len(tasks)} samples")


if __name__ == "__main__":
    main()
