"""Single-WAV → blendshape-coefficient CSV inference.

Flag-compatible with the reference ``script/inference.py`` (same
defaults: 1000 steps, guidance 2.0, eta 0, fps 60; supports
``--init_sample_path``/``--mask_path`` masked editing and
intermediate-output dumps).
"""

from __future__ import annotations

import argparse
import os

import jax
import numpy as np

from said_tpu.cli._common import configure_platform, build_said_model, load_said_params, str2bool
from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES
from said_tpu.models.said import SAIDPipeline, process_audio
from said_tpu.utils.audio import fit_audio_unet, load_audio
from said_tpu.utils.blendshape import (
    load_blendshape_coeffs,
    save_blendshape_coeffs,
    save_blendshape_coeffs_image,
)


def add_arguments(parser: argparse.ArgumentParser) -> None:
    parser.add_argument("--weights_path", type=str, default="../BlendVOCA/SAiD.pth")
    parser.add_argument(
        "--audio_path",
        type=str,
        default="../BlendVOCA/audio/FaceTalk_170731_00024_TA/sentence01.wav",
    )
    parser.add_argument("--output_path", type=str, default="../out.csv")
    parser.add_argument("--output_image_path", type=str, default="../out.png")
    parser.add_argument("--intermediate_dir", type=str, default="../interm")
    parser.add_argument("--prediction_type", type=str, default="epsilon")
    parser.add_argument("--save_image", type=str2bool, default=False)
    parser.add_argument("--save_intermediate", type=str2bool, default=False)
    parser.add_argument("--num_steps", type=int, default=1000)
    parser.add_argument("--strength", type=float, default=1.0)
    parser.add_argument("--guidance_scale", type=float, default=2.0)
    parser.add_argument("--guidance_rescale", type=float, default=0.0)
    parser.add_argument("--eta", type=float, default=0.0)
    parser.add_argument(
        "--solver", type=str, default="ddim", choices=["ddim", "dpmpp_2m"],
        help="ddim = the reference's sampler; dpmpp_2m = DPM-Solver++(2M) "
             "multistep (a second-order ODE solver: far fewer steps for "
             "the same error, e.g. --num_steps 10-25; deterministic, so "
             "--eta must be 0)",
    )
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--divisor_unet", type=int, default=1)
    parser.add_argument("--unet_feature_dim", type=int, default=-1)
    parser.add_argument("--device", type=str, default="", help="cpu forces the host platform; other values use the accelerator jax selects")
    parser.add_argument("--init_sample_path", type=str)
    parser.add_argument("--mask_path", type=str)
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument(
        "--dtype", type=str, default="float32", choices=["float32", "bfloat16"]
    )
    parser.add_argument(
        "--attn_impl", type=str, default="auto",
        choices=["auto", "dense", "flash", "flash_sp"],
    )
    parser.add_argument(
        "--seq_shards", type=int, default=0,
        help="sequence-parallel sampling: shard the frame axis over this "
             "many devices (pads the clip so the shard count divides the "
             "frame count; uses the flash_sp attention partitioning rule)",
    )
    parser.add_argument(
        "--profile_dir", type=str, default="",
        help="capture a jax profiler trace of the sampling run "
             "(view with tensorboard or xprof)",
    )
    parser.add_argument(
        "--length_bucket", type=int, default=0,
        help="pad to multiples of this many frames so one compiled program "
             "serves all clip lengths (0 = exact-shape compile per length)",
    )
    parser.add_argument(
        "--streaming_window", type=int, default=0,
        help="serve the clip as overlapping windows of this many frames "
             "stitched through the inpainting path (bounded memory and "
             "constant per-second compute for arbitrarily long audio; "
             "limits self-attention context to one window). 0 = off; "
             "must be a multiple of 3",
    )
    parser.add_argument(
        "--streaming_overlap", type=int, default=360,
        help="frames of continuation context pinned from the previous "
             "window when --streaming_window is on",
    )
    parser.add_argument(
        "--denoise_chunk", type=int, default=-1,
        help="denoise steps per device dispatch; -1 auto-splits long "
             "clips so no single dispatch runs long enough to trip the "
             "TPU worker's liveness machinery (bit-identical numerics), "
             "0 forces one dispatch, >0 forces that segment size",
    )


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Inference the lipsync using the SAiD model (TPU-native)"
    )
    add_arguments(parser)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    seq_mesh = None
    divisor = args.divisor_unet
    attn_impl = args.attn_impl
    if args.seq_shards > 1:
        import math

        from jax.sharding import Mesh

        if attn_impl not in ("auto", "flash_sp"):
            raise SystemExit(
                f"--seq_shards requires the flash_sp attention partitioning "
                f"rule; drop --attn_impl {attn_impl} (or --seq_shards)"
            )
        devices = jax.devices()
        if len(devices) < args.seq_shards:
            raise SystemExit(
                f"--seq_shards {args.seq_shards} > {len(devices)} devices"
            )
        seq_mesh = Mesh(np.asarray(devices[: args.seq_shards]), ("seq",))
        attn_impl = "flash_sp"
        divisor = math.lcm(args.divisor_unet, args.seq_shards)

    model = build_said_model(
        prediction_type=args.prediction_type,
        feature_dim=args.unet_feature_dim,
        dtype=args.dtype,
        attn_impl=attn_impl,
    )
    params = load_said_params(
        args.weights_path if os.path.exists(args.weights_path) else None, model,
        seed=args.seed,
    )
    pipeline = SAIDPipeline(model, params)

    waveform = load_audio(args.audio_path, pipeline.sampling_rate)
    fit = fit_audio_unet(waveform, pipeline.sampling_rate, args.fps, divisor)
    waveform_processed = process_audio(fit.waveform)
    window_len = fit.window_size

    init_samples = None
    if args.init_sample_path:
        init_samples = load_blendshape_coeffs(args.init_sample_path)[None]
    mask = None
    if args.mask_path:
        mask = load_blendshape_coeffs(args.mask_path)[None]

    if args.profile_dir:
        jax.profiler.start_trace(args.profile_dir)
    if args.streaming_window > 0:
        for bad in (
            ("--init_sample_path", init_samples),
            ("--mask_path", mask),
            ("--save_intermediate", args.save_intermediate or None),
            ("--length_bucket", args.length_bucket or None),
            ("--seq_shards", seq_mesh),
        ):
            if bad[1] is not None:
                raise SystemExit(
                    f"{bad[0]} is not supported with --streaming_window"
                )
        if args.strength != 1.0:
            raise SystemExit("--strength is not supported with --streaming_window")
        output = pipeline.inference_streaming(
            waveform_processed=waveform_processed,
            window_frames=args.streaming_window,
            overlap_frames=args.streaming_overlap,
            num_inference_steps=args.num_steps,
            guidance_scale=args.guidance_scale,
            guidance_rescale=args.guidance_rescale,
            eta=args.eta,
            solver=args.solver,
            fps=args.fps,
            rng=jax.random.PRNGKey(args.seed),
            denoise_chunk=None if args.denoise_chunk < 0 else args.denoise_chunk,
        )
    else:
        output = pipeline.inference(
            waveform_processed=waveform_processed,
            init_samples=init_samples,
            mask=mask,
            num_inference_steps=args.num_steps,
            strength=args.strength,
            guidance_scale=args.guidance_scale,
            guidance_rescale=args.guidance_rescale,
            eta=args.eta,
            solver=args.solver,
            fps=args.fps,
            rng=jax.random.PRNGKey(args.seed),
            save_intermediate=args.save_intermediate,
            length_bucket=args.length_bucket,
            seq_mesh=seq_mesh,
            denoise_chunk=None if args.denoise_chunk < 0 else args.denoise_chunk,
        )

    if args.profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace → {args.profile_dir}")

    result = output.result[0, :window_len]
    save_blendshape_coeffs(result, BLENDSHAPE_CLASSES, args.output_path)

    if args.save_image:
        save_blendshape_coeffs_image(result, args.output_image_path)

    if args.save_intermediate:
        os.makedirs(args.intermediate_dir, exist_ok=True)
        interms = output.intermediates  # (K, B, T, C), ordered start→end
        for t in range(interms.shape[0]):
            step = interms.shape[0] - t  # reference numbers from the end
            coeffs = np.clip(interms[t][0, :window_len], 0.0, 1.0)
            save_blendshape_coeffs(
                coeffs,
                BLENDSHAPE_CLASSES,
                os.path.join(args.intermediate_dir, f"{step}.csv"),
            )
            save_blendshape_coeffs_image(
                coeffs, os.path.join(args.intermediate_dir, f"{step}.png")
            )


if __name__ == "__main__":
    main()
