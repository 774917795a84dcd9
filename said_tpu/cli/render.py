"""Render a blendshape-coefficient CSV to a video with audio.

Flag-compatible with reference ``script/render.py``: loads a neutral
mesh + 32 blendshape meshes, deforms per frame, renders offscreen,
muxes with the audio. Output is an MJPEG AVI (self-contained muxer; the
environment ships no ffmpeg — pass an .avi output path). Optional
per-vertex error heatmap vs ``--target_coeffs_path``.
"""

from __future__ import annotations

import argparse
import os
import pathlib

import numpy as np

from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES
from said_tpu.render.rasterizer import Renderer, render_blendshape_coefficients
from said_tpu.render.video import write_mjpeg_avi
from said_tpu.utils.audio import load_audio
from said_tpu.utils.blendshape import load_blendshape_coeffs
from said_tpu.utils.mesh import load_mesh
from said_tpu.utils.parser import parse_list


from said_tpu.cli._common import configure_platform, str2bool
from said_tpu.data.assets import asset_path


def load_blendshape_setup(neutral_path: str, blendshapes_dir: str, names):
    neutral = load_mesh(neutral_path)
    matrix = np.stack(
        [
            load_mesh(os.path.join(blendshapes_dir, f"{n}.obj")).vertices.reshape(-1)
            for n in names
        ],
        axis=1,
    )
    return neutral, matrix


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Render the blendshape coefficients into a video (TPU-native)"
    )
    parser.add_argument("--neutral_path", type=str,
                        default="../BlendVOCA/templates_head/FaceTalk_170731_00024_TA.obj")
    parser.add_argument("--blendshapes_dir", type=str,
                        default="../BlendVOCA/blendshapes_head/FaceTalk_170731_00024_TA")
    parser.add_argument("--audio_path", type=str,
                        default="../BlendVOCA/audio/FaceTalk_170731_00024_TA/sentence01.wav")
    parser.add_argument("--blendshape_coeffs_path", type=str, default="../out.csv")
    parser.add_argument("--target_coeffs_path", type=str, default=None,
                        help="optional GT CSV for a per-vertex error heatmap")
    # Reference flag pair (script/render.py): the heatmap is gated on
    # --show_difference and reads --target_diff_blendshape_coeffs_path;
    # --target_coeffs_path above is this framework's one-flag shorthand.
    parser.add_argument("--show_difference", type=str2bool, default=False)
    parser.add_argument("--target_diff_blendshape_coeffs_path", type=str,
                        default=None)
    parser.add_argument("--save_images", type=str2bool, default=False,
                        help="also dump each rendered frame as a PNG")
    parser.add_argument("--output_images_dir", type=str, default="../render_images")
    parser.add_argument("--blendshape_list_path", type=str,
                        default=asset_path("ARKit_blendshapes.txt"))
    parser.add_argument("--output_path", type=str, default="../out.avi")
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--max_diff", type=float, default=0.001)
    parser.add_argument("--width", type=int, default=800)
    parser.add_argument("--height", type=int, default=800)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    names = (
        parse_list(args.blendshape_list_path, str)
        if os.path.exists(args.blendshape_list_path)
        else BLENDSHAPE_CLASSES
    )

    neutral, matrix = load_blendshape_setup(
        args.neutral_path, args.blendshapes_dir, names
    )
    coeffs = load_blendshape_coeffs(args.blendshape_coeffs_path)
    target_path = args.target_coeffs_path or (
        args.target_diff_blendshape_coeffs_path if args.show_difference else None
    )
    target = load_blendshape_coeffs(target_path) if target_path else None
    if target is not None:
        n = min(len(coeffs), len(target))
        coeffs, target = coeffs[:n], target[:n]

    renderer = Renderer(width=args.width, height=args.height)
    frames = render_blendshape_coefficients(
        renderer, neutral, matrix, coeffs, target, max_diff=args.max_diff
    )

    audio = load_audio(args.audio_path, 16000) if os.path.exists(args.audio_path) else None
    write_mjpeg_avi(args.output_path, frames, args.fps, audio, 16000)
    print(f"wrote {len(frames)} frames → {args.output_path}")

    if args.save_images:
        from PIL import Image

        os.makedirs(args.output_images_dir, exist_ok=True)
        for idx, frame in enumerate(frames):
            Image.fromarray(frame).save(
                os.path.join(args.output_images_dir, f"{idx}.png")
            )
        print(f"wrote {len(frames)} PNGs → {args.output_images_dir}")


if __name__ == "__main__":
    main()
