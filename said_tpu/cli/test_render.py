"""Render every generated CSV in an eval directory to video.

Flag-compatible with reference ``script/test_render.py``. The reference
needed a shell wrapper restarting Python per repeat index to dodge a
pyrender memory leak (``script/test_render.sh``); the native rasterizer
has no such leak, so one process renders everything.
"""

from __future__ import annotations

import argparse
import os
import pathlib
import re

from said_tpu.cli.render import load_blendshape_setup
from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES, PERSON_IDS_TEST, SENTENCE_IDS
from said_tpu.render.rasterizer import Renderer, render_blendshape_coefficients
from said_tpu.render.video import write_mjpeg_avi
from said_tpu.utils.audio import load_audio
from said_tpu.utils.blendshape import load_blendshape_coeffs
from said_tpu.utils.parser import parse_list


from said_tpu.cli._common import configure_platform
from said_tpu.data.assets import asset_path


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Render all evaluation outputs (TPU-native)"
    )
    parser.add_argument("--audio_dir", type=str, default="../BlendVOCA/audio")
    parser.add_argument("--coeffs_dir", type=str, default="../out")
    parser.add_argument(
        "--neutrals_dir",
        "--neutral_dir",  # the reference's name for it
        type=str,
        default="../BlendVOCA/templates_head",
    )
    parser.add_argument("--blendshapes_dir", type=str, default="../BlendVOCA/blendshapes_head")
    parser.add_argument("--blendshape_list_path", type=str,
                        default=asset_path("ARKit_blendshapes.txt"))
    parser.add_argument("--output_dir", type=str, default="../render_out")
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--repeat_index", type=int, default=-1,
                        help="render only sentenceXX-<idx>.csv files (-1 = all)")
    parser.add_argument("--repeat_regex", type=str, default="(-.+)?",
                        help="regex the part of the filename between "
                             "sentenceXX and .csv must fully match "
                             "(reference script/test_render.py:62-67)")
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
    renderer = Renderer()

    for pid in PERSON_IDS_TEST:
        coeffs_dir = os.path.join(args.coeffs_dir, pid)
        if not os.path.isdir(coeffs_dir):
            continue
        neutral, matrix = load_blendshape_setup(
            os.path.join(args.neutrals_dir, f"{pid}.obj"),
            os.path.join(args.blendshapes_dir, pid),
            names,
        )
        out_dir = os.path.join(args.output_dir, pid)
        os.makedirs(out_dir, exist_ok=True)
        for sid in SENTENCE_IDS:
            audio_path = os.path.join(args.audio_dir, pid, f"sentence{sid:02}.wav")
            audio = load_audio(audio_path, 16000) if os.path.exists(audio_path) else None
            for fname in sorted(os.listdir(coeffs_dir)):
                base = f"sentence{sid:02}"
                if not fname.startswith(base) or not fname.endswith(".csv"):
                    continue
                if args.repeat_index >= 0 and fname != f"{base}-{args.repeat_index}.csv":
                    continue
                middle = fname[len(base) : -len(".csv")]
                if re.fullmatch(args.repeat_regex, middle) is None:
                    continue
                coeffs = load_blendshape_coeffs(os.path.join(coeffs_dir, fname))
                frames = render_blendshape_coefficients(
                    renderer, neutral, matrix, coeffs
                )
                out_path = os.path.join(out_dir, fname.replace(".csv", ".avi"))
                write_mjpeg_avi(out_path, frames, args.fps, audio, 16000)
                print(f"rendered {pid}/{fname}")


if __name__ == "__main__":
    main()
