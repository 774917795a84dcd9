"""Generate pseudo-GT blendshape coefficients by whole-sequence QP.

Flag-compatible with reference ``script/optimize_blendshape_coeffs.py``:
per person, build the blendshape matrix; per sentence, jointly solve
the box+smoothness QP over the full mesh sequence; save CSV.
The solver is the structured ADMM in ``said_tpu.optimize.qp`` (no
external QP library).
"""

from __future__ import annotations

import argparse
import os
import pathlib

import numpy as np

from said_tpu.data.blendvoca import (
    BLENDSHAPE_CLASSES,
    PERSON_IDS_TEST,
    PERSON_IDS_TRAIN,
    PERSON_IDS_VAL,
    SENTENCE_IDS,
    BlendVOCAPseudoGTOptDataset,
)
from said_tpu.optimize.qp import OptimizationProblemFull
from said_tpu.utils.blendshape import save_blendshape_coeffs
from said_tpu.utils.parser import parse_list


from said_tpu.cli._common import configure_platform
from said_tpu.data.assets import asset_path


def main(argv=None) -> None:

    parser = argparse.ArgumentParser(
        description="Optimize pseudo-GT blendshape coefficients (TPU-native)"
    )
    parser.add_argument("--neutrals_dir", type=str, default="../BlendVOCA/templates_head")
    parser.add_argument("--blendshapes_dir", type=str, default="../BlendVOCA/blendshapes_head")
    parser.add_argument("--mesh_seqs_dir", type=str, default="../BlendVOCA/unposedcleaneddata")
    parser.add_argument(
        "--blendshape_list_path",
        type=str,
        default=asset_path("ARKit_blendshapes.txt"),
    )
    parser.add_argument(
        "--head_idx_path", type=str, default=asset_path("FLAME_head_idx.txt")
    )
    parser.add_argument(
        "--output_dir",
        "--blendshapes_coeffs_out_dir",  # the reference's name for it
        type=str,
        default="../BlendVOCA/blendshape_coeffs",
    )
    parser.add_argument("--delta", type=float, default=0.1)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    blendshape_names = (
        parse_list(args.blendshape_list_path, str)
        if os.path.exists(args.blendshape_list_path)
        else BLENDSHAPE_CLASSES
    )
    head_idx = (
        parse_list(args.head_idx_path, int) if os.path.exists(args.head_idx_path) else None
    )

    dataset = BlendVOCAPseudoGTOptDataset(
        neutrals_dir=args.neutrals_dir,
        blendshapes_dir=args.blendshapes_dir,
        mesh_seqs_dir=args.mesh_seqs_dir,
        blendshapes_names=blendshape_names,
    )

    person_ids = PERSON_IDS_TRAIN + PERSON_IDS_VAL + PERSON_IDS_TEST
    for pid in person_ids:
        try:
            neutral, blendshapes = dataset.get_blendshapes(pid)
        except FileNotFoundError:
            continue

        neutral_vec = neutral.vertices.reshape(-1, 1)
        matrix = np.stack(
            [blendshapes[name].vertices.reshape(-1) for name in blendshape_names], axis=1
        )
        problem = OptimizationProblemFull(neutral_vec, matrix)

        out_dir = os.path.join(args.output_dir, pid)
        os.makedirs(out_dir, exist_ok=True)

        for sid in SENTENCE_IDS:
            mesh_seq = dataset.get_mesh_seq(pid, sid)
            if not mesh_seq:
                continue
            verts = [
                (m.vertices[head_idx] if head_idx else m.vertices).reshape(-1, 1)
                for m in mesh_seq
            ]
            coeffs = problem.optimize(verts, delta=args.delta)
            save_blendshape_coeffs(
                coeffs,
                blendshape_names,
                os.path.join(out_dir, f"sentence{sid:02}.csv"),
            )
            print(f"{pid}/sentence{sid:02}: {coeffs.shape[0]} frames")


if __name__ == "__main__":
    main()
