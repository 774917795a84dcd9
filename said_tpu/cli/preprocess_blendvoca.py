"""Build per-person neutral + blendshape meshes from VOCASET templates.

Flag-compatible with reference ``script/preprocess_blendvoca.py``: crop
each template to the FLAME head vertex subset, add the per-blendshape
deltas, save neutral and 32 blendshape OBJs per person.
"""

from __future__ import annotations

import argparse
import os
import pathlib

from said_tpu.data.blendvoca import (
    BLENDSHAPE_CLASSES,
    PERSON_IDS_TEST,
    PERSON_IDS_TRAIN,
    PERSON_IDS_VAL,
)
from said_tpu.utils.blendshape import load_blendshape_deltas
from said_tpu.utils.mesh import create_mesh, get_submesh, load_mesh, save_mesh
from said_tpu.utils.parser import parse_list


from said_tpu.cli._common import configure_platform
from said_tpu.data.assets import asset_path


def main(argv=None) -> None:

    parser = argparse.ArgumentParser(
        description="Preprocess the BlendVOCA blendshape meshes (TPU-native)"
    )
    parser.add_argument("--templates_dir", type=str, default="../VOCA_Template")
    parser.add_argument(
        "--blendshape_deltas_path",
        "--blendshape_residuals_path",  # the reference's name for it
        type=str,
        default="../BlendVOCA/blendshape_deltas.pickle",
    )
    parser.add_argument(
        "--head_idx_path", type=str, default=asset_path("FLAME_head_idx.txt")
    )
    # Reference layout (script/preprocess_blendvoca.py:40-48): ONE parent
    # dir holding templates_head/ and blendshapes_head/. The explicit
    # two-dir flags below override it.
    parser.add_argument("--blendshapes_out_dir", type=str, default="")
    parser.add_argument("--neutrals_dir", type=str, default="../BlendVOCA/templates_head")
    parser.add_argument("--blendshapes_dir", type=str, default="../BlendVOCA/blendshapes_head")
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))
    if args.blendshapes_out_dir:
        args.neutrals_dir = os.path.join(args.blendshapes_out_dir, "templates_head")
        args.blendshapes_dir = os.path.join(args.blendshapes_out_dir, "blendshapes_head")

    head_idx = parse_list(args.head_idx_path, int)
    blendshape_deltas = load_blendshape_deltas(args.blendshape_deltas_path)
    person_ids = PERSON_IDS_TRAIN + PERSON_IDS_VAL + PERSON_IDS_TEST

    os.makedirs(args.neutrals_dir, exist_ok=True)
    for pid in person_ids:
        template_path = os.path.join(args.templates_dir, f"{pid}.ply")
        if not os.path.exists(template_path) or pid not in blendshape_deltas:
            continue  # partial checkouts are common; process what exists
        template = load_mesh(template_path)
        sub = get_submesh(template.vertices, template.faces, head_idx)

        save_mesh(
            create_mesh(sub.vertices, sub.faces),
            os.path.join(args.neutrals_dir, f"{pid}.obj"),
        )

        out_dir = os.path.join(args.blendshapes_dir, pid)
        os.makedirs(out_dir, exist_ok=True)
        deltas = blendshape_deltas[pid]
        for name in BLENDSHAPE_CLASSES:
            save_mesh(
                create_mesh(sub.vertices + deltas[name], sub.faces),
                os.path.join(out_dir, f"{name}.obj"),
            )
        print(f"processed {pid}")


if __name__ == "__main__":
    main()
