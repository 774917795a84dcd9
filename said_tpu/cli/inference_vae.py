"""Reconstruct a blendshape-coefficient CSV through the BCVAE.

Flag-compatible with reference ``script/inference_vae.py``: takes the
first 120 frames, encodes/decodes (optionally without sampling noise),
writes CSV (+ optional PNG).
"""

from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np

from said_tpu.cli._common import configure_platform, load_vae, str2bool
from said_tpu.data.blendvoca import BLENDSHAPE_CLASSES
from said_tpu.utils.blendshape import (
    load_blendshape_coeffs,
    save_blendshape_coeffs,
    save_blendshape_coeffs_image,
)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Reconstruct blendshape coefficients using the VAE (TPU-native)"
    )
    parser.add_argument("--weights_path", type=str, default="../BlendVOCA/BC-VAE.pth")
    parser.add_argument(
        "--blendshape_coeffs_path", type=str,
        default="../BlendVOCA/blendshape_coeffs/FaceTalk_170731_00024_TA/sentence01.csv",
    )
    parser.add_argument("--output_path", type=str, default="../out.csv")
    parser.add_argument("--output_image_path", type=str, default="../out.png")
    parser.add_argument("--save_image", type=str2bool, default=False)
    parser.add_argument("--use_noise", type=str2bool, default=False)
    parser.add_argument("--device", type=str, default="", help="cpu forces the host platform; other values use the accelerator jax selects")
    parser.add_argument("--seed", type=int, default=0)
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    model, params, batch_stats = load_vae(args.weights_path, seed=args.seed)

    coeffs = load_blendshape_coeffs(args.blendshape_coeffs_path)[: model.seq_len][None]

    out = model.apply(
        {"params": params, "batch_stats": batch_stats},
        jnp.asarray(coeffs),
        rng=jax.random.PRNGKey(args.seed) if args.use_noise else None,
        use_noise=args.use_noise,
    )
    result = np.asarray(out.coeffs_reconst[0])

    save_blendshape_coeffs(result, BLENDSHAPE_CLASSES, args.output_path)
    if args.save_image:
        save_blendshape_coeffs_image(result, args.output_image_path)


if __name__ == "__main__":
    main()
