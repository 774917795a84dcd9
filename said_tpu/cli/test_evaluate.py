"""Evaluate generated coefficient sequences: FD, Multimodality, WInD.

Flag-compatible with reference ``script/test_evaluate.py``: sliding
120-frame windows (step 1) through the eval VAE for both generated and
ground-truth sequences (real side right-padded by 2 windows), filter to
overlapping (person, sentence, frame) keys, then FD + Multimodality +
WInD (10 GMM refits, K=5). Window encoding is batched on device —
every window of a clip goes through the VAE encoder in one call.
"""

from __future__ import annotations

import argparse
import dataclasses
import statistics
from collections import defaultdict
from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from said_tpu.cli._common import configure_platform, load_vae
from said_tpu.data.blendvoca import BlendVOCAEvalDataset
from said_tpu.eval.metrics import (
    frechet_distance,
    get_statistic,
    get_statistic_gmm,
    multimodality,
    wind,
)
from said_tpu.models.vae import BCVAE


@dataclasses.dataclass
class LatentInfo:
    person_id: str
    sentence_id: int
    frame_start: int
    latent: np.ndarray


def generate_latents_info(
    model: BCVAE,
    params,
    batch_stats,
    dataset: BlendVOCAEvalDataset,
    window_step_size: int,
    padding: int = 0,
    encode_batch: int = 256,
) -> List[LatentInfo]:
    @jax.jit
    def encode(windows):
        mean, _ = model.apply(
            {"params": params, "batch_stats": batch_stats},
            windows,
            method=BCVAE.encode,
        )
        return mean

    infos: List[LatentInfo] = []
    for idx in range(len(dataset)):
        item = dataset[idx]
        coeffs = np.asarray(item.blendshape_coeffs)
        n_windows = (coeffs.shape[0] - model.seq_len) // window_step_size + 1 - padding
        if n_windows <= 0:
            continue
        starts = [window_step_size * w for w in range(n_windows)]
        windows = np.stack([coeffs[s : s + model.seq_len] for s in starts])
        means = []
        for lo in range(0, len(windows), encode_batch):
            means.append(np.asarray(encode(jnp.asarray(windows[lo : lo + encode_batch]))))
        means = np.concatenate(means)
        for s, m in zip(starts, means):
            infos.append(
                LatentInfo(
                    person_id=item.person_id,
                    sentence_id=item.sentence_id,
                    frame_start=s,
                    latent=m,
                )
            )
    return infos


def filter_latent_infos(eval_infos, real_infos):
    real_keys = {
        (i.person_id, i.sentence_id, i.frame_start) for i in real_infos
    }
    return [
        i
        for i in eval_infos
        if (i.person_id, i.sentence_id, i.frame_start) in real_keys
    ]


def evaluate_multimodality(infos: List[LatentInfo]) -> float:
    groups = defaultdict(list)
    for i in infos:
        groups[(i.person_id, i.sentence_id, i.frame_start)].append(i.latent)
    s1, s2 = [], []
    for latents in groups.values():
        half = len(latents) // 2
        s1.extend(latents[:half])
        s2.extend(latents[half : 2 * half])
    return multimodality(s1, s2)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Evaluate the generated blendshape coefficients (TPU-native)"
    )
    parser.add_argument("--audio_dir", type=str, default="../BlendVOCA/audio")
    # Reference flag names and meanings (script/test_evaluate.py:469-480):
    # --coeffs_dir is the GENERATED coefficients, --coeffs_real_dir the
    # ground truth. --eval_dir is this framework's pre-0.4 name for the
    # generated dir; when given, --coeffs_dir keeps its legacy meaning
    # here (the real dir) so old command lines behave identically.
    parser.add_argument(
        "--coeffs_dir", type=str, default="../BlendVOCA/blendshape_coeffs"
    )
    parser.add_argument(
        "--coeffs_real_dir", type=str, default="../BlendVOCA/blendshape_coeffs"
    )
    parser.add_argument("--eval_dir", type=str, default="")
    parser.add_argument("--vae_weights_path", type=str, default="model/vae.pth")
    parser.add_argument("--blendshape_residuals_path", type=str, default="")
    parser.add_argument("--sampling_rate", type=int, default=16000)
    parser.add_argument("--fps", type=int, default=60)
    parser.add_argument("--window_step_size", type=int, default=1)
    parser.add_argument("--bc_threshold", type=float, default=0.1)
    parser.add_argument("--wind_num_clusters", type=int, default=5)
    parser.add_argument("--wind_num_repeats", type=int, default=10)
    parser.add_argument("--device", type=str, default="", help="cpu forces the host platform; other values use the accelerator jax selects")
    parser.add_argument(
        "--beat_consistency", action="store_true",
        help="also compute the beat-consistency score (the reference "
             "implements but disables it, script/test_evaluate.py:388-396)",
    )
    parser.add_argument(
        "--vertex_error", action="store_true",
        help="also compute the max vertex error (requires "
             "--blendshape_residuals_path)",
    )
    parser.add_argument("--compilation_cache_dir", type=str, default="",
                        help="persistent XLA compile cache dir "
                             "(default ~/.cache/said_tpu/jax_comp_cache; "
                             "'none' disables)")
    args = parser.parse_args(argv)
    configure_platform(getattr(args, "device", ""),
                       getattr(args, "compilation_cache_dir", ""))

    model, params, batch_stats = load_vae(args.vae_weights_path)

    if args.eval_dir:  # legacy flag pair: --eval_dir gen, --coeffs_dir real
        generated_dir, real_dir = args.eval_dir, args.coeffs_dir
    else:  # reference flag pair: --coeffs_dir gen, --coeffs_real_dir real
        generated_dir, real_dir = args.coeffs_dir, args.coeffs_real_dir

    eval_dataset = BlendVOCAEvalDataset(
        audio_dir=args.audio_dir,
        blendshape_coeffs_dir=generated_dir,
        blendshape_deltas_path=args.blendshape_residuals_path or None,
        sampling_rate=args.sampling_rate,
        preload=False,
    )
    real_dataset = BlendVOCAEvalDataset(
        audio_dir=args.audio_dir,
        blendshape_coeffs_dir=real_dir,
        blendshape_deltas_path=args.blendshape_residuals_path or None,
        sampling_rate=args.sampling_rate,
        preload=False,
    )

    eval_infos = generate_latents_info(
        model, params, batch_stats, eval_dataset, args.window_step_size
    )
    real_infos = generate_latents_info(
        model, params, batch_stats, real_dataset, args.window_step_size, padding=2
    )
    eval_infos = filter_latent_infos(eval_infos, real_infos)

    eval_latents = [i.latent for i in eval_infos]
    real_latents = [i.latent for i in real_infos]

    es, rs = get_statistic(eval_latents), get_statistic(real_latents)
    fd = frechet_distance(es.mean, es.cov, rs.mean, rs.cov)

    mm = evaluate_multimodality(eval_infos)

    scores = []
    for _ in range(args.wind_num_repeats):
        e_stats = get_statistic_gmm(eval_latents, args.wind_num_clusters)
        r_stats = get_statistic_gmm(real_latents, args.wind_num_clusters)
        scores.append(wind(e_stats, r_stats))
    wind_stat = {
        "mean": statistics.mean(scores),
        "std": statistics.stdev(scores) if len(scores) > 1 else 0.0,
    }

    metrics = {
        "frechet_distance": fd,
        "multimodality": mm,
        "wind": wind_stat,
    }

    if args.beat_consistency:
        from said_tpu.eval.metrics import beat_consistency_score

        real_keys = {
            (real_dataset.data_paths[i].person_id, real_dataset.data_paths[i].sentence_id)
            for i in range(len(real_dataset))
        }
        waves, coeffs_list = [], []
        for i in range(len(eval_dataset)):
            dp = eval_dataset.data_paths[i]
            if (dp.person_id, dp.sentence_id) not in real_keys:
                continue
            item = eval_dataset[i]
            waves.append(np.asarray(item.waveform))
            coeffs_list.append(np.asarray(item.blendshape_coeffs))
        metrics["beat_consistency"] = beat_consistency_score(
            waves, coeffs_list, args.sampling_rate, args.fps, args.bc_threshold
        )

    if args.vertex_error and args.blendshape_residuals_path:
        deltas, real_coeffs = {}, {}
        for i in range(len(real_dataset)):
            item = real_dataset[i]
            deltas[item.person_id] = item.blendshape_delta
            real_coeffs[(item.person_id, item.sentence_id)] = item.blendshape_coeffs
        errors = []
        for i in range(len(eval_dataset)):
            item = eval_dataset[i]
            gt = real_coeffs.get((item.person_id, item.sentence_id))
            if gt is None:
                continue
            delta = deltas[item.person_id]  # (K, V, 3)
            n = min(gt.shape[0], item.blendshape_coeffs.shape[0])
            cdiff = np.einsum(
                "tc,cvi->tvi", gt[:n] - item.blendshape_coeffs[:n], delta
            )
            vdiff = np.sqrt((cdiff**2).sum(axis=(1, 2)))
            errors.append(float(vdiff.max()))
        if errors:
            metrics["vertex_error"] = float(np.mean(errors))

    print(metrics)


if __name__ == "__main__":
    main()
