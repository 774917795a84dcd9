"""Quality metrics over BCVAE latents (reference ``said/metric/``).

- Fréchet distance: the standard FID formula
  ||μ1-μ2||² + Tr(Σ1 + Σ2 - 2(Σ1Σ2)^{1/2}) with the same eps-regularized
  matrix sqrt fallback the pytorch-fid implementation uses.
- WInD: GMM (K components) fit to both latent sets, pairwise FD between
  components, then an optimal-transport LP over component weights.
  The reference solves the LP with GLPK via cvxopt
  (``said/metric/wind.py:104-114``); here it's scipy's HiGHS — the same
  transportation LP, exact solver.
- Multimodality: mean L2 between latents of paired generations.
- Beat consistency: audio onsets (see said_tpu.utils.audio) vs kinematic
  beats from peaks of the mean-normalized |Δcoeffs|.
"""

from __future__ import annotations

import dataclasses
from typing import List

import numpy as np
from scipy import linalg

from said_tpu.utils.audio import compute_audio_beat_time


@dataclasses.dataclass
class Statistic:
    mean: np.ndarray
    cov: np.ndarray


@dataclasses.dataclass
class StatisticGMM:
    mean: np.ndarray
    cov: np.ndarray
    weight: float


def get_statistic(data: List[np.ndarray]) -> Statistic:
    arr = np.asarray(data)
    return Statistic(mean=arr.mean(axis=0), cov=np.cov(arr, rowvar=False))


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray,
    eps: float = 1e-6,
) -> float:
    """Fréchet distance between two Gaussians (pytorch-fid numerics)."""
    mu1 = np.atleast_1d(mu1)
    mu2 = np.atleast_1d(mu2)
    sigma1 = np.atleast_2d(sigma1)
    sigma2 = np.atleast_2d(sigma2)

    diff = mu1 - mu2
    covmean = linalg.sqrtm(sigma1.dot(sigma2))
    if isinstance(covmean, tuple):  # older scipy returns (sqrtm, errest)
        covmean = covmean[0]
    if not np.isfinite(covmean).all():
        offset = np.eye(sigma1.shape[0]) * eps
        covmean = linalg.sqrtm((sigma1 + offset).dot(sigma2 + offset))
        if isinstance(covmean, tuple):
            covmean = covmean[0]

    if np.iscomplexobj(covmean):
        if not np.allclose(np.diagonal(covmean).imag, 0, atol=1e-3):
            m = np.max(np.abs(covmean.imag))
            raise ValueError(f"Imaginary component {m}")
        covmean = covmean.real

    return float(
        diff.dot(diff) + np.trace(sigma1) + np.trace(sigma2) - 2 * np.trace(covmean)
    )


def get_statistic_gmm(
    data: List[np.ndarray], num_clusters: int, seed=None
) -> List[StatisticGMM]:
    from sklearn.mixture import GaussianMixture

    gm = GaussianMixture(n_components=num_clusters, random_state=seed).fit(
        np.asarray(data)
    )
    return [
        StatisticGMM(mean=gm.means_[c], cov=gm.covariances_[c], weight=gm.weights_[c])
        for c in range(num_clusters)
    ]


def wind(stats1: List[StatisticGMM], stats2: List[StatisticGMM]) -> float:
    """Wasserstein Inception Distance between two GMMs.

    Transport LP: min Σ_jk d_jk x_jk s.t. Σ_k x_jk ≤ w1_j, Σ_j x_jk ≤ w2_k,
    Σ x = 1, x ≥ 0 — exactly the constraint system the reference builds
    for GLPK; solved with scipy.optimize.linprog (HiGHS).
    """
    from scipy.optimize import linprog

    k1, k2 = len(stats1), len(stats2)
    d = np.zeros((k1, k2))
    for j in range(k1):
        for k in range(k2):
            d[j, k] = frechet_distance(
                stats1[j].mean, stats1[j].cov, stats2[k].mean, stats2[k].cov
            )

    c = d.reshape(-1)
    # rows: per-j sum ≤ w1_j; per-k sum ≤ w2_k
    a_ub = np.zeros((k1 + k2, k1 * k2))
    for j in range(k1):
        a_ub[j, j * k2 : (j + 1) * k2] = 1.0
    for k in range(k2):
        a_ub[k1 + k, k :: k2] = 1.0
    b_ub = np.array([s.weight for s in stats1] + [s.weight for s in stats2])
    a_eq = np.ones((1, k1 * k2))
    b_eq = np.ones(1)

    res = linprog(
        c, A_ub=a_ub, b_ub=b_ub, A_eq=a_eq, b_eq=b_eq, bounds=(0, None), method="highs"
    )
    if not res.success:
        raise RuntimeError(f"WInD transport LP failed: {res.message}")
    return float(res.fun)


def multimodality(
    latents_subset1: List[np.ndarray], latents_subset2: List[np.ndarray]
) -> float:
    """Mean L2 distance between paired generations' latents."""
    if len(latents_subset1) == 0 or len(latents_subset2) == 0:
        return 0.0
    return float(
        np.mean(
            np.linalg.norm(
                np.asarray(latents_subset1) - np.asarray(latents_subset2), axis=1
            )
        )
    )


def beat_consistency_score(
    list_waveform: List[np.ndarray],
    list_blendshape_coeffs: List[np.ndarray],
    sampling_rate: int,
    fps: int,
    threshold: float,
    sigma: float = 0.1,
) -> float:
    """exp(−min-dist²/2σ²) agreement between audio and kinematic beats.

    Kinematic beats: local minima of the mean-normalized coefficient
    change rate whose left/right prominence exceeds ``threshold``
    (reference ``said/metric/beat_consistency.py:39-79``).
    """
    from scipy.signal import find_peaks

    list_audio_beats = [
        compute_audio_beat_time(w, sampling_rate) for w in list_waveform
    ]

    list_diff = [np.abs(c[1:] - c[:-1]) for c in list_blendshape_coeffs]
    mac = np.mean([d.mean(0) for d in list_diff], axis=0, keepdims=True)
    list_rate = [np.mean(d / mac, axis=1) for d in list_diff]

    list_kinematic_beats = []
    for rate in list_rate:
        idx, heights = find_peaks(-rate, threshold=0)
        mask = np.logical_or(
            heights["left_thresholds"] > threshold,
            heights["right_thresholds"] > threshold,
        )
        list_kinematic_beats.append(idx[mask] / fps)

    scores = []
    for audio_beats, kin_beats in zip(list_audio_beats, list_kinematic_beats):
        s = 0.0
        if len(kin_beats) > 0 and len(audio_beats) > 0:
            dist2 = (
                np.power(audio_beats[:, None] - kin_beats[None, :], 2).min(axis=1)
            )
            s = float(np.mean(np.exp(-dist2 / (2 * sigma**2))))
        scores.append(s)
    return float(np.mean(scores))
