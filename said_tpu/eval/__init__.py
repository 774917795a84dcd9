"""Evaluation metrics: FD, WInD, multimodality, beat consistency, vertex error."""

from said_tpu.eval.metrics import (
    Statistic,
    StatisticGMM,
    get_statistic,
    get_statistic_gmm,
    frechet_distance,
    wind,
    multimodality,
    beat_consistency_score,
)

__all__ = [
    "Statistic",
    "StatisticGMM",
    "get_statistic",
    "get_statistic_gmm",
    "frechet_distance",
    "wind",
    "multimodality",
    "beat_consistency_score",
]
