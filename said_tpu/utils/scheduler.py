"""Cyclical KL-weight annealing for VAE training (reference ``said/util/scheduler.py``)."""

from __future__ import annotations

import numpy as np


def frange_cycle_linear(
    n_iter: int,
    start: float = 0.0,
    stop: float = 1.0,
    n_cycle: int = 10,
    ratio: float = 0.5,
) -> np.ndarray:
    """Cyclical linear β schedule (Fu et al., cyclical annealing)."""
    L = np.ones(n_iter) * stop
    period = n_iter / n_cycle
    step = (stop - start) / (period * ratio)

    for c in range(n_cycle):
        v, i = start, 0
        while v <= stop and (int(i + c * period) < n_iter):
            L[int(i + c * period)] = v
            v += step
            i += 1
    return L
