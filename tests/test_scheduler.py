"""Cyclical β schedule: the vectorized form must equal the iterative one
(the published cyclical-annealing loop, reference said/util/scheduler.py)
bit for bit — including the float-accumulation cutoff at ``v <= stop``."""

import numpy as np
import pytest

from said_tpu.utils.scheduler import frange_cycle_linear


def _iterative_oracle(n_iter, start, stop, n_cycle, ratio):
    out = np.ones(n_iter) * stop
    period = n_iter / n_cycle
    step = (stop - start) / (period * ratio)
    for c in range(n_cycle):
        v, i = start, 0
        while v <= stop and (int(i + c * period) < n_iter):
            out[int(i + c * period)] = v
            v += step
            i += 1
    return out


@pytest.mark.parametrize(
    "n_iter,start,stop,n_cycle,ratio",
    [
        (100, 0.0, 1.0, 10, 0.5),
        (1000, 0.0, 1.0, 10, 0.5),   # reference train_vae defaults shape
        (97, 0.1, 0.9, 3, 0.7),      # non-divisible period, offset ramp
        (50, 0.0, 1.0, 1, 1.0),      # single full-ramp cycle
        (10, 0.0, 1.0, 10, 0.5),     # period 1: every index is a ramp start
        (64, 0.25, 0.25, 4, 0.5),    # start == stop: constant
    ],
)
def test_matches_iterative(n_iter, start, stop, n_cycle, ratio):
    got = frange_cycle_linear(n_iter, start, stop, n_cycle, ratio)
    want = _iterative_oracle(n_iter, start, stop, n_cycle, ratio)
    np.testing.assert_array_equal(got, want)


def test_shape_and_bounds():
    beta = frange_cycle_linear(500)
    assert beta.shape == (500,)
    assert beta[0] == 0.0 and beta[-1] == 1.0
    assert (beta >= 0).all() and (beta <= 1.0 + 1e-12).all()
