"""Native (C++) QP solver: build, parity with the JAX path and oracles."""

import numpy as np
import pytest

from said_tpu.optimize.native import load, solve_sequence_qp_native


@pytest.fixture(scope="module")
def native_available():
    if load() is None:
        pytest.skip("g++ unavailable — native solver not built")


def _problem(seed, n_verts=60, n_bl=6, seq_len=10):
    rng = np.random.default_rng(seed)
    neutral = rng.standard_normal((n_verts, 1))
    blend = neutral + 0.5 * rng.standard_normal((n_verts, n_bl))
    w_true = rng.uniform(0, 1, (seq_len, n_bl))
    dm = blend - neutral
    verts = [
        neutral + dm @ w_true[t][:, None] + 0.005 * rng.standard_normal((n_verts, 1))
        for t in range(seq_len)
    ]
    gram = dm.T @ dm
    q = np.stack([(dm.T @ (neutral - v)).reshape(-1) for v in verts])
    return gram, q


def test_native_solves_and_respects_constraints(native_available):
    gram, q = _problem(0)
    w = solve_sequence_qp_native(gram, q, delta=0.07)
    assert w.shape == q.shape
    assert w.min() >= -1e-9 and w.max() <= 1 + 1e-9
    assert np.abs(np.diff(w, axis=0)).max() <= 0.07 + 1e-7


def test_native_beats_or_matches_projected_oracle(native_available):
    from scipy import optimize as sopt

    gram, q = _problem(1, n_verts=40, n_bl=4, seq_len=4)
    delta = 0.06
    w = solve_sequence_qp_native(gram, q, delta=delta)

    seq_len, n_bl = q.shape

    def f(x):
        ww = x.reshape(seq_len, n_bl)
        return 0.5 * np.einsum("ti,ij,tj->", ww, gram, ww) + np.sum(q * ww)

    def jac(x):
        ww = x.reshape(seq_len, n_bl)
        return (ww @ gram + q).reshape(-1)

    cons = []
    for t in range(seq_len - 1):
        for j in range(n_bl):
            i1, i2 = t * n_bl + j, (t + 1) * n_bl + j
            cons.append({"type": "ineq", "fun": lambda x, a=i1, b=i2: delta - (x[a] - x[b])})
            cons.append({"type": "ineq", "fun": lambda x, a=i1, b=i2: delta - (x[b] - x[a])})

    res = sopt.minimize(
        f, np.full(seq_len * n_bl, 0.5), jac=jac,
        bounds=[(0, 1)] * (seq_len * n_bl), constraints=cons,
        method="SLSQP", options={"maxiter": 500, "ftol": 1e-12},
    )
    assert f(w.reshape(-1)) <= res.fun + 1e-6 * (1 + abs(res.fun))


def test_warm_start(native_available):
    gram, q = _problem(2)
    w_cold = solve_sequence_qp_native(gram, q, delta=0.1)
    w_warm = solve_sequence_qp_native(gram, q, delta=0.1, init_vals=w_cold)
    np.testing.assert_allclose(w_warm, w_cold, atol=1e-5)
