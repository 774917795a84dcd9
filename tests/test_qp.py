"""QP solver correctness: ADMM vs scipy oracles on small problems."""

import numpy as np
import pytest
from scipy import optimize as sopt

from said_tpu.optimize.qp import (
    OptimizationProblemFull,
    OptimizationProblemSingle,
    solve_sequence_qp,
)


def _rand_problem(rng, n_verts, n_bl, seq_len):
    neutral = rng.standard_normal((n_verts, 1))
    blendshapes = neutral + 0.5 * rng.standard_normal((n_verts, n_bl))
    # Targets made from random feasible weights + noise.
    w_true = rng.uniform(0, 1, (seq_len, n_bl))
    delta_m = blendshapes - neutral
    verts = [
        neutral + delta_m @ w_true[t][:, None] + 0.01 * rng.standard_normal((n_verts, 1))
        for t in range(seq_len)
    ]
    return neutral, blendshapes, verts


def _objective(gram, q, w):
    return 0.5 * np.einsum("ti,ij,tj->", w, gram, w) + np.sum(q * w)


def test_single_frame_matches_lbfgsb():
    rng = np.random.default_rng(0)
    neutral, blendshapes, verts = _rand_problem(rng, 50, 6, 1)
    prob = OptimizationProblemSingle(neutral, blendshapes)
    w = prob.optimize(verts[0])

    delta_m = blendshapes - neutral
    gram = delta_m.T @ delta_m
    q = (delta_m.T @ (neutral - verts[0])).reshape(-1)
    res = sopt.minimize(
        lambda x: 0.5 * x @ gram @ x + q @ x,
        np.full(6, 0.5),
        jac=lambda x: gram @ x + q,
        bounds=[(0, 1)] * 6,
        method="L-BFGS-B",
        options={"ftol": 1e-14, "gtol": 1e-12},
    )
    assert np.all(w >= -1e-6) and np.all(w <= 1 + 1e-6)
    np.testing.assert_allclose(w, res.x, atol=2e-3)
    # objective within tolerance of the oracle optimum
    f_admm = 0.5 * w @ gram @ w + q @ w
    assert f_admm <= res.fun + 1e-4 * (1 + abs(res.fun))


def test_sequence_with_smoothness_matches_slsqp():
    rng = np.random.default_rng(1)
    n_bl, seq_len = 4, 6
    neutral, blendshapes, verts = _rand_problem(rng, 40, n_bl, seq_len)
    prob = OptimizationProblemFull(neutral, blendshapes)
    delta = 0.05
    w = prob.optimize(verts, delta=delta)

    assert w.shape == (seq_len, n_bl)
    assert np.all(w >= -1e-6) and np.all(w <= 1 + 1e-6)
    diffs = np.abs(np.diff(w, axis=0))
    assert diffs.max() <= delta + 1e-4, diffs.max()

    # scipy oracle on the flattened problem
    delta_m = blendshapes - neutral
    gram = delta_m.T @ delta_m
    q = np.stack([(delta_m.T @ (neutral - v)).reshape(-1) for v in verts])

    def f(x):
        ww = x.reshape(seq_len, n_bl)
        return _objective(gram, q, ww)

    def jac(x):
        ww = x.reshape(seq_len, n_bl)
        return (ww @ gram + q).reshape(-1)

    cons = []
    for t in range(seq_len - 1):
        for j in range(n_bl):
            i1, i2 = t * n_bl + j, (t + 1) * n_bl + j

            def c_up(x, i1=i1, i2=i2):
                return delta - (x[i1] - x[i2])

            def c_dn(x, i1=i1, i2=i2):
                return delta - (x[i2] - x[i1])

            cons.append({"type": "ineq", "fun": c_up})
            cons.append({"type": "ineq", "fun": c_dn})

    res = sopt.minimize(
        f,
        np.full(seq_len * n_bl, 0.5),
        jac=jac,
        bounds=[(0, 1)] * (seq_len * n_bl),
        constraints=cons,
        method="SLSQP",
        options={"maxiter": 500, "ftol": 1e-12},
    )
    f_admm = f(w.reshape(-1))
    # ADMM should be at least as good as (or within tolerance of) SLSQP.
    assert f_admm <= res.fun + 1e-3 * (1 + abs(res.fun)), (f_admm, res.fun)


def test_solver_reaches_interior_solution_without_constraints_active():
    """With targets built from interior weights and tiny noise, the fit
    should recover the weights closely."""
    rng = np.random.default_rng(2)
    n_verts, n_bl, seq_len = 120, 5, 8
    neutral = rng.standard_normal((n_verts, 1))
    blendshapes = neutral + rng.standard_normal((n_verts, n_bl))
    w_true = rng.uniform(0.3, 0.7, (seq_len, n_bl))
    # smooth w_true so constraints are inactive
    w_true = np.cumsum(w_true * 0.01, axis=0) + 0.4
    delta_m = blendshapes - neutral
    verts = [neutral + delta_m @ w_true[t][:, None] for t in range(seq_len)]

    prob = OptimizationProblemFull(neutral, blendshapes)
    w = prob.optimize(verts, delta=0.1)
    np.testing.assert_allclose(w, w_true, atol=5e-3)
