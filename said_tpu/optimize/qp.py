"""Box- and smoothness-constrained QP solver for pseudo-GT coefficients.

The problem (reference ``said/optimize/blendshape_coeffs.py``): given a
neutral vertex vector n and blendshape matrix B, find per-frame weights
w_t ∈ [0,1]^N minimizing Σ_t ‖B_Δ w_t − (v_t − n)‖² subject to the
temporal smoothness constraint |w_t − w_{t+1}| ≤ δ.

The reference assembles a DENSE (T·N)² block-diagonal QP and hands it
to cvxopt (``blendshape_coeffs.py:128,149-158``). Here the structure is
exploited instead of materialized:

- Objective separates over frames through the shared N×N Gram matrix
  G = B_ΔᵀB_Δ; smoothness couples neighbors through the graph Laplacian
  L_T in time.
- ADMM splitting (w = z₁ box-projected, Dw = z₂ δ-ball-projected) makes
  each w-update the linear system ((G + ρ₁I) ⊗ I_T + ρ₂ I_N ⊗ L_T).
  Eigendecomposing G once diagonalizes the coefficient axis, leaving N
  independent CONSTANT tridiagonal systems in time — pre-factorized
  Thomas solves, executed as two ``lax.scan``s.

Per ADMM iteration the cost is two (T,N)×(N,N) matmuls plus the scans:
O(T·N²) instead of the reference's dense O((T·N)²) factorization. The
whole solver jit-compiles; all T frames solve jointly on device.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional

import jax
import jax.numpy as jnp
import numpy as np


def _thomas_factor(diag: jnp.ndarray, off: float):
    """Pre-factor tridiagonal systems tridiag(off, diag_t, off).

    diag: (N, T) per-channel diagonals (channels = Gram eigenvalues).
    Returns the forward-elimination coefficients (c', inv_denominators).
    """
    n, t = diag.shape

    def fwd(carry, d):
        c_prev = carry
        denom = d - off * c_prev
        c = off / denom
        return c, (c, 1.0 / denom)

    _, (c_prime, inv_den) = jax.lax.scan(
        fwd, jnp.zeros(n), diag.T
    )  # scan over time; carries (N,)
    return c_prime.T, inv_den.T  # (N, T)


def _thomas_solve(c_prime: jnp.ndarray, inv_den: jnp.ndarray, off: float, rhs: jnp.ndarray):
    """Solve with precomputed factors. rhs: (T, N) → (T, N)."""

    def fwd(d_prev, xs):
        r, invd = xs
        d = (r - off * d_prev) * invd
        return d, d

    _, d = jax.lax.scan(fwd, jnp.zeros(rhs.shape[1]), (rhs, inv_den.T))

    def bwd(x_next, xs):
        d_t, c_t = xs
        x = d_t - c_t * x_next
        return x, x

    _, x_rev = jax.lax.scan(
        bwd, jnp.zeros(rhs.shape[1]), (d[::-1], c_prime.T[::-1])
    )
    return x_rev[::-1]


@partial(jax.jit, static_argnames=("max_iters",))
def _admm_sequence_qp(
    gram: jnp.ndarray,  # (N, N) = B_ΔᵀB_Δ
    q: jnp.ndarray,  # (T, N) = B_Δᵀ(n - v_t)
    delta: float,
    rho1: float,
    rho2: float,
    max_iters: int = 4000,
    tol: float = 1e-6,
    w0: Optional[jnp.ndarray] = None,
):
    t, n = q.shape
    evals, evecs = jnp.linalg.eigh(gram)  # gram = V Λ Vᵀ

    # Laplacian diagonal of the first-difference operator in time.
    lap_diag = jnp.full((t,), 2.0).at[0].set(1.0).at[-1].set(1.0)
    if t == 1:
        lap_diag = jnp.zeros((1,))
    diag = (evals[:, None] + rho1) + rho2 * lap_diag[None, :]  # (N, T)
    c_prime, inv_den = _thomas_factor(diag, -rho2)

    def dt_apply(z):  # Dᵀ z for first differences, z: (T-1, N)
        out = jnp.zeros((t, n), z.dtype)
        out = out.at[:-1].add(-z)
        out = out.at[1:].add(z)
        return out

    def d_apply(w):  # Dw: (T-1, N)
        return w[1:] - w[:-1]

    w_init = jnp.clip(w0, 0.0, 1.0) if w0 is not None else jnp.zeros((t, n))

    alpha = 1.6  # over-relaxation, standard ADMM acceleration
    # The eigenbasis rotations MUST run at full fp32 precision — jax's
    # default allows bf16-class accumulation, which shifts the ADMM fixed
    # point by ~1e-3.
    hi = jax.lax.Precision.HIGHEST

    def body(state):
        w, z1, u1, z2, u2, it, _ = state
        rhs = -q + rho1 * (z1 - u1) + rho2 * dt_apply(z2 - u2)
        rhs_t = jnp.matmul(rhs, evecs, precision=hi)  # to eigenbasis
        w_t = _thomas_solve(c_prime, inv_den, -rho2, rhs_t)
        w = jnp.matmul(w_t, evecs.T, precision=hi)

        w_relaxed = alpha * w + (1.0 - alpha) * z1
        w_u1 = w_relaxed + u1
        z1_new = jnp.clip(w_u1, 0.0, 1.0)
        u1 = w_u1 - z1_new

        dw = d_apply(w)
        dw_relaxed = alpha * dw + (1.0 - alpha) * z2
        dw_u2 = dw_relaxed + u2
        z2_new = jnp.clip(dw_u2, -delta, delta)
        u2 = dw_u2 - z2_new

        # Stop on BOTH primal (w vs projected copies) and dual (z drift)
        # residuals; the primal alone is zero whenever the iterate is
        # interior, which says nothing about optimality.
        res_primal = jnp.maximum(
            jnp.abs(w - z1_new).max(),
            jnp.abs(dw - z2_new).max() if t > 1 else 0.0,
        )
        res_dual = jnp.maximum(
            jnp.abs(z1_new - z1).max(),
            jnp.abs(z2_new - z2).max() if t > 1 else 0.0,
        )
        res = jnp.maximum(res_primal, res_dual)
        return (w, z1_new, u1, z2_new, u2, it + 1, res)

    def cond(state):
        *_, it, res = state
        return jnp.logical_and(it < max_iters, res > tol)

    z1 = w_init
    u1 = jnp.zeros_like(w_init)
    z2 = d_apply(w_init)
    u2 = jnp.zeros_like(z2)
    state = (w_init, z1, u1, z2, u2, jnp.asarray(0), jnp.asarray(jnp.inf))
    w, z1, *_ = jax.lax.while_loop(cond, body, state)
    # z1 is the feasible (box-projected) iterate — return it, like the
    # reference clips its solution to bounds (blendshape_coeffs.py:159).
    return z1


def solve_sequence_qp(
    gram: np.ndarray,
    q: np.ndarray,
    delta: float = 0.1,
    init_vals: Optional[np.ndarray] = None,
    max_iters: int = 4000,
    tol: float = 1e-6,
    backend: str = "auto",
) -> np.ndarray:
    """Solve min Σ_t ½wᵀGw + q_tᵀw_t, 0≤w≤1, |w_t−w_{t+1}|≤δ. → (T, N).

    backend "auto" prefers the native float64 solver (C++, exactness for
    the host-side pseudo-GT pipeline) and falls back to the jitted JAX
    ADMM; "jax"/"native" force one path.
    """
    if backend in ("auto", "native"):
        from said_tpu.optimize.native import solve_sequence_qp_native

        w = solve_sequence_qp_native(gram, q, delta, init_vals)
        if w is not None:
            return w
        if backend == "native":
            raise RuntimeError("native QP solver unavailable (g++ build failed?)")
    gram = jnp.asarray(gram, jnp.float32)
    q = jnp.asarray(q, jnp.float32)
    # ADMM penalty scaled to the problem's curvature (≈ mean eigenvalue —
    # near-optimal conditioning for this splitting, and fast convergence
    # matters doubly in float32 where the residual floor is ~1e-6).
    scale = float(jnp.trace(gram) / gram.shape[0])
    rho1 = max(scale, 1e-3)
    rho2 = max(scale, 1e-3)
    w = _admm_sequence_qp(
        gram,
        q,
        delta,
        rho1,
        rho2,
        max_iters=max_iters,
        tol=tol,
        w0=jnp.asarray(init_vals, jnp.float32) if init_vals is not None else None,
    )
    return np.asarray(w)


class OptimizationProblemSingle:
    """Single-frame box QP (reference ``OptimizationProblemSingle``)."""

    def __init__(self, neutral_vector: np.ndarray, blendshapes_matrix: np.ndarray):
        self.neutral_vector = np.asarray(neutral_vector, np.float64)
        self.blendshapes_matrix_delta = (
            np.asarray(blendshapes_matrix, np.float64) - self.neutral_vector
        )
        self.num_blendshapes = blendshapes_matrix.shape[1]
        self.gram = self.blendshapes_matrix_delta.T @ self.blendshapes_matrix_delta

    def optimize(
        self, vertices_vector: np.ndarray, init_vals: Optional[np.ndarray] = None
    ) -> np.ndarray:
        q = (
            self.blendshapes_matrix_delta.T
            @ (self.neutral_vector - np.asarray(vertices_vector, np.float64))
        ).reshape(1, -1)
        w = solve_sequence_qp(
            self.gram,
            q,
            delta=2.0,  # inert for a single frame (no difference constraints)
            init_vals=None if init_vals is None else init_vals.reshape(1, -1),
        )
        return w[0]


class OptimizationProblemFull:
    """Whole-sequence QP with temporal smoothness (reference
    ``OptimizationProblemFull``)."""

    def __init__(self, neutral_vector: np.ndarray, blendshapes_matrix: np.ndarray):
        self.neutral_vector = np.asarray(neutral_vector, np.float64)
        self.blendshapes_matrix_delta = (
            np.asarray(blendshapes_matrix, np.float64) - self.neutral_vector
        )
        self.num_blendshapes = blendshapes_matrix.shape[1]
        self.btb = self.blendshapes_matrix_delta.T @ self.blendshapes_matrix_delta

    def optimize(
        self,
        vertices_vector_list: List[np.ndarray],
        init_vals: Optional[np.ndarray] = None,
        delta: float = 0.1,
    ) -> np.ndarray:
        q = np.stack(
            [
                (self.blendshapes_matrix_delta.T @ (self.neutral_vector - v)).reshape(-1)
                for v in vertices_vector_list
            ]
        )
        return solve_sequence_qp(self.btb, q, delta=delta, init_vals=init_vals)
