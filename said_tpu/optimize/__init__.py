"""Pseudo-GT blendshape-coefficient optimization (box/smoothness QP)."""

from said_tpu.optimize.qp import (
    OptimizationProblemFull,
    OptimizationProblemSingle,
    solve_sequence_qp,
)

__all__ = [
    "OptimizationProblemFull",
    "OptimizationProblemSingle",
    "solve_sequence_qp",
]
