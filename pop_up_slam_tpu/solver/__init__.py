from .schur import solve_schur, solve_dense, inv3x3, SchurSolution
from .gauss_newton import gn_solve, lm_solve, apply_update, SolveStats
from .dogleg import dogleg_solve
from .covariance import recover_marginals, Marginals

__all__ = [
    "solve_schur",
    "solve_dense",
    "inv3x3",
    "SchurSolution",
    "gn_solve",
    "lm_solve",
    "dogleg_solve",
    "apply_update",
    "SolveStats",
    "recover_marginals",
    "Marginals",
]
