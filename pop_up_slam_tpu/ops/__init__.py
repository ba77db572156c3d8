"""TPU kernel layer: Pallas kernels + closed-form batched math.

This package holds the performance path for the hot loops identified in
SURVEY.md §3 (reference mount empty — stacks reconstructed from the
Pop-up SLAM paper, arXiv:1703.07334):

- :mod:`plane_jacobians` — analytic, factor-batched Jacobians of the
  pose–plane measurement factor (hot loop #3's linearization step),
  both as vectorized jnp closed form and as a Pallas VPU kernel.
- :mod:`schur_pallas`    — blocked-GEMM Schur complement
  ``S = Hpp - Hpl Hll^-1 Hpl^T`` on the MXU.
- :mod:`cholesky_pallas` — fused blocked Cholesky factorization +
  forward/backward substitution of the reduced camera system.
- :mod:`depth_render`    — tile-wise dense depth rendering from the
  popped-up plane model (hot loop in §3.4, per-pixel ray-plane tests).

Each kernel has a pure-jnp reference implementation elsewhere in the
package and is tested against it (tests/test_ops.py).  On non-TPU
backends the kernels run in Pallas interpret mode so the whole suite
stays CPU-runnable.
"""

from __future__ import annotations

import jax


def pallas_interpret() -> bool:
    """True when Pallas kernels must run in interpret mode (no TPU)."""
    return jax.default_backend() != "tpu"


from .plane_jacobians import (  # noqa: E402
    plane_terms_analytic,
    plane_terms_pallas,
)
from .schur_pallas import schur_reduce_pallas  # noqa: E402
from .cholesky_pallas import chol_solve_pallas  # noqa: E402
from .depth_render import depth_render_pallas  # noqa: E402

__all__ = [
    "pallas_interpret",
    "plane_terms_analytic",
    "plane_terms_pallas",
    "schur_reduce_pallas",
    "chol_solve_pallas",
    "depth_render_pallas",
]
