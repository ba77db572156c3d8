"""pop_up_slam_tpu — a TPU-native Pop-up Plane SLAM framework.

A from-scratch JAX/XLA/Pallas re-design of monocular plane SLAM for
low-texture environments (Pop-up SLAM, arXiv:1703.07334):

- ``geometry``   : SE(3)/SO(3) Lie groups, homogeneous planes on S^3,
                   pinhole cameras — pure jax, vmap/jit friendly.
- ``popup``      : single-image "pop-up": ground-wall boundary extraction,
                   polyline segmentation, inverse projection to 3D wall
                   plane hypotheses + dense depth recovery.
- ``factors``    : odometry / pose-plane / prior factors with analytic
                   Jacobians (verified against jax.jacfwd).
- ``solver``     : masked sliding-window Gauss-Newton / LM with
                   Schur-complement elimination of plane landmarks and a
                   blocked Cholesky of the reduced camera system.
- ``assoc``      : masked fixed-capacity plane data association.
- ``mapping``    : fixed-capacity landmark store and keyframe window.
- ``ops``        : Pallas TPU kernels for the hot paths (depth render,
                   Jacobian build, Schur reduction, blocked Cholesky).
- ``parallel``   : mesh / shard_map distributed Schur BA (DP over frames,
                   landmark-block sharding, keyframe-sequence sharding).
- ``pipeline``   : the frame loop tying front-end and back-end together.
- ``io``         : TUM RGB-D loader, synthetic corridor generator,
                   trajectory IO (optionally accelerated by the native
                   C++ runtime in ``native/``).
- ``evaluation`` : TUM-protocol ATE/RPE (Horn alignment).
- ``models``     : learned ground/wall segmentation (SegNet-style, flax).

The reference implementation (shichaoy/pop_up_slam) is a ROS/C++/iSAM
stack; see SURVEY.md for the component-by-component mapping.  The
reference mount was empty at survey time, so parity citations point at
the paper (arXiv:1703.07334 section numbers) and SURVEY.md lines rather
than reference file:line.
"""

__version__ = "0.1.0"

import jax as _jax

# SLAM estimation is numerically sensitive (Gauss-Newton on small-block
# linear systems): the default f32 matmul on TPU runs bf16 passes, which
# measurably corrupts SE(3) composition and Jacobian assembly (~1e-3
# relative error).  Force true-f32 matmul as the library default; the
# throughput-critical dense paths (segmentation model, depth rendering)
# opt back into bf16 explicitly where it is safe.
_jax.config.update("jax_default_matmul_precision", "float32")
