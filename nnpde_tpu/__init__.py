"""nnpde_tpu — a TPU-native JAX framework for neural variational PDE solvers.

Re-implements (from scratch, TPU-first) the capabilities of the reference
PyTorch research suite JiakangC/Neural-Network-Based-PDE-Solver: PINN /
Deep-Ritz (DRM) / Weak-Adversarial-Network (WAN) solvers for

  * N-dimensional Poisson problems (1..5D boxes, hard or soft Dirichlet BCs),
  * Schrodinger eigenstates: infinite potential well (1D/2D), quantum
    harmonic oscillator (1D/2D, fixed or trainable energy), and the
    laser-dressed Kramers-Henneberger atom (1D, finite-difference ground
    truth, trainable energy).

Architecture (bottom-up):
  ops/       per-point calculus: fused forward-Laplacian jets, closed-form
             bump test functions, quadrature.
  models/    functional MLP pytrees + separable hard-BC trial factors
             implementing the technique enum {BC, FBC, FN, OG, RAW, RB}.
  pde/       problem physics: exact solutions, potentials, manufactured RHS,
             finite-difference reference eigensolver.
  losses/    the full loss zoo (pde/drm/wan/data/bc/norm/orth/parity/symmetry).
  sampling/  device-side collocation samplers.
  train/     one unified jitted trainer (scan-chunked, device-side best
             tracking, fused WAN minimax step, optional L-BFGS polish).
  parallel/  mesh construction + batch sharding over ICI with psum-exact means.
  kernels/   Pallas TPU kernels for the hot residual path.
  exp/       configs, CLI, results ledger, checkpoints, plotting.
  problems/  presets binding all of the above into the reference's entry
             points (poisson_nd, ipw_1d/2d, qho_1d/2d, kh_1d).
"""

__version__ = "0.1.0"


# -- convenience top-level API ------------------------------------------------
from .problems.poisson import PoissonConfig, train_poisson_nd  # noqa: E402
from .problems.ipw import (  # noqa: E402
    IPW1DConfig, IPW1DWanConfig, train_ipw_1d, train_ipw_1d_wan,
)
from .problems.ipw2d import IPW2DConfig, train_ipw_2d  # noqa: E402
from .problems.qho import (  # noqa: E402
    QHO1DConfig, QHO1DWanConfig, train_qho_1d, train_qho_1d_wan,
)
from .problems.qho2d import QHO2DConfig, train_qho_2d  # noqa: E402
from .problems.kh import (  # noqa: E402
    KHConfig, KHCompareConfig, run_compare, train_kh,
)
from .pde.kh import KHGroundTruth  # noqa: E402
