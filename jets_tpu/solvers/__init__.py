from .gauss_newton import gauss_newton, GNResult
from .krylov import (
    cg,
    chebyshev,
    estimate_spectral_bounds,
    ChebyshevState,
    gmres,
    bicgstab,
    GMRESState,
    BiCGStabState,
    minres,
    MINRESState,
    cgls,
    lsqr,
    lsmr,
    CGState,
    CGLSState,
    LSQRState,
    LSMRState,
)
from .precond import (
    normal_operator,
    estimate_diagonal,
    jacobi_preconditioner,
)
from .nonlinear import (
    nlcg,
    lbfgs,
    least_squares_objective,
    NLCGState,
    LBFGSState,
    OptResult,
)

__all__ = [
    "cg", "cgls", "lsqr", "lsmr", "minres", "gmres", "bicgstab",
    "chebyshev", "estimate_spectral_bounds",
    "CGState", "CGLSState", "LSQRState", "LSMRState", "MINRESState",
    "GMRESState", "BiCGStabState", "ChebyshevState",
    "gauss_newton", "GNResult",
    "nlcg", "lbfgs", "least_squares_objective",
    "NLCGState", "LBFGSState", "OptResult",
    "normal_operator", "estimate_diagonal", "jacobi_preconditioner",
]
