from .gauss_newton import gauss_newton, GNResult
from .krylov import (
    cg,
    cgls,
    lsqr,
    lsmr,
    CGState,
    CGLSState,
    LSQRState,
    LSMRState,
)

__all__ = ["cg", "cgls", "lsqr", "CGState", "CGLSState", "LSQRState", "lsmr", "LSMRState",
           "gauss_newton", "GNResult"]
