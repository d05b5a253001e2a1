from .gauss_newton import gauss_newton, GNResult
from .krylov import (
    cg,
    cgls,
    lsqr,
    CGState,
    CGLSState,
    LSQRState,
)

__all__ = ["cg", "cgls", "lsqr", "CGState", "CGLSState", "LSQRState",
           "gauss_newton", "GNResult"]
