from .krylov import (
    cg,
    cgls,
    lsqr,
    CGState,
    CGLSState,
    LSQRState,
)

__all__ = ["cg", "cgls", "lsqr", "CGState", "CGLSState", "LSQRState"]
