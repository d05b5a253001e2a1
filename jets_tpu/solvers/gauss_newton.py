"""Gauss–Newton for nonlinear least squares — the outer loop of FWI-style
inversion in the reference family (COFII workflows: linearize, solve the
normal equations with a Krylov method, update, repeat).

``min_m || F(m) - d ||^2`` via:

    J_k   = linearize(F, m_k)          (jet pinning; upstate runs here)
    dm_k  = argmin || J_k dm - r_k ||  (CGLS/LSQR, jitted XLA loop)
    m_k+1 = m_k + step * dm_k

Each inner solve re-uses the SAME compiled solver: ``J_k`` is a pytree with
an identical structure every iteration, so only the first outer iteration
pays a trace. The outer loop is a plain Python loop (few iterations, host
control is fine); its state is checkpointable like everything else.
"""
from __future__ import annotations

from typing import Any, Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..core.jet import Operator
from ..utils import tree as tr
from .krylov import cgls

__all__ = ["gauss_newton", "GNResult"]


class GNResult(NamedTuple):
    m: Any  # final model
    residuals: list  # data-residual norm per outer iteration
    inner_iterations: list  # Krylov iterations per outer iteration


def gauss_newton(
    F: Operator,
    d,
    m0,
    *,
    outer_iters: int = 5,
    inner_iters: int = 20,
    inner_tol: float = 1e-6,
    step: float = 1.0,
    inner_solver: Optional[Callable] = None,
    callback: Optional[Callable] = None,
) -> GNResult:
    """Gauss–Newton with a matrix-free Krylov inner solve (default CGLS)."""
    solve = inner_solver if inner_solver is not None else cgls
    m = m0
    dnorm = float(F.rng.norm(d))
    residuals = []
    inner_its = []
    converged = False
    for k in range(outer_iters):
        r = tr.sub(d, F(m))
        rnorm = float(F.rng.norm(r))
        residuals.append(rnorm)
        if callback is not None:
            callback(k, m, rnorm)
        if rnorm <= 1e-12 * max(dnorm, 1e-30):
            converged = True  # already at the data; an inner solve would NaN
            break
        J = F.linearize(m)
        res = solve(J, r, maxiter=inner_iters, tol=inner_tol)
        inner_its.append(int(res.iterations))
        m = tr.xpay(m, step, res.x)
    if not converged:
        # final residual of the last update (on early convergence the last
        # appended entry already describes the unchanged model)
        residuals.append(float(F.rng.norm(tr.sub(d, F(m)))))
    return GNResult(m, residuals, inner_its)
