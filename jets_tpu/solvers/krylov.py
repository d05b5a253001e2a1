"""Krylov solvers — CG, CGLS, LSQR as ``lax.while_loop`` XLA programs.

The reference has no in-repo solvers; its canonical solve is
``lsqr(vec(A), vec(d))`` through IterativeSolvers.jl (docs
``docs/src/index.md:238-246``, ``vec`` bridge ``src/Jets.jl:1143-1152``).
Here solvers are first-class and TPU-native:

* each iteration is a traced loop body — two operator applications plus a
  handful of fused BLAS-1 reductions — compiled once by XLA;
* solvers consume operators *directly* (operators are pytrees); no ``vec``
  adapter is needed because model/data vectors are pytrees (arrays or
  :class:`BlockVector`), and inner products are delegated to the operator's
  spaces so block/symmetric weighting is automatic;
* on a sharded block operator the space reductions become ``psum``-backed
  collectives (see ``jets_tpu/parallel``) and the same solver code runs
  multi-chip: **the solver is oblivious to distribution**;
* solver state is an explicit, checkpointable pytree: every solver takes an
  optional ``state`` to resume from and returns its final state
  (SURVEY §5 — checkpoint/resume of Krylov recurrence vectors).

Stopping: iterations cap at ``maxiter`` (static, sizes the residual-history
buffer) or when the residual estimate drops below ``tol * ||b||``. Residual
histories are fixed-size arrays written with ``.at[i].set`` — XLA-friendly,
no host callbacks in the hot loop.
"""
from __future__ import annotations

from functools import partial
from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax import lax

from ..core.jet import LinearOperator
from ..utils import tree as tr

__all__ = ["cg", "cgls", "lsqr", "lsmr", "minres", "CGState", "CGLSState", "LSQRState", "LSMRState", "MINRESState"]


def _real(x):
    return jnp.real(x)


def _normalize(space, vct):
    """Return (vct/‖vct‖, ‖vct‖) with a safe division at exact zero."""
    n = space.norm(vct)
    safe = jnp.where(n > 0, n, 1.0)
    return tr.scale(1.0 / safe, vct), n


def _sym_ortho(a, bb):
    """Stable Givens rotation (c, s, r) with the (0, 0) -> (1, 0, 0)
    convention so recurrences stay NaN-free after exact convergence
    (alpha/beta collapse to 0 once the Krylov space is exhausted)."""
    r = jnp.sqrt(a**2 + bb**2)
    rsafe = jnp.where(r > 0, r, 1.0)
    c = jnp.where(r > 0, a / rsafe, 1.0)
    s = jnp.where(r > 0, bb / rsafe, 0.0)
    return c, s, r


# ---------------------------------------------------------------------------
# CG — Hermitian positive-definite systems A x = b
# ---------------------------------------------------------------------------


class CGState(NamedTuple):
    x: Any
    r: Any
    p: Any
    rho: jax.Array
    rnorm: jax.Array  # carried so cond() costs no extra reduction
    i: jax.Array


class SolveResult(NamedTuple):
    x: Any
    iterations: jax.Array
    resnorm: jax.Array
    history: jax.Array  # residual-norm estimate per iteration (inf-padded)
    state: Any  # final solver state — pass back via ``state=`` to resume


@partial(jax.jit, static_argnames=("maxiter",))
def cg(
    A: LinearOperator,
    b,
    x0=None,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
    M: Optional[LinearOperator] = None,
    state: Optional[CGState] = None,
) -> SolveResult:
    """(Preconditioned) conjugate gradients on a Hermitian positive-definite
    operator.

    ``A`` must be self-adjoint on its space; this is exactly what the
    dot-product gate (``verify.dot_product_test``) certifies. ``M`` is an
    optional SPD preconditioner applying the approximate INVERSE of ``A``
    (e.g. a diagonal/Jacobi operator); with ``M`` set, ``rho`` tracks
    ``<r, M r>`` and the stopping test still uses the true residual norm.
    """
    dom = A.dom
    bnorm = dom.norm(b)
    precond = (lambda r: M(r)) if M is not None else (lambda r: r)
    if state is None:
        x = dom.zeros() if x0 is None else x0
        r = tr.sub(b, A(x))
        z = precond(r)
        p = z
        rho = _real(dom.dot(r, z))
        st = CGState(x, r, p, rho, dom.norm(r), jnp.asarray(0))
    else:
        st = state
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=bnorm.dtype)

    def cond(carry):
        st, _ = carry
        return (st.i < maxiter) & (st.rnorm > tol * bnorm)

    def body(carry):
        st, hist = carry
        q = A(st.p)
        pq = _real(dom.dot(st.p, q))
        alpha = jnp.where(pq > 0, st.rho / jnp.where(pq > 0, pq, 1.0), 0.0)
        x = tr.xpay(st.x, alpha, st.p)
        r = tr.xpay(st.r, -alpha, q)
        z = precond(r)
        rho_new = _real(dom.dot(r, z))
        beta = jnp.where(
            st.rho > 0, rho_new / jnp.where(st.rho > 0, st.rho, 1.0), 0.0
        )
        p = tr.xpay(z, beta, st.p)
        rnorm = dom.norm(r)
        hist = hist.at[st.i].set(rnorm)
        return CGState(x, r, p, rho_new, rnorm, st.i + 1), hist

    st, hist = lax.while_loop(cond, body, (st, hist0))
    return SolveResult(st.x, st.i, st.rnorm, hist, st)


# ---------------------------------------------------------------------------
# CGLS — least squares min ||A x - b||, normal equations in stable form
# ---------------------------------------------------------------------------


class CGLSState(NamedTuple):
    x: Any
    r: Any  # data-space residual b - A x
    s: Any  # model-space gradient A' r
    p: Any
    gamma: jax.Array  # ||s||^2
    i: jax.Array


@partial(jax.jit, static_argnames=("maxiter",))
def cgls(
    A: LinearOperator,
    b,
    x0=None,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
    state: Optional[CGLSState] = None,
) -> SolveResult:
    """CGLS: conjugate gradients on the normal equations without forming
    ``A'A`` — one forward and one adjoint application per iteration.

    Stops when ``||A' r||`` (the normal-equation residual) falls below
    ``tol * ||A' b||``.
    """
    dom, rng = A.dom, A.rng
    s_b = A.adjoint_apply(b)
    snorm0 = dom.norm(s_b)
    if state is None:
        if x0 is None:
            x = dom.zeros()
            r = b
            s = s_b
        else:
            x = x0
            r = tr.sub(b, A(x))
            s = A.adjoint_apply(r)
        gamma = _real(dom.dot(s, s))
        st = CGLSState(x, r, s, s, gamma, jnp.asarray(0))
    else:
        st = state
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=snorm0.dtype)

    def cond(carry):
        st, _ = carry
        return (st.i < maxiter) & (jnp.sqrt(st.gamma) > tol * snorm0)

    def body(carry):
        st, hist = carry
        q = A(st.p)
        delta = _real(rng.dot(q, q))
        # guarded divisions: at exact convergence delta/gamma collapse to 0;
        # idle (alpha=beta=0) instead of poisoning the carry with NaN
        alpha = jnp.where(delta > 0, st.gamma / jnp.where(delta > 0, delta, 1.0), 0.0)
        x = tr.xpay(st.x, alpha, st.p)
        r = tr.xpay(st.r, -alpha, q)
        s = A.adjoint_apply(r)
        gamma_new = _real(dom.dot(s, s))
        beta = jnp.where(
            st.gamma > 0, gamma_new / jnp.where(st.gamma > 0, st.gamma, 1.0), 0.0
        )
        p = tr.xpay(s, beta, st.p)
        hist = hist.at[st.i].set(rng.norm(r))
        return CGLSState(x, r, s, p, gamma_new, st.i + 1), hist

    st, hist = lax.while_loop(cond, body, (st, hist0))
    return SolveResult(st.x, st.i, rng.norm(st.r), hist, st)


# ---------------------------------------------------------------------------
# LSQR — Paige & Saunders Golub-Kahan bidiagonalization
# ---------------------------------------------------------------------------


class LSQRState(NamedTuple):
    x: Any
    u: Any  # data-space Lanczos vector
    v: Any  # model-space Lanczos vector
    w: Any  # search direction
    alpha: jax.Array
    phibar: jax.Array  # ||r|| estimate
    rhobar: jax.Array
    i: jax.Array


@partial(jax.jit, static_argnames=("maxiter",))
def lsqr(
    A: LinearOperator,
    b,
    x0=None,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
    damp: float = 0.0,
    state: Optional[LSQRState] = None,
) -> SolveResult:
    """LSQR (Paige & Saunders 1982) for ``min ||A x - b||^2 + damp^2 ||x||^2``.

    One forward and one adjoint application per iteration; the Golub-Kahan
    recurrence scalars are fused reductions, so a distributed block operator
    costs exactly two collective rounds per iteration. ``phibar`` tracks the
    residual norm without ever forming ``r``.

    HBM-lean recurrence: the model-space Lanczos vector is kept
    UNNORMALIZED in ``state.v`` (``‖v‖ = state.alpha``; the mathematical
    ``v`` is ``state.v / alpha``) and the ``1/alpha`` factors fold into the
    recurrence scalars, removing the explicit model-vector scale pass.
    Scalar recurrences are identical to the textbook form. (Measured ~1%
    on the flagship — XLA already fused most of the scale into adjacent
    passes — but the form also guarantees the lean pass structure on
    backends/shapes where that fusion does not fire.)
    """
    dom, rng = A.dom, A.rng

    if state is None:
        if x0 is None:
            x = dom.zeros()
            r0 = b
        else:
            x = x0
            r0 = tr.sub(b, A(x))
        u, beta = _normalize(rng, r0)
        v_hat = A.adjoint_apply(u)  # unnormalized; ‖v_hat‖ = alpha
        alpha = dom.norm(v_hat)
        a_safe = jnp.where(alpha > 0, alpha, 1.0)
        w = tr.scale(1.0 / a_safe, v_hat)
        st = LSQRState(x, u, v_hat, w, alpha, beta, alpha, jnp.asarray(0))
    else:
        st = state
    # stopping baseline is ALWAYS ||b|| (the scipy/standard convention), so
    # a resumed run continues the exact same criterion as a fresh one
    bnorm = rng.norm(b)
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=st.phibar.dtype)
    damp = jnp.asarray(damp, dtype=st.phibar.dtype)

    def cond(carry):
        st, _ = carry
        # phibar carries a sign through the rotations; only its magnitude is
        # the residual-norm estimate
        return (st.i < maxiter) & (jnp.abs(st.phibar) > tol * bnorm)

    def body(carry):
        st, hist = carry
        # bidiagonalization with v stored unnormalized (v_math = v/alpha):
        #   beta u' = A v_math - alpha u  →  A(v)/alpha - alpha u
        a_safe = jnp.where(st.alpha > 0, st.alpha, 1.0)
        u_next = tr.axpy(
            -st.alpha, st.u, tr.scale(1.0 / a_safe, A(st.v))
        )  # data-space scale: cheap
        u_next, beta = _normalize(rng, u_next)
        #   alpha' v_math' = A' u' - beta v_math  →  v' = A'u' - (beta/alpha) v
        v_hat = tr.axpy(-beta / a_safe, st.v, A.adjoint_apply(u_next))
        alpha = dom.norm(v_hat)
        # eliminate damping (regularization) via an extra rotation
        c1, _, rhobar1 = _sym_ortho(st.rhobar, damp)
        phibar1 = c1 * st.phibar
        # plane rotation on the bidiagonal
        c, s, rho = _sym_ortho(rhobar1, beta)
        theta = s * alpha
        rhobar = -c * alpha
        phi = c * phibar1
        phibar = s * phibar1
        rho_safe = jnp.where(rho > 0, rho, 1.0)
        t1 = jnp.where(rho > 0, phi / rho_safe, 0.0)
        t2 = jnp.where(rho > 0, -theta / rho_safe, 0.0)
        x = tr.xpay(st.x, t1, st.w)
        # w' = v_math' + t2 w = v_hat/alpha' + t2 w — one fused pass
        an_safe = jnp.where(alpha > 0, alpha, 1.0)
        inv_a = 1.0 / an_safe
        w = tr.tmap(lambda vh, ww: inv_a * vh + t2 * ww, v_hat, st.w)
        hist = hist.at[st.i].set(jnp.abs(phibar))
        return LSQRState(x, u_next, v_hat, w, alpha, phibar, rhobar, st.i + 1), hist

    st, hist = lax.while_loop(cond, body, (st, hist0))
    return SolveResult(st.x, st.i, jnp.abs(st.phibar), hist, st)


# ---------------------------------------------------------------------------
# LSMR — Fong & Saunders (2011): MINRES applied to the normal equations via
# Golub-Kahan bidiagonalization. Monotonic in ||A'r||; the standard
# companion to LSQR (IterativeSolvers.jl ships both — the reference's docs
# route solves through that package, docs/src/index.md:238-246).
# ---------------------------------------------------------------------------


class LSMRState(NamedTuple):
    x: Any
    u: Any
    v: Any
    h: Any        # search direction
    hbar: Any     # second recurrence direction
    alpha: jax.Array
    alphabar: jax.Array
    zeta: jax.Array
    zetabar: jax.Array
    rho: jax.Array
    rhobar: jax.Array
    cbar: jax.Array
    sbar: jax.Array
    i: jax.Array


@partial(jax.jit, static_argnames=("maxiter",))
def lsmr(
    A: LinearOperator,
    b,
    x0=None,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
    damp: float = 0.0,
    state: Optional[LSMRState] = None,
) -> SolveResult:
    """LSMR for ``min ||A x - b||^2 + damp^2 ||x||^2``.

    Same per-iteration cost as LSQR (one forward + one adjoint apply, fused
    scalar recurrences) but monotonically decreases ``||A' r||`` — often the
    better stopping behavior for ill-conditioned inversion. The history
    buffer records the ``||A' r||`` estimate ``|zetabar|``.
    """
    dom, rng = A.dom, A.rng

    damp = jnp.asarray(damp)

    if state is None:
        if x0 is None:
            x = dom.zeros()
            r0 = b
        else:
            x = x0
            r0 = tr.sub(b, A(x))
        u, beta = _normalize(rng, r0)
        v, alpha = _normalize(dom, A.adjoint_apply(u))
        zetabar = alpha * beta
        st = LSMRState(
            x=x, u=u, v=v, h=v, hbar=tr.scale(0.0, v),
            alpha=alpha, alphabar=alpha, zeta=jnp.zeros_like(alpha),
            zetabar=zetabar, rho=jnp.ones_like(alpha),
            rhobar=jnp.ones_like(alpha), cbar=jnp.ones_like(alpha),
            sbar=jnp.zeros_like(alpha), i=jnp.asarray(0),
        )
    else:
        st = state
    # stopping baseline recomputed identically on fresh AND resumed runs
    norm_atb = dom.norm(A.adjoint_apply(b))
    damp = damp.astype(st.zetabar.dtype)
    hist0 = jnp.full((maxiter,), jnp.inf, dtype=st.zetabar.dtype)

    def cond(carry):
        st, _ = carry
        return (st.i < maxiter) & (jnp.abs(st.zetabar) > tol * norm_atb)

    def body(carry):
        st, hist = carry
        # Golub-Kahan step
        u_next = tr.axpy(-st.alpha, st.u, A(st.v))
        u_next, beta = _normalize(rng, u_next)
        v_next = tr.axpy(-beta, st.v, A.adjoint_apply(u_next))
        v_next, alpha = _normalize(dom, v_next)
        # rotation eliminating damp
        chat, shat, alphahat = _sym_ortho(st.alphabar, damp)
        # rotation on the bidiagonal
        rho_old = st.rho
        c, s, rho = _sym_ortho(alphahat, beta)
        thetanew = s * alpha
        alphabar = c * alpha
        # second rotation (MINRES part)
        rhobar_old = st.rhobar
        thetabar = st.sbar * rho
        cbar_rho = st.cbar * rho
        cbar, sbar, rhobar = _sym_ortho(cbar_rho, thetanew)
        zeta = cbar * st.zetabar
        zetabar = -sbar * st.zetabar
        # updates
        rho_s = jnp.where(rho_old > 0, rho_old, 1.0)
        rb_s = jnp.where(rhobar_old > 0, rhobar_old, 1.0)
        hbar = tr.axpy(-(thetabar * rho) / (rho_s * rb_s), st.hbar, st.h)
        rrb = jnp.where(rho * rhobar > 0, rho * rhobar, 1.0)
        x = tr.xpay(st.x, zeta / rrb, hbar)
        h = tr.axpy(-(thetanew / jnp.where(rho > 0, rho, 1.0)), st.h, v_next)
        hist = hist.at[st.i].set(jnp.abs(zetabar))
        return (
            LSMRState(x=x, u=u_next, v=v_next, h=h, hbar=hbar, alpha=alpha,
                      alphabar=alphabar, zeta=zeta, zetabar=zetabar, rho=rho,
                      rhobar=rhobar, cbar=cbar, sbar=sbar, i=st.i + 1),
            hist,
        )

    st, hist = lax.while_loop(cond, body, (st, hist0))
    return SolveResult(st.x, st.i, jnp.abs(st.zetabar), hist, st)


# ---------------------------------------------------------------------------
# MINRES — symmetric (possibly INDEFINITE) systems A x = b (Paige &
# Saunders 1975). Completes the Krylov family: CG needs positive definite;
# MINRES only needs self-adjoint (what the dot-product gate certifies).
# ---------------------------------------------------------------------------


class MINRESState(NamedTuple):
    x: Any
    v: Any  # current Lanczos vector (normalized)
    v_old: Any
    w1: Any  # previous two update directions
    w0: Any
    beta: jax.Array
    eta: jax.Array  # |eta| = current residual norm
    gamma1: jax.Array
    gamma0: jax.Array
    sigma1: jax.Array
    sigma0: jax.Array
    i: jax.Array


@partial(jax.jit, static_argnames=("maxiter",))
def minres(
    A: LinearOperator,
    b,
    x0=None,
    *,
    maxiter: int = 100,
    tol: float = 1e-6,
    state: Optional[MINRESState] = None,
) -> SolveResult:
    """MINRES on a self-adjoint operator (definite OR indefinite): minimizes
    ``||A x - b||`` over the Krylov space — monotone residual, one operator
    application and one Lanczos three-term recurrence per iteration, fused
    Givens rotations."""
    dom = A.dom
    bnorm = dom.norm(b)

    def _safe(x):
        return jnp.where(x > 0, x, 1.0)

    if state is None:
        x = dom.zeros() if x0 is None else x0
        r = tr.sub(b, A(x)) if x0 is not None else b
        beta1 = dom.norm(r)
        v = tr.scale(1.0 / _safe(beta1), r)
        zero = tr.tmap(jnp.zeros_like, v)
        one = jnp.asarray(1.0, beta1.dtype)
        nul = jnp.asarray(0.0, beta1.dtype)
        st = MINRESState(
            x, v, zero, zero, zero,
            nul, beta1, one, one, nul, nul, jnp.asarray(0),
        )
    else:
        st = state

    hist0 = jnp.full((maxiter,), jnp.inf, dtype=st.eta.dtype)

    def cond(carry):
        st, _ = carry
        return (st.i < maxiter) & (jnp.abs(st.eta) > tol * bnorm)

    def body(carry):
        st, hist = carry
        Av = A(st.v)
        alpha = _real(dom.dot(st.v, Av))
        v_next = tr.tmap(
            lambda av, vv, vo: av - alpha * vv - st.beta * vo,
            Av, st.v, st.v_old,
        )
        beta_next = dom.norm(v_next)
        v_next = tr.scale(1.0 / _safe(beta_next), v_next)
        # apply the two previous rotations to the new tridiagonal column
        delta = st.gamma1 * alpha - st.gamma0 * st.sigma1 * st.beta
        rho2 = st.sigma1 * alpha + st.gamma0 * st.gamma1 * st.beta
        rho3 = st.sigma0 * st.beta
        rho1 = jnp.sqrt(delta * delta + beta_next * beta_next)
        gamma = jnp.where(rho1 > 0, delta / _safe(rho1), 1.0)
        sigma = jnp.where(rho1 > 0, beta_next / _safe(rho1), 0.0)
        w_next = tr.tmap(
            lambda vv, w0, w1: (vv - rho3 * w0 - rho2 * w1) / _safe(rho1),
            st.v, st.w0, st.w1,
        )
        x = tr.xpay(st.x, gamma * st.eta, w_next)
        eta = -sigma * st.eta
        hist = hist.at[st.i].set(jnp.abs(eta))
        return (
            MINRESState(
                x, v_next, st.v, w_next, st.w1,
                beta_next, eta, gamma, st.gamma1, sigma, st.sigma1,
                st.i + 1,
            ),
            hist,
        )

    st, hist = lax.while_loop(cond, body, (st, hist0))
    return SolveResult(st.x, st.i, jnp.abs(st.eta), hist, st)
