"""Normal-equations and preconditioning helpers for the Krylov layer.

The reference routes least-squares solves through external solvers
(IterativeSolvers.jl, ``docs/src/index.md:238-246``) with no preconditioning
story. Here the SPD machinery is first-class:

* :func:`normal_operator` — the Gauss-Newton normal operator
  ``A^H A (+ damp^2 I)`` as a self-adjoint :class:`LinearOperator` that
  :func:`~jets_tpu.solvers.krylov.cg` consumes directly;
* :func:`estimate_diagonal` — matrix-free Hutchinson estimate of
  ``diag(A^H A)`` (Rademacher probes, one batched vmap);
* :func:`jacobi_preconditioner` — the diagonal (Jacobi) preconditioner
  ``M ≈ diag(A^H A)^{-1}`` built from that estimate (or an exact diagonal
  you provide), for ``cg(..., M=M)``.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..core.jet import Jet, LinearOperator, adjoint
from ..ops.diagonal import diagonal_operator
from ..utils import tree

__all__ = ["normal_operator", "estimate_diagonal", "jacobi_preconditioner"]


def normal_operator(A: LinearOperator, damp: float = 0.0) -> LinearOperator:
    """Self-adjoint ``N = A^H A + damp^2 I`` on ``A.dom`` — SPD whenever
    ``A`` has full column rank or ``damp > 0``; feed it to ``cg``."""

    def _df(dm, m0, state):
        op = state["op"]
        out = op.adjoint_apply(op(dm))
        d = state["damp"]
        if d:
            out = out + (d * d) * dm
        return out

    j = Jet(
        dom=A.dom,
        rng=A.dom,
        df=_df,
        dft="self",
        state={"op": A, "damp": float(damp)},
    )
    return LinearOperator(j)


def estimate_diagonal(
    A: LinearOperator,
    key: Optional[jax.Array] = None,
    nsamples: int = 32,
):
    """Hutchinson diagonal estimator for ``A^H A``:
    ``diag ≈ mean_z [ conj(z) ⊙ (A^H A z) ]`` over Rademacher probes ``z``
    — exact in expectation, variance ~1/nsamples. Probes are built through
    the domain space's own allocator, so block-space operators (whose
    members are :class:`BlockVector` pytrees) work too; the unrolled sample
    loop is one XLA program."""
    if key is None:
        key = jax.random.PRNGKey(0)
    dom = A.dom
    Ah = adjoint(A)

    def probe(k):
        u = dom.rand(k)
        z = tree.tmap(
            lambda a: jnp.sign(jnp.real(a) - 0.5).astype(a.dtype), u
        )
        Nz = Ah(A(z))
        return tree.tmap(lambda zz, nn: jnp.conj(zz) * nn, z, Nz)

    acc = None
    for k in jax.random.split(key, nsamples):
        s = probe(k)
        acc = s if acc is None else tree.add(acc, s)
    return tree.scale(1.0 / nsamples, acc)


def jacobi_preconditioner(
    A: LinearOperator,
    diag: Optional[jax.Array] = None,
    *,
    key: Optional[jax.Array] = None,
    nsamples: int = 32,
    eps: float = 1e-12,
) -> LinearOperator:
    """Diagonal preconditioner ``M = diag(A^H A)^{-1}`` (clamped at
    ``eps``), estimated by :func:`estimate_diagonal` unless an exact
    ``diag`` is given. Use as ``cg(N, b, M=M)`` with
    ``N = normal_operator(A)``."""
    if diag is None:
        diag = estimate_diagonal(A, key=key, nsamples=nsamples)
    inv = tree.tmap(
        lambda d: (1.0 / jnp.maximum(jnp.real(d), eps)).astype(A.dom.dtype),
        diag,
    )
    if isinstance(inv, jnp.ndarray):
        return diagonal_operator(inv)
    # pytree (e.g. BlockVector) diagonal: generic elementwise multiply jet
    def _df(dm, m0, state):
        return tree.tmap(lambda w, x: w * x, state["w"], dm)

    j = Jet(dom=A.dom, rng=A.dom, df=_df, dft="self", state={"w": inv})
    return LinearOperator(j)
