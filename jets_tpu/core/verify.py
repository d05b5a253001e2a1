"""Correctness gates and operator materialization — L3.

Reference: ``src/Jets.jl:1166-1286``. These are first-class API in the
reference's test philosophy (SURVEY §4): every shipped operator must pass the
dot-product (adjoint) test, linear operators the linearity test, nonlinear
operators the linearization (Taylor-decay) test. The test-suite applies them
to every operator in ``jets_tpu/ops`` as a mandatory CI gate.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from .jet import LinearOperator, Operator
from .spaces import Space

__all__ = [
    "dot_product_test",
    "linearity_test",
    "linearization_test",
    "materialize",
]


def _mask_mul(mask, x):
    if mask is None:
        return x
    if hasattr(x, "_zip"):  # BlockVector
        return x * mask if not hasattr(mask, "_zip") else x._zip(mask, lambda a, b: a * b)
    return mask * x


def dot_product_test(
    A: LinearOperator,
    m,
    d,
    *,
    mmask=None,
    dmask=None,
) -> Tuple[jax.Array, jax.Array]:
    """Return ``(lhs, rhs)`` of the adjoint identity
    ``<d̃, A m̃> == <A^H d̃, m̃>`` with optional masks restricting the test to a
    subset of the spaces (reference ``src/Jets.jl:1211-1226``).

    The two values must agree to roundoff for a correct adjoint pair.

    For mixed real/complex operators (e.g. rfft: real domain, complex range)
    the spaces are compared as real vector spaces: the complex side's inner
    product contributes its real part, matching the reference's convention
    for transform operators.
    """
    mt = _mask_mul(mmask, m)
    dt = _mask_mul(dmask, d)
    lhs = A.rng.dot(dt, A(mt))
    rhs = A.dom.dot(A.adjoint_apply(dt), mt)
    dom_cplx = jnp.issubdtype(A.dom.dtype, jnp.complexfloating)
    rng_cplx = jnp.issubdtype(A.rng.dtype, jnp.complexfloating)
    if rng_cplx and not dom_cplx:
        lhs = jnp.real(lhs)
    if dom_cplx and not rng_cplx:
        rhs = jnp.real(rhs)
    return lhs, rhs


def linearity_test(A: LinearOperator, key: Optional[jax.Array] = None):
    """Check ``A(m1 + m2) == A m1 + A m2`` (reference ``src/Jets.jl:1276-1282``).

    Returns ``(lhs, rhs)`` vectors whose difference should be roundoff.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    m1 = A.dom.randn(k1)
    m2 = A.dom.randn(k2)
    lhs = A(m1 + m2)
    rhs = A(m1) + A(m2)
    return lhs, rhs


def linearization_test(
    F: Operator,
    m0,
    *,
    mu: Sequence[float] = (1.0, 0.5, 0.25, 0.125, 0.0625),
    delta_m=None,
    key: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """Second-order Taylor decay check for the Jacobian
    (reference ``src/Jets.jl:1235-1266``).

    With ``phi(mu) = || F(m0 + mu dm) - F(m0) - mu * J dm ||`` and a halving
    ``mu`` schedule, the ratios ``phi(mu[i-1]) / phi(mu[i])`` should approach
    ``(mu[i-1] / mu[i])**2``. Returns ``(observed_ratios, expected_ratios)``.
    """
    if delta_m is None:
        if key is None:
            key = jax.random.PRNGKey(17)  # deterministic, like the reference seed
        delta_m = F.dom.randn(key)
    J = F.linearize(m0)
    d0 = F(m0)
    Jdm = J(delta_m)
    phis = []
    for mu_i in mu:
        resid = F(m0 + mu_i * delta_m) - d0 - mu_i * Jdm
        phis.append(F.rng.norm(resid))
    phis = jnp.stack(phis)
    observed = phis[:-1] / phis[1:]
    mus = jnp.asarray(mu, dtype=phis.dtype)
    expected = (mus[:-1] / mus[1:]) ** 2
    return observed, expected


def materialize(A: LinearOperator) -> jax.Array:
    """Dense matrix of a linear operator, by applying it to every canonical
    basis vector (reference ``convert(Array, A)``, ``src/Jets.jl:1174-1185``)
    — vmapped so the n applications batch into one XLA program.

    Intended for tests/small operators: O(n) operator applications.
    """
    n = A.dom.size
    dt = A.dom.dtype
    dom, rng = A.dom, A.rng

    def col(e):
        return rng.ravel(A(dom.reshape(e)))

    cols = jax.vmap(col)(jnp.eye(n, dtype=dt))
    return jnp.transpose(cols)  # (rng.size, dom.size)
