"""Elementwise nonlinear operators — counterparts of the reference's
fixture/demo nonlinear jets (``JopBar`` elementwise square
``test/runtests.jl:20-25``, ``JopRosenbrock`` with its ``upstate!`` hook
``test/runtests.jl:41-50``) promoted to shipped ops, since they are the
canonical examples of (a) a nonlinear jet and (b) derived-state refresh at
linearization time.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp

from ..core.jet import Jet, LinearOperator, Operator
from ..core.spaces import Space

__all__ = [
    "square_operator",
    "power_operator",
    "nonlinear_elementwise",
    "exp_operator",
    "log_operator",
    "sqrt_operator",
    "tanh_operator",
    "sigmoid_operator",
    "atan_operator",
    "sin_operator",
    "cos_operator",
]


def _square_f(m, state):
    return m * m


def _square_df(dm, m0, state):
    return 2.0 * m0 * dm


def square_operator(space: Space) -> Operator:
    """Elementwise square ``d = m.^2`` (reference ``JopBar``); self-adjoint
    tangent."""
    j = Jet(dom=space, rng=space, f=_square_f, df=_square_df, dft="self")
    return Operator(j)


def _power_upstate(m0, state):
    """Precompute the tangent diagonal when the linearization point moves —
    the reference's ``upstate!`` pattern (``src/Jets.jl:297-301``)."""
    p = state["p"]
    return {"diag": p * m0 ** (p - 1)}


def _power_f(m, state):
    return m ** state["p"]


def _power_df(dm, m0, state):
    return state["diag"] * dm


def _power_dft(dd, m0, state):
    return jnp.conj(state["diag"]) * dd


def power_operator(space: Space, p: float) -> Operator:
    """Elementwise power ``d = m.^p`` whose tangent diagonal is refreshed by
    the ``upstate`` hook at ``linearize`` time (exercises the reference's
    derived-state machinery)."""
    j = Jet(
        dom=space,
        rng=space,
        f=_power_f,
        df=_power_df,
        dft=_power_dft,
        upstate=_power_upstate,
        state={"p": float(p), "diag": space.zeros()},
    )
    return Operator(j)


def nonlinear_elementwise(
    space: Space, f: Callable, dfdm: Callable
) -> Operator:
    """General elementwise nonlinear operator from ``f(m)`` and its
    elementwise derivative ``dfdm(m)``; adjoint is the conjugate diagonal."""

    def _f(m, state):
        return f(m)

    def _df(dm, m0, state):
        return dfdm(m0) * dm

    def _dft(dd, m0, state):
        return jnp.conj(dfdm(m0)) * dd

    j = Jet(dom=space, rng=space, f=_f, df=_df, dft=_dft)
    return Operator(j)


# --- named convenience nonlinears (the JetPack elementwise family:
# JopExp/JopLog/JopSqrt/JopTanh/JopSigmoid/JopAtan/JopSin/JopCos pattern) ---

def exp_operator(space: Space) -> Operator:
    """``d = exp(m)``; tangent diagonal ``exp(m0)``."""
    return nonlinear_elementwise(space, jnp.exp, jnp.exp)


def log_operator(space: Space) -> Operator:
    """``d = log(m)`` (domain: positive models); tangent diagonal ``1/m0``."""
    return nonlinear_elementwise(space, jnp.log, lambda m: 1.0 / m)


def sqrt_operator(space: Space) -> Operator:
    """``d = sqrt(m)``; tangent diagonal ``1/(2*sqrt(m0))``."""
    return nonlinear_elementwise(
        space, jnp.sqrt, lambda m: 0.5 / jnp.sqrt(m)
    )


def tanh_operator(space: Space) -> Operator:
    """``d = tanh(m)``; tangent diagonal ``1 - tanh(m0)^2``."""
    return nonlinear_elementwise(
        space, jnp.tanh, lambda m: 1.0 - jnp.tanh(m) ** 2
    )


def sigmoid_operator(space: Space) -> Operator:
    """Logistic ``d = 1/(1+exp(-m))``; tangent diagonal ``d*(1-d)``."""

    def _sig(m):
        return jax.nn.sigmoid(m)

    return nonlinear_elementwise(
        space, _sig, lambda m: _sig(m) * (1.0 - _sig(m))
    )


def atan_operator(space: Space) -> Operator:
    """``d = atan(m)``; tangent diagonal ``1/(1+m0^2)``."""
    return nonlinear_elementwise(
        space, jnp.arctan, lambda m: 1.0 / (1.0 + m * m)
    )


def sin_operator(space: Space) -> Operator:
    """``d = sin(m)``; tangent diagonal ``cos(m0)``."""
    return nonlinear_elementwise(space, jnp.sin, jnp.cos)


def cos_operator(space: Space) -> Operator:
    """``d = cos(m)``; tangent diagonal ``-sin(m0)``."""
    return nonlinear_elementwise(space, jnp.cos, lambda m: -jnp.sin(m))
