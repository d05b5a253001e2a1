"""Diagonal operator — the canonical companion-pack op (``JopDiagonal`` from
JetPack, named in the reference docs ``docs/src/index.md:14-19`` and the
BASELINE configs).

``d = w .* m`` with adjoint ``m = conj(w) .* d``. Elementwise → VPU work that
XLA fuses into neighboring ops.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.jet import Jet, LinearOperator
from ..core.spaces import Space, space_of

__all__ = ["diagonal_operator"]


def _diag_df(dm, m0, state):
    return state["w"] * dm


def _diag_dft(dd, m0, state):
    return jnp.conj(state["w"]) * dd


def diagonal_operator(w) -> LinearOperator:
    """Diagonal (elementwise multiply) operator over the space of ``w``."""
    w = jnp.asarray(w)
    sp = space_of(w)
    j = Jet(dom=sp, rng=sp, df=_diag_df, dft=_diag_dft, state={"w": w})
    return LinearOperator(j)
