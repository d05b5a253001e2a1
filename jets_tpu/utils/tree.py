"""Pytree vector helpers used by the Krylov solvers.

Solvers operate on *space members* — plain arrays, :class:`BlockVector`, or
any registered pytree — through ``tree_map`` arithmetic, while inner products
and norms are delegated to the owning :class:`Space` (so symmetric and block
spaces weight correctly). Counterpart of the reference's reliance on Julia
broadcast + ``BlockArray`` reductions (``src/Jets.jl:834-912``).
"""
from __future__ import annotations

import jax


def tmap(fn, *trees):
    return jax.tree_util.tree_map(fn, *trees)


def add(x, y):
    return tmap(lambda a, b: a + b, x, y)


def sub(x, y):
    return tmap(lambda a, b: a - b, x, y)


def scale(a, x):
    return tmap(lambda v: a * v, x)


def axpy(a, x, y):
    """a*x + y."""
    return tmap(lambda xi, yi: a * xi + yi, x, y)


def xpay(x, a, y):
    """x + a*y."""
    return tmap(lambda xi, yi: xi + a * yi, x, y)


def zeros_like(x):
    return tmap(jax.numpy.zeros_like, x)
