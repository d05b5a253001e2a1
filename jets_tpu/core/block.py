"""Block operators — reference ``JetBlock``/``JopBlock``/``@blockop``
(``src/Jets.jl:926-1124``).

A block operator is a block matrix of operators. Forward/tangent walk row
blocks accumulating over columns; the adjoint walks columns accumulating over
rows (``JetBlock_df′!``, ``src/Jets.jl:1034-1057``) — **that accumulation is
exactly what becomes a ``psum`` over the mesh block axis in the parallel
layer** (see ``jets_tpu/parallel``). Structural zeros (:class:`zero_block`,
reference ``JopZeroBlock`` ``src/Jets.jl:941-951``) are elided at trace time,
so XLA never sees them.

Domain rule kept from the reference (``src/Jets.jl:926-930``): a single-column
block operator keeps the child's (non-block) domain unless ``dadom=True``.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp

from .algebra import _wrap, is_composite
from .blockspace import BlockSpace, BlockVector
from .jet import AdjointOperator, Jet, LinearOperator, Operator
from .spaces import Space

__all__ = [
    "block_operator",
    "zero_block",
    "is_zero_block",
    "is_block_op",
    "nblocks",
    "getblock",
]


# ---------------------------------------------------------------------------
# Structural zero block (reference JopZeroBlock, src/Jets.jl:941-951)
# ---------------------------------------------------------------------------


def _zero_df(dm, m0, state):
    return state["rng"].zeros()


def _zero_dft(dd, m0, state):
    return state["dom"].zeros()


def zero_block(dom: Space, rng: Space) -> LinearOperator:
    j = Jet(dom=dom, rng=rng, df=_zero_df, dft=_zero_dft,
            state={"dom": dom, "rng": rng})
    return LinearOperator(j)


def is_zero_block(op: Operator) -> bool:
    """Reference ``iszero`` (src/Jets.jl:949)."""
    return isinstance(op, Operator) and op.jet.df is _zero_df


# ---------------------------------------------------------------------------
# Block operator kernels
# ---------------------------------------------------------------------------


def _col(m, j, block_dom: bool):
    return m.getblock(j) if block_dom else m


def _block_f(m, state):
    ops, rng, block_dom = state["ops"], state["rng"], state["block_dom"]
    rows = []
    for i, row in enumerate(ops):
        acc = None
        for j, op in enumerate(row):
            if is_zero_block(op):
                continue
            term = op(_col(m, j, block_dom))
            acc = term if acc is None else acc + term
        rows.append(rng.subspace(i).zeros() if acc is None else acc)
    return BlockVector(rows, rng)


def _block_df(dm, m0, state):
    ops, rng, block_dom = state["ops"], state["rng"], state["block_dom"]
    rows = []
    for i, row in enumerate(ops):
        acc = None
        for j, op in enumerate(row):
            if is_zero_block(op):
                continue
            if not isinstance(op, LinearOperator):
                raise ValueError(
                    "tangent of a nonlinear block operator requires linearize first"
                )
            term = op(_col(dm, j, block_dom))
            acc = term if acc is None else acc + term
        rows.append(rng.subspace(i).zeros() if acc is None else acc)
    return BlockVector(rows, rng)


def _block_dft(dd, m0, state):
    """Adjoint: column-major accumulation ``m_j += op_ij^H d_i``
    (reference src/Jets.jl:1034-1057) — the future cross-host all-reduce."""
    ops, dom, block_dom = state["ops"], state["dom"], state["block_dom"]
    ncols = len(ops[0])
    cols = []
    for j in range(ncols):
        acc = None
        for i, row in enumerate(ops):
            op = row[j]
            if is_zero_block(op):
                continue
            term = op.adjoint_apply(dd.getblock(i))
            acc = term if acc is None else acc + term
        if acc is None:
            sub = dom.subspace(j) if block_dom else dom
            acc = sub.zeros()
        cols.append(acc)
    if not block_dom:
        return cols[0]
    return BlockVector(cols, dom)


def _block_upstate(m0, state):
    """Distribute the corresponding domain block to every child
    (reference ``point!``, src/Jets.jl:1059-1066)."""
    ops, block_dom = state["ops"], state["block_dom"]
    new_rows = []
    for row in ops:
        new_rows.append(
            tuple(
                op if is_zero_block(op) else op.linearize(_col(m0, j, block_dom))
                for j, op in enumerate(row)
            )
        )
    return {"ops": tuple(new_rows)}


def is_block_op(op: Operator) -> bool:
    """Reference ``isblockop`` (src/Jets.jl:1097)."""
    return isinstance(op, Operator) and op.jet.f is _block_f


# ---------------------------------------------------------------------------
# Construction (reference JetBlock/JopBlock/@blockop, src/Jets.jl:926-986)
# ---------------------------------------------------------------------------


def block_operator(rows: Sequence[Sequence], *, dadom: bool = False) -> Operator:
    """Build a block-matrix operator from a 2-D nest of operators.

    ``rows[i][j]`` maps domain block ``j`` to range block ``i``. Entries may be
    operators, 2-D arrays (auto-wrapped), or :func:`zero_block` instances.
    Returns a :class:`LinearOperator` iff every child is linear
    (reference ``JopBlock``, src/Jets.jl:931-933).
    """
    ops = tuple(tuple(_wrap(e) for e in row) for row in rows)
    if not ops or not ops[0]:
        raise ValueError("block_operator needs a non-empty 2-D nest of operators")
    ncols = len(ops[0])
    for row in ops:
        if len(row) != ncols:
            raise ValueError("ragged block rows")

    # column domains must be consistent
    for j in range(ncols):
        doms = {row[j].dom for row in ops}
        if len(doms) != 1:
            raise ValueError(f"column {j}: inconsistent child domains {doms}")
    # row ranges must be consistent
    for i, row in enumerate(ops):
        rngs = {op.rng for op in row}
        if len(rngs) != 1:
            raise ValueError(f"row {i}: inconsistent child ranges {rngs}")

    block_dom = ncols > 1 or dadom
    dom = BlockSpace([ops[0][j].dom for j in range(ncols)]) if block_dom else ops[0][0].dom
    rng = BlockSpace([row[0].rng for row in ops])

    j = Jet(
        dom=dom,
        rng=rng,
        f=_block_f,
        df=_block_df,
        dft=_block_dft,
        upstate=_block_upstate,
        state={"ops": ops, "dom": dom, "rng": rng, "block_dom": block_dom},
    )
    all_linear = all(isinstance(op, LinearOperator) for row in ops for op in row)
    return (LinearOperator if all_linear else Operator)(j)


# ---------------------------------------------------------------------------
# Block introspection (reference getblock/nblocks, src/Jets.jl:1074-1110)
# ---------------------------------------------------------------------------


def nblocks(op: Operator):
    """(nrows, ncols) of a block operator (reference src/Jets.jl:1074-1077).

    The adjoint check must come first: an AdjointOperator shares its
    underlying jet, so ``is_block_op`` is true for it too."""
    if isinstance(op, AdjointOperator):
        r, c = nblocks(op.op)
        return (c, r)
    if is_block_op(op):
        ops = op.jet.state["ops"]
        return (len(ops), len(ops[0]))
    if is_composite(op):
        rows = cols = 1
        children = op.jet.state["ops"]
        for child in children:
            if is_block_op(child) or isinstance(child, AdjointOperator):
                r, c = nblocks(child)
                rows = max(rows, r)
                cols = max(cols, c)
        return (rows, cols)
    return (1, 1)


def getblock(op: Operator, i: int, j: int = 0) -> Operator:
    """The (i, j) block of a block operator.

    Adjoint block ops return adjoint child blocks with transposed indices
    (reference src/Jets.jl:1088); through a composition, the (i, j) block of
    each blocky factor is composed (src/Jets.jl:1100-1110).
    """
    if isinstance(op, AdjointOperator):
        # adjoint first — it shares the block jet, so is_block_op is true
        inner = getblock(op.op, j, i)
        if not isinstance(inner, LinearOperator):
            raise TypeError("adjoint block of a nonlinear child")
        return inner.H
    if is_block_op(op):
        return op.jet.state["ops"][i][j]
    if is_composite(op):
        from .algebra import compose

        factors = [
            getblock(child, i, j)
            if (is_block_op(child) or (isinstance(child, AdjointOperator)
                                       and is_block_op(child.op)))
            else child
            for child in op.jet.state["ops"]
        ]
        return compose(*factors)
    if i == 0 and j == 0:
        return op
    raise IndexError("not a block operator")
