"""Block vector spaces — reference ``JetBSpace``/``BlockArray``
(``src/Jets.jl:736-924``).

A :class:`BlockSpace` concatenates heterogeneous subspaces into one logical
1-D space with per-block index ranges; a :class:`BlockVector` is the member
type — a registered pytree of per-block nD arrays, so it flows through
``jit``/``tree_map`` and the Krylov solvers untouched.

This layer is the framework's distribution boundary (SURVEY §2 ledger): in
the parallel layer, block rows shard over a mesh ``"block"`` axis and these
blockwise ``dot``/``norm`` reductions become local partials + ``psum``.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .spaces import Space

__all__ = ["BlockSpace", "BlockVector"]


class BlockVector:
    """Member of a :class:`BlockSpace`: a tuple of per-block arrays.

    Functional counterpart of the reference ``BlockArray``
    (``src/Jets.jl:809-924``): supports blockwise arithmetic, ``dot``/``norm``
    (delegating to each subspace so symmetric blocks weight correctly),
    ``getblock``/``setblock`` (functional), and zero-copy flattening.
    """

    __slots__ = ("blocks", "space")

    def __init__(self, blocks: Sequence[jax.Array], space: "BlockSpace"):
        object.__setattr__(self, "blocks", tuple(blocks))
        object.__setattr__(self, "space", space)

    def __setattr__(self, *a):  # pragma: no cover
        raise AttributeError("BlockVector is immutable; use setblock()")

    # -- block access (reference getblock/setblock!, :914-920) --------------
    @property
    def nblocks(self) -> int:
        return len(self.blocks)

    def getblock(self, i: int) -> jax.Array:
        return self.blocks[i]

    def setblock(self, i: int, value) -> "BlockVector":
        sub = self.space.spaces[i]
        v = jnp.asarray(value)
        if v.shape != sub.shape:
            raise ValueError(f"block {i}: shape {v.shape} != {sub.shape}")
        new = list(self.blocks)
        new[i] = v.astype(sub.dtype)
        return BlockVector(new, self.space)

    def __getitem__(self, i: int) -> jax.Array:
        return self.blocks[i]

    def __iter__(self):
        return iter(self.blocks)

    def __len__(self) -> int:
        return self.space.size

    # -- conversion (reference convert(Array, ⋅), :862-868) -----------------
    def ravel(self) -> jax.Array:
        return jnp.concatenate([jnp.ravel(b) for b in self.blocks])

    def to_array(self) -> jax.Array:
        return self.ravel()

    # -- blockwise arithmetic ------------------------------------------------
    def _zip(self, other, fn):
        if isinstance(other, BlockVector):
            if other.space != self.space:
                raise ValueError("BlockVector space mismatch")
            return BlockVector(
                [fn(a, b) for a, b in zip(self.blocks, other.blocks)], self.space
            )
        return BlockVector([fn(a, other) for a in self.blocks], self.space)

    def __add__(self, other):
        return self._zip(other, lambda a, b: a + b)

    def __radd__(self, other):
        return self._zip(other, lambda a, b: b + a)

    def __sub__(self, other):
        return self._zip(other, lambda a, b: a - b)

    def __rsub__(self, other):
        return self._zip(other, lambda a, b: b - a)

    def __mul__(self, other):
        return self._zip(other, lambda a, b: a * b)

    def __rmul__(self, other):
        return self._zip(other, lambda a, b: b * a)

    def __truediv__(self, other):
        return self._zip(other, lambda a, b: a / b)

    def __neg__(self):
        return BlockVector([-a for a in self.blocks], self.space)

    # -- reductions (reference norm/dot/extrema, :834-878) -------------------
    def dot(self, other: "BlockVector"):
        return self.space.dot(self, other)

    def norm(self, p: float = 2):
        return self.space.norm(self, p)

    def extrema(self) -> Tuple[jax.Array, jax.Array]:
        lo = jnp.min(jnp.stack([jnp.min(jnp.real(b)) for b in self.blocks]))
        hi = jnp.max(jnp.stack([jnp.max(jnp.real(b)) for b in self.blocks]))
        return lo, hi

    def fill(self, value) -> "BlockVector":
        return BlockVector(
            [jnp.full(b.shape, value, b.dtype) for b in self.blocks], self.space
        )

    def __repr__(self) -> str:
        return f"BlockVector(nblocks={self.nblocks}, space={self.space})"


class BlockSpace(Space):
    """Concatenation of subspaces into one logical 1-D space
    (reference ``JetBSpace``, ``src/Jets.jl:736-760``)."""

    __slots__ = ("_spaces", "_offsets")

    def __init__(self, spaces: Sequence[Space]):
        spaces = tuple(spaces)
        if not spaces:
            raise ValueError("BlockSpace needs at least one subspace")
        dt = spaces[0].dtype
        for s in spaces:
            if s.dtype != dt:
                raise TypeError(
                    f"BlockSpace subspaces must share a dtype; got {s.dtype} vs {dt}"
                )
        total = sum(s.size for s in spaces)
        super().__init__((total,), dt)
        object.__setattr__(self, "_spaces", spaces)
        offs = np.cumsum([0] + [s.size for s in spaces])
        object.__setattr__(self, "_offsets", tuple(int(o) for o in offs))

    @property
    def spaces(self) -> Tuple[Space, ...]:
        return self._spaces

    @property
    def nblocks(self) -> int:
        return len(self._spaces)

    def indices(self, i: int) -> range:
        """Linear index range of block ``i`` (reference ``indices``)."""
        return range(self._offsets[i], self._offsets[i + 1])

    def subspace(self, i: int) -> Space:
        return self._spaces[i]

    # -- identity ------------------------------------------------------------
    def __eq__(self, other) -> bool:
        return type(self) is type(other) and self._spaces == other._spaces

    def __hash__(self) -> int:
        return hash(("BlockSpace", self._spaces))

    def __repr__(self) -> str:
        return f"BlockSpace(nblocks={self.nblocks}, size={self.size}, {self.dtype.name})"

    # -- allocators ----------------------------------------------------------
    def zeros(self) -> BlockVector:
        return BlockVector([s.zeros() for s in self._spaces], self)

    def ones(self) -> BlockVector:
        return BlockVector([s.ones() for s in self._spaces], self)

    def rand(self, key) -> BlockVector:
        keys = jax.random.split(key, self.nblocks)
        return BlockVector([s.rand(k) for s, k in zip(self._spaces, keys)], self)

    def randn(self, key) -> BlockVector:
        keys = jax.random.split(key, self.nblocks)
        return BlockVector([s.randn(k) for s, k in zip(self._spaces, keys)], self)

    # -- membership (reference reshape(::Array, R::JetBSpace), :1112) ---------
    def reshape(self, x) -> BlockVector:
        if isinstance(x, BlockVector):
            if x.space != self:
                raise ValueError("BlockVector belongs to a different BlockSpace")
            return x
        x = jnp.ravel(jnp.asarray(x))
        if x.size != self.size:
            raise ValueError(f"cannot reshape size-{x.size} array into {self}")
        blocks = [
            jnp.reshape(x[self._offsets[i]: self._offsets[i + 1]], s.shape).astype(
                s.dtype
            )
            for i, s in enumerate(self._spaces)
        ]
        return BlockVector(blocks, self)

    def ravel(self, x) -> jax.Array:
        if isinstance(x, BlockVector):
            return x.ravel()
        return jnp.reshape(x, (-1,))

    def shape_dtype(self):
        # a BlockVector-STRUCTURED pytree of ShapeDtypeStructs: the derived
        # adjoint (jet `linear_transpose`) traces `df` with this as the
        # primal, so it must carry the same tree structure as real members —
        # a bare tuple would reach block-aware kernels structure-stripped
        return BlockVector(
            tuple(s.shape_dtype() for s in self._spaces), self)

    # -- reductions: per-block partials (future psum points) ------------------
    def dot(self, x, y):
        xb = self.reshape(x).blocks
        yb = self.reshape(y).blocks
        parts = [s.dot(a, b) for s, a, b in zip(self._spaces, xb, yb)]
        return jnp.sum(jnp.stack(parts))

    def norm(self, x, p: float = 2):
        xb = self.reshape(x).blocks
        parts = jnp.stack([s.norm(b, p) for s, b in zip(self._spaces, xb)])
        if p == 2:
            return jnp.sqrt(jnp.sum(parts**2))
        if p == float("inf"):
            return jnp.max(parts)
        if p == float("-inf"):
            return jnp.min(parts)
        if p == 0:
            return jnp.sum(parts)
        return jnp.sum(parts**p) ** (1.0 / p)


# -- pytree registration -----------------------------------------------------


def _bv_flatten(v: BlockVector):
    return v.blocks, v.space


def _bv_unflatten(space, blocks):
    return BlockVector(blocks, space)


jax.tree_util.register_pytree_node(BlockVector, _bv_flatten, _bv_unflatten)
