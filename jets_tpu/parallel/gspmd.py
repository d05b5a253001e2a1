"""GSPMD multi-axis distribution — block (shots) × grid (model) sharding.

The ``shard_map`` path (``sharded.py``) pins collectives explicitly on a 1-D
block mesh. For pod-scale 3-D problems (BASELINE config #5) the model grid
itself must also shard; the idiomatic XLA route is **GSPMD**: build a 2-D
mesh, place data with ``NamedSharding`` annotations, run the *unmapped*
(vmap) operator path under ``jit``, and let XLA partition the program —
inserting halo exchanges for the stencil, gather/scatter collectives for the
sampling, and all-reduces for the solver's inner products (the
scaling-book recipe: pick a mesh, annotate shardings, let XLA do the rest).

The same jitted Krylov solvers run unchanged; only data placement differs.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh_2d",
    "shard_data",
    "shard_model",
    "constrain_model",
]


def make_mesh_2d(
    n_block: int,
    n_grid: int,
    *,
    axes: Tuple[str, str] = ("block", "grid"),
) -> Mesh:
    """A (block × grid) device mesh: shots shard over ``axes[0]``, the
    model's leading grid dimension over ``axes[1]``."""
    devs = jax.devices()
    if n_block * n_grid > len(devs):
        raise ValueError(
            f"mesh {n_block}x{n_grid} needs {n_block * n_grid} devices, "
            f"have {len(devs)}"
        )
    return jax.make_mesh(
        (n_block, n_grid), axes,
        devices=devs[: n_block * n_grid],
        axis_types=(jax.sharding.AxisType.Auto,) * 2,
    )


def shard_data(x, mesh: Mesh, *, axis: str = "block"):
    """Shard a stacked (nshots, ...) data array over the block axis,
    replicated over the grid axis."""
    spec = P(axis, *([None] * (jnp.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def shard_model(m, mesh: Mesh, *, axis: str = "grid"):
    """Shard a model grid's leading dimension over the grid axis,
    replicated over the block axis."""
    spec = P(axis, *([None] * (jnp.ndim(m) - 1)))
    return jax.device_put(m, NamedSharding(mesh, spec))


def constrain_model(m, mesh: Mesh, *, axis: str = "grid"):
    """In-graph sharding hint for intermediate model-space values."""
    spec = P(axis, *([None] * (jnp.ndim(m) - 1)))
    return jax.lax.with_sharding_constraint(m, NamedSharding(mesh, spec))
