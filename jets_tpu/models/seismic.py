"""Flagship model: multi-shot linearized seismic-style inversion.

BASELINE configs #4/#5: a tall block-column operator over shot gathers —
the exact structure DistributedJets.jl distributes over workers (block rows
= shots; SURVEY §2 ledger) — built here as a :func:`stacked_block_operator`
so shots batch on a leading axis, shard over the mesh ``"block"`` axis, and
the adjoint accumulates with one ``psum``.

Per-shot physics (linearized Born-style modeling, kept linear):

    d_b = R_b [ w_b ⊙ (L m) ]

* ``L`` — constant-coefficient Laplacian stencil on the model grid (XLA conv
  on the TPU convolution path);
* ``w_b`` — per-shot source-illumination weights (elementwise, fuses into
  the conv epilogue);
* ``R_b`` — restriction to that shot's receiver locations (XLA gather).

The adjoint (scatter → weight → transposed stencil) is derived via
``jax.linear_transpose`` and certified by the dot-product gate in the tests.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh

from ..core.jet import Operator
from ..core.spaces import Space
from ..parallel.sharded import stacked_block_operator

__all__ = ["make_seismic_operator", "make_seismic_problem"]


def _laplacian_kernel(nd: int, dtype):
    k = jnp.zeros((3,) * nd, dtype)
    k = k.at[(1,) * nd].set(-2.0 * nd)
    for ax in range(nd):
        for off in (0, 2):
            k = k.at[tuple(off if i == ax else 1 for i in range(nd))].set(1.0)
    return k


def _stencil_same(m, k):
    nd = k.ndim
    pads = [((s - 1) // 2, s - 1 - (s - 1) // 2) for s in k.shape]
    kf = k[tuple(slice(None, None, -1) for _ in range(nd))]
    spatial = "".join("DHW"[3 - nd + i] for i in range(nd))
    dn = lax.conv_dimension_numbers(
        (1, 1) + m.shape, (1, 1) + k.shape,
        ("NC" + spatial, "OI" + spatial, "NC" + spatial),
    )
    out = lax.conv_general_dilated(
        m[None, None], kf[None, None], (1,) * nd, pads, dimension_numbers=dn
    )
    return out[0, 0]


def make_seismic_operator(
    grid_shape: Sequence[int],
    nshots: int,
    nreceivers: int,
    key: jax.Array,
    *,
    mesh: Optional[Mesh] = None,
    axis: str = "block",
    dtype=jnp.float32,
) -> Operator:
    """Build the multi-shot linearized modeling operator.

    Model space: ``grid_shape`` (2-D or 3-D). Range: ``(nshots, nreceivers)``.
    Per-shot state (stacked, sharded over the mesh block axis when given):
    illumination weights ``w`` and receiver flat indices ``rcv``.
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    nd = len(grid_shape)
    dom = Space(grid_shape, dtype)
    kern = _laplacian_kernel(nd, dtype)
    kw, kr = jax.random.split(key)

    # per-shot gaussian illumination centered at a random source location
    centers = jnp.stack(
        [
            jax.random.randint(jax.random.fold_in(kw, ax), (nshots,), 0, s)
            for ax, s in enumerate(grid_shape)
        ],
        axis=1,
    ).astype(dtype)
    grids = jnp.meshgrid(
        *[jnp.arange(s, dtype=dtype) for s in grid_shape], indexing="ij"
    )
    sigma = jnp.asarray(max(grid_shape) / 4.0, dtype)

    def _illum(center):
        r2 = sum((g - c) ** 2 for g, c in zip(grids, center))
        return jnp.exp(-0.5 * r2 / sigma**2)

    w = jax.vmap(_illum)(centers)  # (nshots, *grid_shape)

    ncells = dom.size
    rcv = jax.random.randint(kr, (nshots, nreceivers), 0, ncells)

    def shot_df(dm, m0, bs, __k=kern):
        u = _stencil_same(dm, __k)
        u = u * bs["w"]
        return jnp.ravel(u)[bs["rcv"]]

    return stacked_block_operator(
        nblocks=nshots,
        dom=dom,
        rng_block=Space((nreceivers,), dtype),
        bstate={"w": w, "rcv": rcv},
        df=shot_df,
        mesh=mesh,
        axis=axis,
    )


def make_seismic_problem(
    grid_shape: Sequence[int],
    nshots: int,
    nreceivers: int,
    seed: int = 0,
    *,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
) -> Tuple[Operator, jax.Array, jax.Array]:
    """Operator + ground-truth reflectivity model + observed data."""
    key = jax.random.PRNGKey(seed)
    k_op, k_m = jax.random.split(key)
    A = make_seismic_operator(
        grid_shape, nshots, nreceivers, k_op, mesh=mesh, dtype=dtype
    )
    # sparse spike reflectivity
    m_true = A.dom.zeros()
    flat = jnp.ravel(m_true)
    spikes = jax.random.choice(
        k_m, flat.shape[0], (max(4, flat.shape[0] // 200),), replace=False
    )
    m_true = jnp.reshape(
        flat.at[spikes].set(1.0), A.dom.shape
    )
    d_obs = A(m_true)
    return A, m_true, d_obs
