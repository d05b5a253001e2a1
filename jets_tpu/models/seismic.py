"""Flagship model: multi-shot linearized seismic-style inversion.

BASELINE configs #4/#5: a tall block-column operator over shot gathers —
the exact structure DistributedJets.jl distributes over workers (block rows
= shots; SURVEY §2 ledger).

Per-shot physics (linearized Born-style modeling, kept linear):

    d_b = R_b [ w_b ⊙ (L m) ] = w_b[rcv_b] * (L m)[rcv_b]

Architecture (performance-driven, measured on TPU v5e):

* the operator is the framework's own composition ``A = S ∘ L``:
  - ``L`` — shared Laplacian stencil on the model grid, computed ONCE per
    apply (shift-and-add slices, pure VPU; self-adjoint);
  - ``S`` — :func:`stacked_block_operator` sampling the wavefield at each
    shot's receivers with per-shot weights stored **at receiver points
    only** (``wr = w[rcv]``, (nshots, nrecv)) — the full per-shot weight
    grids never exist, so forward reads O(nshots·nrecv) instead of
    O(nshots·grid) (XLA does not fuse a gather into a broadcast-multiply
    epilogue on its own; measured ~4x on the matvec pair);
  - ``S``'s adjoint is a whole-stack flat scatter-add (``stack_dft``): one
    scatter of nshots·nrecv weighted values into one grid, then ``psum``
    over the mesh block axis in the sharded case, then ``L`` once.
* shots shard over the mesh ``"block"`` axis; the model is replicated; the
  adjoint accumulation is a single ICI collective.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.algebra import compose
from ..core.jet import Operator
from ..core.spaces import Space
from ..ops.stencil import laplacian_operator
from ..parallel.sharded import stacked_block_operator

__all__ = ["make_seismic_operator", "make_seismic_problem"]


def _sample_df(u, m0, bs):
    """Per-shot forward: gather the shared wavefield at the FIXED receiver
    array (the gather is block-invariant, so vmap computes it once), weight
    by the per-shot receiver-point illumination."""
    return jnp.ravel(u)[bs["rcv"]] * bs["wr"]


def _make_sample_stack_dft(grid_shape):
    size = 1
    for s in grid_shape:
        size *= int(s)

    def stack_dft(dd, m0, bs):
        """Whole-stack adjoint: reduce the weighted residuals over the local
        shots — (nshots, nrecv) → (nrecv,) — then ONE scatter-add into the
        wavefield grid (the block-accumulation loop of the reference,
        src/Jets.jl:1034-1057, as a reduction + a single XLA scatter)."""
        g = jnp.sum(dd * bs["wr"], axis=0)  # (nrecv,)
        z = jnp.zeros((size,), dd.dtype)
        return z.at[bs["rcv"]].add(g).reshape(grid_shape)

    return stack_dft


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
    """Build the multi-shot linearized modeling operator ``A = S ∘ L``.

    Model space: ``grid_shape`` (2-D or 3-D). Range: ``(nshots, nreceivers)``.
    Per-shot state (stacked, sharded over the mesh block axis when given):
    receiver flat indices ``rcv`` and receiver-point weights ``wr``.
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    dom = Space(grid_shape, dtype)
    kw, kr = jax.random.split(key)

    # FIXED receiver array shared by all shots (standard surface acquisition
    # geometry): receivers spread evenly over the top rows of the grid. A
    # shared geometry makes the sampling gather block-invariant (computed
    # once per apply, not per shot) and the adjoint a reduction + ONE
    # scatter — measured ~50x faster than per-shot random receivers.
    ncells = dom.size
    step = max(1, ncells // nreceivers)
    jitter = jax.random.randint(kr, (nreceivers,), 0, step)
    rcv = (jnp.arange(nreceivers) * step + jitter) % ncells  # (nrecv,)

    # per-shot gaussian illumination centered at a random source location,
    # evaluated AT THE RECEIVER POINTS only
    centers = jnp.stack(
        [
            jax.random.randint(jax.random.fold_in(kw, ax), (nshots,), 0, s)
            for ax, s in enumerate(grid_shape)
        ],
        axis=1,
    ).astype(dtype)
    sigma = jnp.asarray(max(grid_shape) / 4.0, dtype)
    rcv_coords = jnp.stack(
        jnp.unravel_index(rcv, grid_shape), axis=-1
    ).astype(dtype)  # (nrecv, nd)
    r2 = jnp.sum((rcv_coords[None, :, :] - centers[:, None, :]) ** 2, axis=-1)
    wr = jnp.exp(-0.5 * r2 / sigma**2)  # (nshots, nrecv)

    L = laplacian_operator(grid_shape, dtype)
    S = stacked_block_operator(
        nblocks=nshots,
        dom=dom,
        rng_block=Space((nreceivers,), dtype),
        bstate={"wr": wr},
        sstate={"rcv": rcv},
        df=_sample_df,
        stack_dft=_make_sample_stack_dft(grid_shape),
        mesh=mesh,
        axis=axis,
    )
    return compose(S, L)


def make_seismic_problem(
    grid_shape: Sequence[int],
    nshots: int,
    nreceivers: int,
    seed: int = 0,
    *,
    mesh: Optional[Mesh] = None,
    noise: float = 0.0,
    dtype=jnp.float32,
) -> Tuple[Operator, jax.Array, jax.Array]:
    """Operator + ground-truth reflectivity model + observed data.

    ``noise`` adds gaussian observation noise of that relative amplitude,
    making the least-squares problem inconsistent (no exact data fit) — use
    it for benchmarking so Krylov loops run their full iteration budget.
    """
    key = jax.random.PRNGKey(seed)
    k_op, k_m, k_n = jax.random.split(key, 3)
    A = make_seismic_operator(
        grid_shape, nshots, nreceivers, k_op, mesh=mesh, dtype=dtype
    )
    # sparse spike reflectivity over a weak smooth background (the background
    # keeps the data nonzero even when few receivers neighbor a spike)
    k_s, k_bg = jax.random.split(k_m)
    flat = jnp.zeros((A.dom.size,), dtype)
    spikes = jax.random.choice(
        k_s, flat.shape[0], (max(4, flat.shape[0] // 200),), replace=False
    )
    bg = 0.05 * jax.random.normal(k_bg, (A.dom.size,), dtype)
    m_true = jnp.reshape(flat.at[spikes].set(1.0) + bg, A.dom.shape)
    d_obs = A(m_true)
    if noise > 0:
        scale = noise * jnp.std(d_obs)
        d_obs = d_obs + scale * jax.random.normal(k_n, d_obs.shape, dtype)
    return A, m_true, d_obs
