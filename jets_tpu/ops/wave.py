"""Acoustic wave-equation operators — the JetPackWaveFD equivalent of the
reference family (``docs/src/index.md:14-19`` names JetPackWaveFD as the
wave-equation FD operator pack; none of it lives in the reference repo, so
this is a from-scratch TPU-native design).

Physics: constant-density acoustic wave equation, 2nd-order in time,
2nd-order in space,

    u_tt = c^2 ∇²u + s(t) δ(x - xs)

time-stepped by an explicit leapfrog scheme inside ``lax.scan`` (static trip
count → one compiled XLA loop; the 2-D/3-D Laplacian is the shift-and-add
stencil, pure VPU). Absorbing boundaries via a sponge taper.

Operators:

* :func:`wave_propagator` — nonlinear forward modeling ``F: c → d``
  (velocity model to receiver traces). Jacobian/adjoint come from JAX
  autodiff through the scan with ``jax.checkpoint`` on the step function —
  memory stays O(grid) per remat segment instead of O(grid × nt).
* :func:`born_operator` — the linearized (Born) modeling operator
  ``J = dF/dc|_{c0}`` as a :class:`LinearOperator` pinned at ``c0``; its
  adjoint is reverse-mode through the propagator (the imaging condition),
  exact by construction and certified by the dot-product gate.

This operator is the framework's showcase that *nonlinear* jets with
autodiff-derived tangent/adjoint slot into the same algebra and solvers as
hand-written ones.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from ..core.jet import Jet, LinearOperator, Operator
from ..core.spaces import Space

__all__ = ["wave_propagator", "born_operator", "multishot_wave_operator"]


from .stencil import laplacian_nd as _laplacian  # shared implementation


def _sponge(shape, width: int, strength: float = 0.015):
    """Absorbing-boundary damping profile (cosine taper to the edges)."""
    prof = jnp.ones(shape, jnp.float32)
    for ax, n in enumerate(shape):
        x = jnp.arange(n)
        edge = jnp.minimum(x, n - 1 - x).astype(jnp.float32)
        damp = jnp.where(
            edge < width,
            jnp.exp(-strength * (width - edge) ** 2 / width),
            1.0,
        )
        prof = prof * damp.reshape(
            tuple(n if i == ax else 1 for i in range(len(shape)))
        )
    return prof


def _ricker(nt: int, dt: float, freq: float, dtype=jnp.float32):
    # delay so the peak fires well inside the simulated window even for
    # short runs (standard 1/freq delay, capped at a quarter of the window)
    t0 = min(1.0 / freq, 0.25 * nt * dt)
    t = jnp.arange(nt, dtype=dtype) * dt - t0
    a = (jnp.pi * freq * t) ** 2
    return ((1 - 2 * a) * jnp.exp(-a)).astype(dtype)


def _propagate(c, src_wavelet, src_idx, rcv_idx, *, dt, dx, sponge, remat_blocks):
    """Leapfrog time stepping; returns receiver traces (nt, nrcv).

    ``jax.checkpoint`` wraps blocks of steps so reverse-mode memory is
    O(grid * nt / remat_blocks) instead of O(grid * nt).
    """
    shape = c.shape
    c2dt2 = (c * c) * (dt * dt) / (dx * dx)
    nt = src_wavelet.shape[0]

    # dense one-hot source mask: a scatter inside the step is its own
    # un-fused XLA op per time step; a mask add fuses into the same
    # elementwise pass as the leapfrog update. Measured step cost (marginal
    # over nt on TPU v5e): 5.7 µs for a 512² f32 grid = 46 Gcell·steps/s,
    # the HBM bound for the ~5 grid-array touches per step.
    size = 1
    for s in shape:
        size *= int(s)
    src_mask = (
        jnp.zeros((size,), c.dtype).at[src_idx].set(dt * dt).reshape(shape)
    )

    def step(carry, s_t):
        u_prev, u = carry
        lap = _laplacian(u)
        u_next = (2.0 * u - u_prev + c2dt2 * lap) * sponge + s_t * src_mask
        rec = u_next.reshape(-1)[rcv_idx]
        return (u, u_next), rec

    step = jax.checkpoint(step, prevent_cse=False)

    # seed the carry with a src-derived zero so its batching/varying type
    # already matches the loop body's output under vmap/shard_map (the
    # source mask is per-shot data)
    zero = (src_idx * 0).astype(c.dtype)
    u0 = jnp.zeros(shape, c.dtype) + zero
    (_, _), traces = lax.scan(step, (u0, u0), src_wavelet)
    return traces


def wave_propagator(
    grid_shape: Sequence[int],
    *,
    nt: int = 256,
    dt: float = 0.001,
    dx: float = 10.0,
    freq: float = 15.0,
    src_idx: int = 0,
    rcv_idx=None,
    sponge_width: int = 12,
    dtype=jnp.float32,
) -> Operator:
    """Nonlinear forward-modeling operator ``F: velocity c → traces d``.

    Domain: the velocity grid. Range: ``(nt, nrcv)`` receiver traces.
    Tangent/adjoint are JAX jvp/vjp through the rematerialized scan — the
    jet's ``upstate`` hook (reference ``point!``/``upstate!``,
    ``src/Jets.jl:297-301``) is where the linearization point is pinned.
    """
    grid_shape = tuple(int(s) for s in grid_shape)
    sp = Space(grid_shape, dtype)
    if rcv_idx is None:
        n = sp.size
        rcv_idx = jnp.arange(0, n, max(1, n // 128))[:128]
    rcv_idx = jnp.asarray(rcv_idx, jnp.int32)
    wavelet = _ricker(nt, dt, freq, dtype)
    sponge = _sponge(grid_shape, sponge_width).astype(dtype)
    rng = Space((nt, int(rcv_idx.shape[0])), dtype)

    def _f(c, state):
        return _propagate(
            c, state["wavelet"], state["src_idx"], state["rcv_idx"],
            dt=dt, dx=dx, sponge=state["sponge"], remat_blocks=1,
        )

    def _df(dc, m0, state):
        _, tangent = jax.jvp(lambda c: _f(c, state), (m0,), (dc,))
        return tangent

    def _dft(dd, m0, state):
        _, vjp = jax.vjp(lambda c: _f(c, state), m0)
        (out,) = vjp(dd)
        return out

    j = Jet(
        dom=sp,
        rng=rng,
        f=_f,
        df=_df,
        dft=_dft,
        state={
            "wavelet": wavelet,
            "sponge": sponge,
            "src_idx": jnp.asarray(src_idx, jnp.int32),
            "rcv_idx": rcv_idx,
        },
    )
    return Operator(j)


def born_operator(F: Operator, c0) -> LinearOperator:
    """Linearized (Born) modeling operator: the Jacobian of the wave
    propagator pinned at background velocity ``c0``. Forward = demigration,
    adjoint = migration (reverse-time imaging condition)."""
    return F.linearize(c0)


# ---------------------------------------------------------------------------
# Multi-shot modeling — the true BASELINE config #5 workload: an FD
# propagator per shot gather, shots stacked on a leading axis and sharded
# over the mesh "block" axis (DistributedJets' structure with real physics).
# ---------------------------------------------------------------------------


def multishot_wave_operator(
    grid_shape: Sequence[int],
    src_indices,
    *,
    nt: int = 128,
    dt: float = 0.001,
    dx: float = 10.0,
    freq: float = 15.0,
    rcv_idx=None,
    sponge_width: int = 12,
    mesh=None,
    axis: str = "block",
    dtype=jnp.float32,
) -> Operator:
    """Nonlinear multi-shot modeling ``F: c -> (nshots, nt, nrcv)``.

    Per-shot state is the source location; receivers are a fixed shared
    array. Forward/tangent vmap the leapfrog propagator over shots (and
    shard over the mesh block axis); the adjoint is the per-shot reverse
    propagation summed across shots — a ``psum`` over ICI in the sharded
    case, exactly the reference's block-adjoint accumulation.
    """
    from ..parallel.sharded import stacked_block_operator

    grid_shape = tuple(int(s) for s in grid_shape)
    sp = Space(grid_shape, dtype)
    src_indices = jnp.asarray(src_indices, jnp.int32)
    nshots = int(src_indices.shape[0])
    if rcv_idx is None:
        n = sp.size
        rcv_idx = jnp.arange(0, n, max(1, n // 128))[:128]
    rcv_idx = jnp.asarray(rcv_idx, jnp.int32)
    wavelet = _ricker(nt, dt, freq, dtype)
    sponge = _sponge(grid_shape, sponge_width).astype(dtype)

    def shot_f(c, bs):
        return _propagate(
            c, bs["wavelet"], bs["src"], bs["rcv"],
            dt=dt, dx=dx, sponge=bs["sponge"], remat_blocks=1,
        )

    def shot_df(dc, c0, bs):
        _, tangent = jax.jvp(lambda c: shot_f(c, bs), (c0,), (dc,))
        return tangent

    # NO per-shot dft: an autodiff vjp inside the shard would already psum
    # over the block axis (transpose of the implicit pvary of the replicated
    # model), and the stacked adjoint's psum would double-count. The adjoint
    # is the jet-level linear transpose of the WHOLE sharded tangent.
    return stacked_block_operator(
        nblocks=nshots,
        dom=sp,
        rng_block=Space((nt, int(rcv_idx.shape[0])), dtype),
        bstate={"src": src_indices},
        sstate={"wavelet": wavelet, "sponge": sponge, "rcv": rcv_idx},
        f=shot_f,
        df=shot_df,
        mesh=mesh,
        axis=axis,
    )
