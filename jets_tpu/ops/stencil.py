"""Stencil operators — 2-D blur and 3-D seismic-style stencils
(BASELINE configs #3 and #5; companion-pack territory in the reference
family, ``docs/src/index.md:14-19``).

The generic path lowers to ``lax.conv_general_dilated`` with SAME padding —
XLA maps these onto the TPU convolution path and *transposes them into
convolutions* for the derived adjoint, so both directions run at conv speed.
A fused Pallas kernel for the hot separable/small-stencil cases lives in
``pallas_stencil.py``; both implementations are gated by the same dot-product
test and cross-checked against each other in the test-suite.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from jax import lax

from ..core.jet import Jet, LinearOperator
from ..core.spaces import Space

__all__ = [
    "laplacian_nd",
    "stencil_operator",
    "blur2d_operator",
    "laplacian_operator",
]


def _stencil_df(dm, m0, state):
    k = state["stencil"]
    nd = k.ndim
    pads = [((s - 1) // 2, s - 1 - (s - 1) // 2) for s in k.shape]
    # conv (not correlation): flip the stencil on every axis
    kf = k[tuple(slice(None, None, -1) for _ in range(nd))]
    spatial = "".join("DHW"[-nd + i] for i in range(nd)) if nd <= 3 else None
    if spatial is None:
        raise ValueError("stencil_operator supports 1-3 spatial dims")
    dn = lax.conv_dimension_numbers(
        (1, 1) + dm.shape, (1, 1) + k.shape,
        ("NC" + spatial, "OI" + spatial, "NC" + spatial),
    )
    out = lax.conv_general_dilated(
        dm[None, None], kf[None, None],
        window_strides=(1,) * nd,
        padding=pads,
        dimension_numbers=dn,
    )
    return out[0, 0]


def stencil_operator(space: Space, stencil) -> LinearOperator:
    """Constant-coefficient stencil applied with SAME (zero) padding on an
    n-D grid (n ≤ 3). The adjoint (the flipped stencil) is derived via
    ``linear_transpose`` → an XLA transposed convolution."""
    stencil = jnp.asarray(stencil, space.dtype)
    if stencil.ndim != space.ndim:
        raise ValueError(
            f"stencil ndim {stencil.ndim} != space ndim {space.ndim}"
        )
    j = Jet(dom=space, rng=space, df=_stencil_df, state={"stencil": stencil})
    return LinearOperator(j)


def blur2d_operator(shape: Sequence[int], radius: int = 2,
                    dtype=jnp.float32) -> LinearOperator:
    """Gaussian-ish box blur on a 2-D grid — the CGLS deblurring operator of
    BASELINE config #3."""
    n = 2 * radius + 1
    x = jnp.arange(n, dtype=dtype) - radius
    g = jnp.exp(-0.5 * (x / max(radius, 1)) ** 2)
    k = jnp.outer(g, g)
    k = k / jnp.sum(k)
    return stencil_operator(Space(shape, dtype), k)


def laplacian_nd(x):
    """n-D Laplacian via shifted slices of a zero-padded array — pure VPU
    adds, measurably faster on TPU than a 1-channel XLA convolution, and
    exactly symmetric with the zero boundary (self-adjoint). THE single
    shared implementation: the wave propagator and the fused seismic
    flagship import this so their bit-exactness guarantees hold."""
    nd = x.ndim
    xp = jnp.pad(x, 1)
    out = (-2.0 * nd) * x
    for ax in range(nd):
        lo = tuple(slice(0, -2) if i == ax else slice(1, -1) for i in range(nd))
        hi = tuple(slice(2, None) if i == ax else slice(1, -1) for i in range(nd))
        out = out + xp[lo] + xp[hi]
    return out


def _laplacian_df(dm, m0, state):
    return laplacian_nd(dm)


def _laplacian_pallas_df(dm, m0, state):
    if dm.ndim == 3:
        from .pallas_solver import laplacian3d

        return laplacian3d(dm, interpret=state["interpret"])
    from .pallas_stencil import laplacian2d_pallas

    return laplacian2d_pallas(dm, interpret=state["interpret"])


def laplacian_operator(
    shape: Sequence[int], dtype=jnp.float32, *, impl: str = "xla"
) -> LinearOperator:
    """Second-order n-D Laplacian stencil — the seismic-style wave-operator
    building block of BASELINE config #5. Self-adjoint (symmetric stencil,
    zero boundary).

    ``impl="xla"`` (default): shift-and-add slices — measured at the HBM
    bandwidth bound on TPU v5e (19 µs for a 2048² f32 grid).
    ``impl="pallas"``: hand-written zero-copy DMA pipelines — 2-D
    (``pallas_stencil.py``: predicated halo DMAs, bit-exact, at parity
    with XLA's 21 µs HBM bound) and 3-D (``pallas_solver.laplacian3d``:
    slab-pipelined double-buffered ring, bit-exact; its axpy/norm-fused
    sibling ``lap3d_axpy_norm2`` is the solver epilogue that beats the XLA
    chain 3.1× on 256³). On CPU backends both run in interpret mode.
    """
    sp = Space(shape, dtype)
    if impl == "pallas":
        if len(shape) not in (2, 3) or jnp.dtype(dtype) != jnp.float32:
            raise ValueError(
                "pallas laplacian supports 2-D/3-D float32 grids"
            )
        interpret = jax.default_backend() == "cpu"
        j = Jet(dom=sp, rng=sp, df=_laplacian_pallas_df, dft="self",
                state={"interpret": interpret})
    else:
        j = Jet(dom=sp, rng=sp, df=_laplacian_df, dft="self")
    return LinearOperator(j)
