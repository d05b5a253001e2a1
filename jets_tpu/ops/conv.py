"""1-D convolution and derivative operators — the deconvolution chain
``A = D ∘ S`` of BASELINE config #2 (companion-pack ops in the reference
family, named in ``docs/src/index.md:14-19``).

Forwards are XLA convolutions (MXU/VPU-friendly, statically shaped); adjoints
are *derived* via ``jax.linear_transpose`` — XLA transposes a convolution into
another convolution, so the derived adjoint is as fast as a hand-written one
and exact by construction (then certified by the dot-product gate in CI).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ..core.jet import Jet, LinearOperator
from ..core.spaces import Space

__all__ = ["conv1d_operator", "derivative_operator", "gradient_operator"]


def _conv_same(m, k):
    """Same-length 1-D convolution via conv_general_dilated."""
    L = k.shape[0]
    pad_lo = (L - 1) // 2
    pad_hi = L - 1 - pad_lo
    out = lax.conv_general_dilated(
        m[None, None, :],
        k[::-1][None, None, :],  # conv (not correlation): flip the kernel
        window_strides=(1,),
        padding=[(pad_lo, pad_hi)],
        dimension_numbers=("NCH", "OIH", "NCH"),
    )
    return out[0, 0, :]


def _conv1d_df(dm, m0, state):
    return _conv_same(dm, state["kernel"])


def conv1d_operator(kernel, n: int, dtype=jnp.float32) -> LinearOperator:
    """Same-length convolution with ``kernel`` on 1-D signals of length ``n``
    (e.g. a source wavelet ``S`` in seismic deconvolution)."""
    kernel = jnp.asarray(kernel, dtype)
    sp = Space((n,), dtype)
    j = Jet(dom=sp, rng=sp, df=_conv1d_df, state={"kernel": kernel})
    return LinearOperator(j)


def _deriv_df(dm, m0, state):
    # forward difference with zero boundary: d[i] = (m[i+1] - m[i]) / dx
    dx = state["dx"]
    d = (dm[1:] - dm[:-1]) / dx
    return jnp.concatenate([d, jnp.zeros((1,), dm.dtype)])


def gradient_operator(space: Space, dx: float = 1.0) -> LinearOperator:
    """n-D forward-difference gradient: ``dom(shape) -> rng((nd,) + shape)``
    with ``(∇m)[ax, ..., i, ...] = (m[i+1] - m[i]) / dx`` along each axis
    (zero at the trailing face). The standard smoothing / total-variation
    regularization operator of inversion workflows; the adjoint (negative
    divergence with boundary terms) is derived via ``jax.linear_transpose``.
    """
    nd = space.ndim
    inv = 1.0 / float(dx)

    def _df(dm, m0, state):
        outs = []
        for ax in range(nd):
            d = (jnp.roll(dm, -1, axis=ax) - dm) * inv
            # zero the wrapped trailing face
            idx = [slice(None)] * nd
            idx[ax] = slice(-1, None)
            d = d.at[tuple(idx)].set(0.0)
            outs.append(d)
        return jnp.stack(outs, axis=0)

    j = Jet(
        dom=space,
        rng=Space((nd,) + space.shape, space.dtype),
        df=_df,
    )
    return LinearOperator(j)


def derivative_operator(n: int, dx: float = 1.0, dtype=jnp.float32) -> LinearOperator:
    """First-difference derivative ``D`` on 1-D signals of length ``n``
    (zero-padded at the right boundary); adjoint is the negative backward
    difference, derived automatically."""
    sp = Space((n,), dtype)
    j = Jet(dom=sp, rng=sp, df=_deriv_df, state={"dx": float(dx)})
    return LinearOperator(j)
