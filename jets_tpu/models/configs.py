"""The five BASELINE.json benchmark configurations as runnable problems.

Each builder returns ``(operator, solver_fn, d_obs, info)`` at either its
full benchmark size or a scaled-down size for tests. These are the driver's
difficulty ladder (BASELINE.md):

1. diagonal+matrix composite — CG on a 1k×1k SPD system, dot-product gated;
2. 1-D convolution/derivative chain ``A = D ∘ S`` — LSQR deconvolution, 10k;
3. 2-D blur stencil on a 512² grid — CGLS deblurring, adjoint-test gated;
4. 64-block multi-shot operator — distributed LSQR, psum adjoint reduction;
5. linearized seismic-style 3-D stencil over 256 shots on a pod mesh.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..core.algebra import compose
from ..ops.conv import conv1d_operator, derivative_operator
from ..ops.diagonal import diagonal_operator
from ..ops.matrix import matrix_operator
from ..ops.stencil import blur2d_operator
from ..solvers import cg, cgls, lsqr
from .seismic import make_seismic_problem

__all__ = [
    "config1_spd_cg",
    "config2_deconv_lsqr",
    "config3_deblur_cgls",
    "config4_distributed_lsqr",
    "config5_seismic3d_pod",
    "run_config",
]


def config1_spd_cg(n: int = 1000, seed: int = 0, dtype=jnp.float64):
    """Diagonal ∘ matrix composite, SPD, solved by CG."""
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(seed), 3)
    M = jax.random.normal(k1, (n, n), dtype)
    spd = M @ M.T / n + 2.0 * jnp.eye(n, dtype=dtype)
    w = 1.0 + jax.random.uniform(k2, (n,), dtype)
    # W^{1/2} S W^{1/2} stays SPD under the composite algebra
    ws = jnp.sqrt(w)
    A = compose(diagonal_operator(ws), matrix_operator(spd), diagonal_operator(ws))
    x_true = jax.random.normal(k3, (n,), dtype)
    d = A(x_true)
    return A, (lambda op, b, **kw: cg(op, b, **kw)), d, {"x_true": x_true}


def config2_deconv_lsqr(n: int = 10_000, seed: int = 0, dtype=jnp.float64):
    """``A = D ∘ S`` deconvolution solved by LSQR."""
    key = jax.random.PRNGKey(seed)
    t = jnp.arange(25, dtype=dtype)
    wavelet = jnp.exp(-0.5 * ((t - 12.0) / 3.0) ** 2)
    A = derivative_operator(n, 1.0, dtype) @ conv1d_operator(wavelet, n, dtype)
    x_true = jnp.zeros((n,), dtype).at[
        jax.random.randint(key, (n // 100,), 5, n - 5)
    ].set(1.0)
    d = A(x_true)
    return A, (lambda op, b, **kw: lsqr(op, b, **kw)), d, {"x_true": x_true}


def config3_deblur_cgls(side: int = 512, seed: int = 0, dtype=jnp.float64):
    """2-D gaussian blur deblurring solved by CGLS."""
    key = jax.random.PRNGKey(seed)
    A = blur2d_operator((side, side), radius=3, dtype=dtype)
    x_true = (jax.random.uniform(key, (side, side), dtype) > 0.995).astype(dtype)
    d = A(x_true)
    return A, (lambda op, b, **kw: cgls(op, b, **kw)), d, {"x_true": x_true}


def config4_distributed_lsqr(
    nblocks: int = 64,
    grid=(128, 128),
    nrecv: int = 512,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
):
    """Multi-shot block operator, distributed LSQR with psum adjoint."""
    A, m_true, d = make_seismic_problem(
        grid, nblocks, nrecv, seed=seed, mesh=mesh, noise=0.02, dtype=dtype
    )
    return A, (lambda op, b, **kw: lsqr(op, b, **kw)), d, {"m_true": m_true}


def config5_seismic3d_pod(
    nshots: int = 256,
    grid=(128, 128, 64),
    nrecv: int = 2048,
    seed: int = 0,
    mesh: Optional[Mesh] = None,
    dtype=jnp.float32,
):
    """3-D stencil linearized seismic inversion sharded over a pod mesh."""
    A, m_true, d = make_seismic_problem(
        grid, nshots, nrecv, seed=seed, mesh=mesh, noise=0.02, dtype=dtype
    )
    return A, (lambda op, b, **kw: lsqr(op, b, **kw)), d, {"m_true": m_true}


def run_config(builder, *, maxiter: int = 100, tol: float = 1e-8, **kw):
    """Build and solve a config; returns (result, relative_residual, A)."""
    A, solve, d, info = builder(**kw)
    res = solve(A, d, maxiter=maxiter, tol=tol)
    rel = float(A.rng.norm(A(res.x) - d)) / float(A.rng.norm(d))
    return res, rel, A
