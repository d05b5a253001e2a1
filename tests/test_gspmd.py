"""GSPMD 2-D mesh (block × grid): the vmap-path operator + jitted solvers,
partitioned purely by input shardings, match the unsharded run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.models.seismic import make_seismic_problem
from jets_tpu.parallel.gspmd import (
    make_mesh_2d,
    shard_data,
    shard_model,
)
from jets_tpu.solvers import cgls, lsqr

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_forward_adjoint_match_on_2d_mesh():
    mesh = make_mesh_2d(4, 2)
    A, m_true, d_obs = make_seismic_problem((16, 16), 8, 32, seed=3,
                                            dtype=jnp.float64)
    # shard inputs; operator itself stays the vmap (mesh=None) path
    m_sh = shard_model(m_true, mesh)
    d0 = A(m_true)
    fwd = jax.jit(lambda op, m: op(m))
    d1 = fwd(A, m_sh)
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-12)

    adj = jax.jit(lambda op, d: op.H(d))
    a0 = adj(A, d_obs)
    a1 = adj(A, shard_data(d_obs, mesh))
    np.testing.assert_allclose(np.asarray(a0), np.asarray(a1), rtol=1e-12)


def test_lsqr_on_2d_mesh_matches_unsharded():
    mesh = make_mesh_2d(4, 2)
    A, m_true, d_obs = make_seismic_problem((16, 16), 8, 32, seed=4,
                                            noise=0.02, dtype=jnp.float64)
    r0 = lsqr(A, d_obs, maxiter=25, tol=0.0)
    r1 = lsqr(A, shard_data(d_obs, mesh), maxiter=25, tol=0.0)
    bnorm = float(A.rng.norm(d_obs))
    assert abs(float(r0.resnorm) - float(r1.resnorm)) < 1e-9 * bnorm
    np.testing.assert_allclose(np.asarray(r0.x), np.asarray(r1.x),
                               rtol=1e-6, atol=1e-9)


def test_3d_grid_sharded_cgls():
    """3-D model grid sharded over the grid axis (config #5 shape)."""
    mesh = make_mesh_2d(2, 4)
    A, m_true, d_obs = make_seismic_problem((8, 10, 6), 4, 24, seed=5,
                                            noise=0.02, dtype=jnp.float64)
    r0 = cgls(A, d_obs, maxiter=15, tol=0.0)
    r1 = cgls(A, shard_data(d_obs, mesh), x0=shard_model(A.dom.zeros(), mesh),
              maxiter=15, tol=0.0)
    np.testing.assert_allclose(np.asarray(r0.x), np.asarray(r1.x),
                               rtol=1e-6, atol=1e-9)
