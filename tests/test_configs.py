"""All five BASELINE configs run end-to-end (scaled-down) and pass their
adjoint gates + converge."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.models import configs as cfg
from jets_tpu.parallel.sharded import make_block_mesh, shard_blocks


def _gate(A, seed=0):
    lhs, rhs = jt.dot_product_test(
        A, A.dom.randn(jax.random.PRNGKey(seed)),
        A.rng.randn(jax.random.PRNGKey(seed + 1)),
    )
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-8)


def test_config1_cg_converges():
    res, rel, A = cfg.run_config(cfg.config1_spd_cg, maxiter=400, tol=1e-10,
                                 n=96)
    _gate(A)
    assert rel < 1e-8


def test_config2_deconv():
    res, rel, A = cfg.run_config(cfg.config2_deconv_lsqr, maxiter=150,
                                 tol=1e-10, n=400)
    _gate(A)
    assert rel < 0.05


def test_config3_deblur():
    res, rel, A = cfg.run_config(cfg.config3_deblur_cgls, maxiter=60,
                                 tol=1e-10, side=48)
    _gate(A)
    assert rel < 0.05


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_config4_distributed():
    mesh = make_block_mesh(8)
    A, solve, d, info = cfg.config4_distributed_lsqr(
        nblocks=16, grid=(24, 24), nrecv=64, mesh=mesh, dtype=jnp.float64
    )
    res = solve(A, shard_blocks(d, mesh), maxiter=40, tol=1e-10)
    rel = float(A.rng.norm(A(res.x) - d)) / float(A.rng.norm(d))
    assert rel < 0.2
    _gate(A)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_config5_seismic3d():
    mesh = make_block_mesh(8)
    A, solve, d, info = cfg.config5_seismic3d_pod(
        nshots=8, grid=(12, 12, 8), nrecv=48, mesh=mesh, dtype=jnp.float64
    )
    res = solve(A, shard_blocks(d, mesh), maxiter=30, tol=1e-10)
    rel = float(A.rng.norm(A(res.x) - d)) / float(A.rng.norm(d))
    assert rel < 0.3
    _gate(A)
