"""Wave-equation operator gates: dot-product on the Born operator,
linearization Taylor decay on the nonlinear propagator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops.wave import born_operator, wave_propagator
from jets_tpu.solvers import lsqr


def _small_propagator():
    return wave_propagator(
        (24, 24), nt=48, dt=0.0008, dx=10.0, freq=18.0,
        src_idx=24 * 12 + 12, sponge_width=4, dtype=jnp.float64,
    )


def test_propagator_produces_signal():
    F = _small_propagator()
    c = jnp.full((24, 24), 2000.0, jnp.float64)
    d = F(c)
    assert d.shape == F.rng.shape
    assert float(jnp.max(jnp.abs(d))) > 0


def test_born_dot_product_gate():
    F = _small_propagator()
    c0 = jnp.full((24, 24), 2000.0, jnp.float64)
    J = born_operator(F, c0)
    m = J.dom.randn(jax.random.PRNGKey(0))
    d = J.rng.randn(jax.random.PRNGKey(1))
    lhs, rhs = jt.dot_product_test(J, m, d)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-9)


def test_linearization_taylor_decay():
    F = _small_propagator()
    c0 = jnp.full((24, 24), 2000.0, jnp.float64)
    dm = 50.0 * jt.Space((24, 24), jnp.float64).randn(jax.random.PRNGKey(2))
    obs, exp = jt.linearization_test(F, c0, delta_m=dm,
                                     mu=(1.0, 0.5, 0.25, 0.125))
    np.testing.assert_allclose(np.asarray(obs), np.asarray(exp), rtol=0.35)


def test_born_inversion_reduces_residual():
    """Mini RTM-style linearized inversion: LSQR on the Born operator."""
    F = _small_propagator()
    c0 = jnp.full((24, 24), 2000.0, jnp.float64)
    J = born_operator(F, c0)
    # true perturbation: a small box anomaly
    dc = jnp.zeros((24, 24), jnp.float64).at[14:18, 14:18].set(30.0)
    d_obs = J(dc)
    res = lsqr(J, d_obs, maxiter=12, tol=1e-10)
    rel = float(J.rng.norm(J(res.x) - d_obs)) / float(J.rng.norm(d_obs))
    assert rel < 0.5
    assert np.isfinite(np.asarray(res.x)).all()


def test_multishot_wave_gates_and_sharded_parity():
    from jets_tpu.ops.wave import multishot_wave_operator
    from jets_tpu.parallel.sharded import make_block_mesh, shard_blocks

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    grid = (16, 16)
    srcs = jnp.array([16 * 4 + 4, 16 * 4 + 11, 16 * 11 + 4, 16 * 11 + 11,
                      16 * 8 + 8, 16 * 2 + 8, 16 * 8 + 2, 16 * 13 + 8])
    kw = dict(nt=24, dt=0.0008, dx=10.0, freq=18.0, sponge_width=3,
              dtype=jnp.float64)
    F0 = multishot_wave_operator(grid, srcs, **kw)
    mesh = make_block_mesh(8)
    F1 = multishot_wave_operator(grid, srcs, mesh=mesh, **kw)
    c0 = jnp.full(grid, 2000.0, jnp.float64)
    d0 = F0(c0)
    d1 = F1(c0)
    assert d0.shape[0] == 8
    np.testing.assert_allclose(np.asarray(d0), np.asarray(d1), rtol=1e-12)

    # Born operator over all shots: gate + sharded parity
    J0 = F0.linearize(c0)
    J1 = F1.linearize(c0)
    dm = J0.dom.randn(jax.random.PRNGKey(0))
    dd = J0.rng.randn(jax.random.PRNGKey(1))
    lhs, rhs = jt.dot_product_test(J0, dm, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-9)
    np.testing.assert_allclose(np.asarray(J0.H(dd)),
                               np.asarray(J1.H(shard_blocks(dd, mesh))),
                               rtol=1e-10)
