"""Gauss-Newton outer loop on nonlinear operators (FWI pattern)."""
import jax
import jax.numpy as jnp
import numpy as np

import jets_tpu as jt
from jets_tpu.ops.elementwise import power_operator
from jets_tpu.ops.wave import wave_propagator
from jets_tpu.solvers import gauss_newton


def test_gn_recovers_elementwise_model():
    sp = jt.Space((32,), jnp.float64)
    F = power_operator(sp, 3.0)
    m_true = 1.0 + jax.random.uniform(jax.random.PRNGKey(0), (32,), jnp.float64)
    d = F(m_true)
    m0 = jnp.full((32,), 1.5, jnp.float64)
    res = gauss_newton(F, d, m0, outer_iters=8, inner_iters=30, inner_tol=1e-12)
    np.testing.assert_allclose(np.asarray(res.m), np.asarray(m_true), rtol=1e-6)
    assert res.residuals[-1] < 1e-8 * res.residuals[0]


def test_gn_wave_fwi_mini():
    """Miniature FWI: recover a velocity anomaly from traces."""
    F = wave_propagator((16, 16), nt=40, dt=0.0008, dx=10.0, freq=18.0,
                        src_idx=16 * 8 + 8, sponge_width=3, dtype=jnp.float64)
    c_true = jnp.full((16, 16), 2000.0, jnp.float64).at[9:12, 9:12].add(40.0)
    d = F(c_true)
    c0 = jnp.full((16, 16), 2000.0, jnp.float64)
    res = gauss_newton(F, d, c0, outer_iters=3, inner_iters=10,
                       inner_tol=1e-10, step=1.0)
    # residual strictly decreases and the update is finite
    assert res.residuals[-1] < 0.7 * res.residuals[0]
    assert np.isfinite(np.asarray(res.m)).all()
