"""Pallas solver-tail kernels (ops/pallas_solver) — correctness in
interpret mode on CPU, plus the solver hook path: lsqr on the 3-D flagship
with the fused epilogue must match the generic path."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops.pallas_solver import (
    lap3d_axpy_norm2,
    laplacian3d,
    xw_update,
)
from jets_tpu.ops.stencil import laplacian_nd


@pytest.mark.parametrize("shape", [(16, 128), (8, 16, 128), (4, 8, 8, 128)])
def test_xw_update_matches_reference(shape):
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    w = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    vh = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    t1, t2, inv_a = 0.37, -0.21, 1.7
    xo, wo = xw_update(x, w, vh, t1, t2, inv_a, interpret=True)
    # fma-vs-separate rounding between the kernel and the numpy reference:
    # one f32 ulp
    np.testing.assert_allclose(np.asarray(xo),
                               np.asarray(x) + np.float32(t1) * np.asarray(w),
                               rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(wo),
        np.float32(inv_a) * np.asarray(vh) + np.float32(t2) * np.asarray(w),
        rtol=1e-4, atol=1e-6,
    )


def test_cg_update_matches_reference():
    from jets_tpu.ops.pallas_solver import cg_update, p_update

    rng = np.random.default_rng(7)
    shape = (8, 16, 128)
    x, r, p, q = (jnp.asarray(rng.standard_normal(shape), jnp.float32)
                  for _ in range(4))
    alpha = 0.42
    xo, ro, rho = cg_update(x, r, p, q, alpha, interpret=True)
    r_want = np.asarray(r) - np.float32(alpha) * np.asarray(q)
    np.testing.assert_allclose(
        np.asarray(xo), np.asarray(x) + np.float32(alpha) * np.asarray(p),
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ro), r_want, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        float(rho), float(np.sum(r_want.astype(np.float64) ** 2)), rtol=1e-5)
    po = p_update(ro, p, -0.3, interpret=True)
    np.testing.assert_allclose(
        np.asarray(po), np.asarray(ro) + np.float32(-0.3) * np.asarray(p),
        rtol=1e-4, atol=1e-6)


def test_lsmr_update_matches_reference():
    from jets_tpu.ops.pallas_solver import lsmr_update

    rng = np.random.default_rng(4)
    shape = (8, 16, 128)
    vh, h, hbar, x = (
        jnp.asarray(rng.standard_normal(shape), jnp.float32)
        for _ in range(4)
    )
    c_hb, c_x, c_h, inv_a = 0.31, -0.12, 0.57, 1.3
    ho, hbo, xo = lsmr_update(vh, h, hbar, x, c_hb, c_x, c_h, inv_a,
                              interpret=True)
    hb_want = np.asarray(h) + np.float32(c_hb) * np.asarray(hbar)
    np.testing.assert_allclose(np.asarray(hbo), hb_want, rtol=1e-4,
                               atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(xo), np.asarray(x) + np.float32(c_x) * hb_want,
        rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(ho),
        np.float32(inv_a) * np.asarray(vh) + np.float32(c_h) * np.asarray(h),
        rtol=1e-4, atol=1e-6)


@pytest.mark.parametrize("shape", [(8, 16, 128), (12, 24, 256)])
def test_laplacian3d_bit_exact(shape):
    rng = np.random.default_rng(2)
    z = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = laplacian3d(z, interpret=True)
    want = jax.jit(laplacian_nd)(z)
    assert bool(jnp.all(got == want)), "pallas 3-D stencil must be bit-exact"


def test_lap3d_axpy_norm2_matches_composed():
    rng = np.random.default_rng(3)
    shape = (8, 16, 128)
    z = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    v = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    s = -0.43
    vh, n2 = lap3d_axpy_norm2(z, v, s, interpret=True)
    want = np.asarray(jax.jit(laplacian_nd)(z)) + np.float32(s) * np.asarray(v)
    np.testing.assert_allclose(np.asarray(vh), want, rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        float(n2), float(np.sum(want.astype(np.float64) ** 2)), rtol=1e-5
    )


def test_laplacian_operator_pallas_3d_gate():
    """3-D pallas laplacian operator passes the dot-product gate and
    matches the XLA operator exactly (CPU: interpret mode)."""
    from jets_tpu.ops.stencil import laplacian_operator

    shape = (8, 16, 128)
    L_p = laplacian_operator(shape, jnp.float32, impl="pallas")
    L_x = laplacian_operator(shape, jnp.float32, impl="xla")
    m = L_p.dom.randn(jax.random.PRNGKey(0))
    # the pallas op is bit-exact vs the JITTED laplacian_nd (see
    # test_laplacian3d_bit_exact); the eager XLA operator apply differs by
    # fma rounding on CPU, hence the one-ulp tolerance here
    np.testing.assert_allclose(np.asarray(L_p(m)), np.asarray(L_x(m)),
                               rtol=1e-5, atol=1e-5)
    lhs, rhs = jt.dot_product_test(
        L_p, L_p.dom.randn(jax.random.PRNGKey(1)),
        L_p.rng.randn(jax.random.PRNGKey(2)))
    # f32 inner products over 16k elements: ~1e-5 relative reduction noise
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-4)


def test_lsqr_hook_path_matches_generic():
    """The 3-D flagship installs the fused adjoint-epilogue hook; on CPU
    the hook takes the XLA fallback, which must reproduce the generic
    solver path exactly (same math, same order)."""
    from jets_tpu.core.jet import with_state
    from jets_tpu.models.seismic import make_seismic_problem
    from jets_tpu.solvers import lsqr

    A, m_true, d_obs = make_seismic_problem(
        (16, 16, 128), 4, 64, seed=1, noise=0.02, dtype=jnp.float32,
        epilogue_hook=True,
    )
    assert "adjoint_axpy_norm" in A.jet.state  # hook installed (opt-in)
    A_plain = with_state(A, adjoint_axpy_norm=None)
    assert A_plain.jet.state["adjoint_axpy_norm"] is None

    r_hook = lsqr(A, d_obs, maxiter=25, tol=0.0)
    r_plain = lsqr(A_plain, d_obs, maxiter=25, tol=0.0)
    np.testing.assert_allclose(np.asarray(r_hook.x), np.asarray(r_plain.x),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(r_hook.resnorm),
                               float(r_plain.resnorm), rtol=1e-6)


def test_hook_absent_by_default_and_on_2d_and_mesh():
    from jets_tpu.models.seismic import make_seismic_operator
    from jets_tpu.parallel.sharded import make_block_mesh

    # default: opt-in only (measured slower in-body than the XLA chain)
    A3d = make_seismic_operator((16, 16, 128), 4, 64, jax.random.PRNGKey(0))
    assert "adjoint_axpy_norm" not in A3d.jet.state
    # 2-D never installs it, even when requested
    A2 = make_seismic_operator((64, 64), 4, 64, jax.random.PRNGKey(0),
                               epilogue_hook=True)
    assert "adjoint_axpy_norm" not in A2.jet.state
    # nor does the sharded path (the adjoint keeps its psum structure)
    mesh = make_block_mesh(8)
    A3 = make_seismic_operator((16, 16, 128), 8, 64, jax.random.PRNGKey(0),
                               mesh=mesh, epilogue_hook=True)
    assert "adjoint_axpy_norm" not in A3.jet.state
