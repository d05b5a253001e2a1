"""Krylov solver correctness vs dense ground truth (BASELINE config #1 style)."""
import jax
import jax.numpy as jnp
import numpy as np

import jets_tpu as jt
from jets_tpu.ops.diagonal import diagonal_operator
from jets_tpu.ops.matrix import matrix_operator
from jets_tpu.solvers import cg, cgls, lsqr


def _spd_operator(n, key, dtype=jnp.float64):
    M = jax.random.normal(key, (n, n), dtype)
    A = M @ M.T + n * jnp.eye(n, dtype=dtype)
    return matrix_operator(A), A


def test_cg_spd():
    n = 64
    op, A = _spd_operator(n, jax.random.PRNGKey(0))
    x_true = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float64)
    b = A @ x_true
    res = cg(op, b, maxiter=200, tol=1e-12)
    np.testing.assert_allclose(res.x, x_true, rtol=1e-8)
    assert int(res.iterations) < 200
    # history monotone-ish and finite where filled
    h = np.asarray(res.history)[: int(res.iterations)]
    assert np.all(np.isfinite(h))


def test_cg_resume_matches_full_run():
    n = 32
    op, A = _spd_operator(n, jax.random.PRNGKey(2))
    b = jax.random.normal(jax.random.PRNGKey(3), (n,), jnp.float64)
    full = cg(op, b, maxiter=20, tol=0.0)
    half = cg(op, b, maxiter=10, tol=0.0)
    resumed = cg(op, b, maxiter=20, tol=0.0, state=half.state)
    np.testing.assert_allclose(resumed.x, full.x, rtol=1e-12)


def test_cgls_overdetermined():
    m, n = 96, 40
    M = jax.random.normal(jax.random.PRNGKey(4), (m, n), jnp.float64)
    op = matrix_operator(M)
    b = jax.random.normal(jax.random.PRNGKey(5), (m,), jnp.float64)
    res = cgls(op, b, maxiter=200, tol=1e-12)
    x_ref, *_ = jnp.linalg.lstsq(M, b)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-6, atol=1e-8)


def test_lsqr_overdetermined_matches_lstsq():
    m, n = 80, 30
    M = jax.random.normal(jax.random.PRNGKey(6), (m, n), jnp.float64)
    op = matrix_operator(M)
    b = jax.random.normal(jax.random.PRNGKey(7), (m,), jnp.float64)
    res = lsqr(op, b, maxiter=200, tol=1e-12)
    x_ref, *_ = jnp.linalg.lstsq(M, b)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-6, atol=1e-8)


def test_lsqr_on_composite_with_2d_domain():
    # exercises solvers on non-1D spaces without any vec() bridge
    key = jax.random.PRNGKey(8)
    w = jax.random.uniform(key, (8, 8), jnp.float64) + 1.0
    D = diagonal_operator(w)
    res = lsqr(D, D(jnp.ones((8, 8), jnp.float64)), maxiter=100, tol=1e-12)
    np.testing.assert_allclose(res.x, jnp.ones((8, 8)), rtol=1e-8)


def test_lsqr_damped():
    m, n = 60, 60
    M = jax.random.normal(jax.random.PRNGKey(9), (m, n), jnp.float64)
    op = matrix_operator(M)
    b = jax.random.normal(jax.random.PRNGKey(10), (m,), jnp.float64)
    damp = 0.5
    res = lsqr(op, b, maxiter=400, tol=1e-14, damp=damp)
    # dense damped solution: (M'M + damp^2 I) x = M'b
    x_ref = jnp.linalg.solve(M.T @ M + damp**2 * jnp.eye(n), M.T @ b)
    np.testing.assert_allclose(res.x, x_ref, rtol=1e-5, atol=1e-7)


def test_cg_on_block_operator():
    # SPD block-diagonal system solved blockwise through BlockVector pytrees
    n = 24
    op1, A1 = _spd_operator(n, jax.random.PRNGKey(11))
    op2, A2 = _spd_operator(n, jax.random.PRNGKey(12))
    B = jt.block_operator([
        [op1, jt.zero_block(op2.dom, op1.rng)],
        [jt.zero_block(op1.dom, op2.rng), op2],
    ])
    b = B.rng.randn(jax.random.PRNGKey(13))
    res = cg(B, b, maxiter=300, tol=1e-12)
    x1 = jnp.linalg.solve(A1, b.getblock(0))
    x2 = jnp.linalg.solve(A2, b.getblock(1))
    np.testing.assert_allclose(res.x.getblock(0), x1, rtol=1e-7)
    np.testing.assert_allclose(res.x.getblock(1), x2, rtol=1e-7)


def test_pcg_jacobi_beats_plain_cg():
    """Preconditioned CG with a Jacobi (diagonal-inverse) operator converges
    in fewer iterations on a badly scaled SPD system."""
    n = 80
    key = jax.random.PRNGKey(20)
    scales = 10.0 ** jnp.linspace(0, 4, n)
    M0 = jax.random.normal(key, (n, n), jnp.float64) / jnp.sqrt(n)
    A_dense = jnp.diag(scales) + M0 @ M0.T
    op = matrix_operator(A_dense)
    b = jax.random.normal(jax.random.PRNGKey(21), (n,), jnp.float64)
    plain = cg(op, b, maxiter=300, tol=1e-10)
    M = diagonal_operator(1.0 / jnp.diag(A_dense))
    pre = cg(op, b, maxiter=300, tol=1e-10, M=M)
    x_ref = jnp.linalg.solve(A_dense, b)
    np.testing.assert_allclose(np.asarray(pre.x), np.asarray(x_ref), rtol=1e-6)
    assert int(pre.iterations) < int(plain.iterations)


def test_lsmr_matches_lstsq():
    m, n = 70, 28
    M = jax.random.normal(jax.random.PRNGKey(30), (m, n), jnp.float64)
    op = matrix_operator(M)
    b = jax.random.normal(jax.random.PRNGKey(31), (m,), jnp.float64)
    from jets_tpu.solvers import lsmr
    res = lsmr(op, b, maxiter=300, tol=1e-13)
    x_ref, *_ = jnp.linalg.lstsq(M, b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref),
                               rtol=1e-6, atol=1e-8)
    # ||A'r|| history is monotone non-increasing (LSMR's defining property)
    h = np.asarray(res.history)[: int(res.iterations)]
    assert np.all(np.diff(h) <= 1e-10)


def test_lsmr_damped():
    m, n = 50, 50
    M = jax.random.normal(jax.random.PRNGKey(32), (m, n), jnp.float64)
    op = matrix_operator(M)
    b = jax.random.normal(jax.random.PRNGKey(33), (m,), jnp.float64)
    from jets_tpu.solvers import lsmr
    damp = 0.7
    res = lsmr(op, b, maxiter=500, tol=1e-14, damp=damp)
    x_ref = jnp.linalg.solve(M.T @ M + damp**2 * jnp.eye(n), M.T @ b)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_ref),
                               rtol=1e-5, atol=1e-7)


def test_lsqr_heterogeneous_block_range():
    """LSQR runs directly on an operator whose range is a heterogeneous
    BlockSpace — BlockVectors flow through the whole Krylov recurrence."""
    k = jax.random.PRNGKey(40)
    k1, k2 = jax.random.split(k)
    A1 = matrix_operator(jax.random.normal(k1, (9, 6), jnp.float64))
    A2 = matrix_operator(jax.random.normal(k2, (4, 6), jnp.float64))
    B = jt.block_operator([[A1], [A2]])  # tall column: dom = child dom
    assert B.dom.shape == (6,)
    x_true = jax.random.normal(jax.random.PRNGKey(41), (6,), jnp.float64)
    b = B(x_true)
    from jets_tpu.solvers import lsqr
    res = lsqr(B, b, maxiter=100, tol=1e-13)
    np.testing.assert_allclose(np.asarray(res.x), np.asarray(x_true),
                               rtol=1e-8)


def test_lsqr_on_heterogeneous_block_operator():
    # solver consumes a BlockVector right-hand side directly: the het-block
    # layer (C9/C10) + the solver layer end-to-end, no vec bridge
    import numpy as np
    from jets_tpu.ops import matrix_operator

    k1, k2 = jax.random.split(jax.random.PRNGKey(4))
    A1 = matrix_operator(jax.random.normal(k1, (12, 8), jnp.float64))
    A2 = matrix_operator(jax.random.normal(k2, (5, 8), jnp.float64))
    B = jt.block_operator([[A1], [A2]])
    m_true = B.dom.randn(jax.random.PRNGKey(5))
    d = B(m_true)  # BlockVector range
    res = lsqr(B, d, maxiter=100, tol=1e-14)
    assert np.allclose(np.asarray(res.x), np.asarray(m_true), atol=1e-8)


def test_minres_symmetric_indefinite():
    import numpy as np
    from jets_tpu.ops import diagonal_operator
    from jets_tpu.solvers import minres

    n = 60
    # symmetric INDEFINITE: mixed-sign diagonal (CG would diverge here)
    w = jnp.asarray(
        np.concatenate([np.linspace(1.0, 5.0, 30), -np.linspace(1.0, 5.0, 30)])
    )
    A = diagonal_operator(w)
    b = A.dom.randn(jax.random.PRNGKey(6))
    res = minres(A, b, maxiter=200, tol=1e-12)
    assert np.allclose(np.asarray(res.x), np.asarray(b / w), atol=1e-8)
    # monotone residual
    h = np.asarray(res.history)
    h = h[np.isfinite(h)]
    assert np.all(np.diff(h) <= 1e-10)


def test_minres_matches_cg_on_spd():
    import numpy as np
    from jets_tpu.ops import matrix_operator
    from jets_tpu.solvers import minres

    rng = np.random.default_rng(3)
    Q = rng.standard_normal((30, 30))
    A = matrix_operator(jnp.asarray(Q.T @ Q / 30 + np.eye(30)))
    b = A.dom.randn(jax.random.PRNGKey(7))
    x_cg = cg(A, b, maxiter=200, tol=1e-13).x
    x_mr = minres(A, b, maxiter=200, tol=1e-13).x
    assert np.allclose(np.asarray(x_mr), np.asarray(x_cg), atol=1e-8)


def test_minres_resume():
    import numpy as np
    from jets_tpu.ops import diagonal_operator
    from jets_tpu.solvers import minres

    w = jnp.linspace(1.0, 9.0, 40)
    A = diagonal_operator(w)
    b = A.dom.randn(jax.random.PRNGKey(8))
    full = minres(A, b, maxiter=40, tol=0.0)
    part = minres(A, b, maxiter=20, tol=0.0)
    cont = minres(A, b, maxiter=40, tol=0.0, state=part.state)
    assert float(cont.resnorm) <= float(full.resnorm) * (1 + 1e-6) + 1e-12


# ---------------------------------------------------------- gmres/bicgstab

def _nonsymmetric_problem(n=60, seed=3):
    rng = np.random.default_rng(seed)
    N = rng.standard_normal((n, n)) / np.sqrt(n)
    M = np.eye(n) + 0.5 * N  # well-conditioned, nonsymmetric
    x_true = rng.standard_normal(n)
    return M, x_true, M @ x_true


def test_gmres_matches_dense_solve():
    from jets_tpu.solvers import gmres
    M, x_true, b = _nonsymmetric_problem()
    A = matrix_operator(jnp.asarray(M))
    res = gmres(A, jnp.asarray(b), maxiter=120, restart=20, tol=1e-12)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-8)
    # inner-iteration residual history is populated and decreasing overall
    h = np.asarray(res.history)
    h = h[np.isfinite(h)]
    assert h[-1] < 1e-10 * h[0] + 1e-12


def test_gmres_single_cycle_exact_in_n_steps():
    from jets_tpu.solvers import gmres
    M, x_true, b = _nonsymmetric_problem(n=24)
    A = matrix_operator(jnp.asarray(M))
    # restart >= n: exact (up to roundoff) in one cycle
    res = gmres(A, jnp.asarray(b), maxiter=24, restart=24, tol=0.0)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_gmres_resume_restart_boundary():
    from jets_tpu.solvers import gmres
    M, x_true, b = _nonsymmetric_problem()
    A = matrix_operator(jnp.asarray(M))
    full = gmres(A, jnp.asarray(b), maxiter=40, restart=10, tol=0.0)
    half = gmres(A, jnp.asarray(b), maxiter=20, restart=10, tol=0.0)
    resumed = gmres(A, jnp.asarray(b), maxiter=40, restart=10, tol=0.0,
                    state=half.state)
    assert np.allclose(np.asarray(resumed.x), np.asarray(full.x), atol=1e-10)


def test_gmres_complex_matches_dense_solve():
    """Complex GMRES (complex Givens rotations): dense ground truth on a
    well-conditioned nonsymmetric complex matrix."""
    from jets_tpu.solvers import gmres
    rng = np.random.default_rng(11)
    n = 48
    N = (rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n)))
    M = np.eye(n) + 0.4 * N / np.sqrt(2 * n)
    x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    b = M @ x_true
    A = matrix_operator(jnp.asarray(M, jnp.complex128))
    res = gmres(A, jnp.asarray(b), maxiter=96, restart=16, tol=1e-13)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-8)
    h = np.asarray(res.history)
    h = h[np.isfinite(h)]
    assert h[-1] < 1e-10 * h[0] + 1e-12


def test_gmres_complex_on_fft_composite():
    """GMRES on a complex-domain operator composite (the FFT/radon pairing
    the complex hole used to block): A = F^H D F + 2I, D complex diagonal."""
    from jets_tpu.ops import fft_operator, identity_operator
    from jets_tpu.ops.diagonal import diagonal_operator
    from jets_tpu.solvers import gmres
    sp = jt.Space((32,), jnp.complex128)
    key = jax.random.PRNGKey(4)
    dvals = 0.5 * sp.randn(key)
    F = fft_operator(sp)
    A = (F.H @ diagonal_operator(dvals) @ F) + 2.0 * identity_operator(sp)
    x_true = sp.randn(jax.random.PRNGKey(5))
    b = A(x_true)
    res = gmres(A, b, maxiter=96, restart=16, tol=1e-13)
    assert np.allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-8)


def test_gmres_complex_single_cycle_exact():
    from jets_tpu.solvers import gmres
    rng = np.random.default_rng(12)
    n = 20
    M = np.eye(n) + 0.3 * (
        rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    ) / np.sqrt(2 * n)
    x_true = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    A = matrix_operator(jnp.asarray(M, jnp.complex128))
    res = gmres(A, jnp.asarray(M @ x_true), maxiter=n, restart=n, tol=0.0)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-8)


def test_complex_least_squares_family():
    """LSQR/LSMR/CGLS on a COMPLEX overdetermined system match the dense
    lstsq solution (the recurrence scalars are real norms, so the
    bidiagonalization is complex-safe by construction — pin it)."""
    from jets_tpu.solvers import cgls, lsmr, lsqr

    rng = np.random.default_rng(21)
    m_, n_ = 40, 24
    M = (rng.standard_normal((m_, n_)) + 1j * rng.standard_normal((m_, n_)))
    b = rng.standard_normal(m_) + 1j * rng.standard_normal(m_)
    want = np.linalg.lstsq(M, b, rcond=None)[0]
    A = matrix_operator(jnp.asarray(M, jnp.complex128))
    for solver in (lsqr, lsmr, cgls):
        res = solver(A, jnp.asarray(b), maxiter=200, tol=1e-14)
        np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-8,
                                   err_msg=solver.__name__)


def test_complex_hermitian_family():
    """CG and MINRES on a complex Hermitian positive-definite system;
    BiCGStab on a complex nonsymmetric square system."""
    from jets_tpu.solvers import bicgstab, cg, minres

    rng = np.random.default_rng(22)
    n = 30
    B = rng.standard_normal((n, n)) + 1j * rng.standard_normal((n, n))
    H = B @ B.conj().T + n * np.eye(n)  # Hermitian PD
    b = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    want = np.linalg.solve(H, b)
    Ah = matrix_operator(jnp.asarray(H, jnp.complex128))
    for solver in (cg, minres):
        res = solver(Ah, jnp.asarray(b), maxiter=300, tol=1e-14)
        np.testing.assert_allclose(np.asarray(res.x), want, atol=1e-8,
                                   err_msg=solver.__name__)
    Nsq = np.eye(n) + 0.4 * B / np.sqrt(2 * n)
    want2 = np.linalg.solve(Nsq, b)
    res = bicgstab(matrix_operator(jnp.asarray(Nsq, jnp.complex128)),
                   jnp.asarray(b), maxiter=300, tol=1e-13)
    np.testing.assert_allclose(np.asarray(res.x), want2, atol=1e-7)


def test_bicgstab_matches_dense_solve():
    from jets_tpu.solvers import bicgstab
    M, x_true, b = _nonsymmetric_problem()
    A = matrix_operator(jnp.asarray(M))
    res = bicgstab(A, jnp.asarray(b), maxiter=200, tol=1e-12)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-7)


def test_bicgstab_breakdown_safe_on_zero_rhs():
    from jets_tpu.solvers import bicgstab
    M, _, _ = _nonsymmetric_problem()
    A = matrix_operator(jnp.asarray(M))
    res = bicgstab(A, jnp.zeros(60), maxiter=10)
    assert np.all(np.isfinite(np.asarray(res.x)))
    assert np.allclose(np.asarray(res.x), 0.0)


def test_gmres_on_composite_nonsymmetric_operator():
    from jets_tpu.solvers import gmres
    sp = jt.Space((48,), jnp.float64)
    # nonsymmetric: circshift(1) + 2I  (well-conditioned, not normal-free)
    from jets_tpu.ops import circshift_operator, identity_operator
    A = circshift_operator(sp, (1,)) + 2.0 * identity_operator(sp)
    x_true = sp.randn(jax.random.PRNGKey(2))
    b = A(x_true)
    res = gmres(A, b, maxiter=96, restart=16, tol=1e-13)
    assert np.allclose(np.asarray(res.x), np.asarray(x_true), atol=1e-8)


# ------------------------------------------------------------- chebyshev

def test_chebyshev_converges_on_spd():
    from jets_tpu.solvers import chebyshev, estimate_spectral_bounds
    rng = np.random.default_rng(11)
    n = 80
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    lam = np.linspace(1.0, 10.0, n)
    M = (Q * lam) @ Q.T  # SPD, spectrum exactly [1, 10]
    A = matrix_operator(jnp.asarray(M))
    x_true = rng.standard_normal(n)
    b = jnp.asarray(M @ x_true)
    lmin, lmax = estimate_spectral_bounds(A)
    assert float(lmax) >= 10.0 and float(lmin) <= 10.0
    res = chebyshev(A, b, float(max(lmin, 0.5)), float(lmax),
                    maxiter=300, tol=1e-10, check_every=10)
    assert np.allclose(np.asarray(res.x), x_true, atol=1e-6)
    h = np.asarray(res.history)
    h = h[np.isfinite(h)]
    assert h[-1] < h[0]


def test_chebyshev_resume_matches_full():
    from jets_tpu.solvers import chebyshev
    rng = np.random.default_rng(12)
    n = 40
    Q = np.linalg.qr(rng.standard_normal((n, n)))[0]
    M = (Q * np.linspace(1.0, 5.0, n)) @ Q.T
    A = matrix_operator(jnp.asarray(M))
    b = jnp.asarray(rng.standard_normal(n))
    full = chebyshev(A, b, 1.0, 5.0, maxiter=60, tol=0.0, check_every=10)
    half = chebyshev(A, b, 1.0, 5.0, maxiter=30, tol=0.0, check_every=10)
    resumed = chebyshev(A, b, 1.0, 5.0, maxiter=60, tol=0.0,
                        check_every=10, state=half.state)
    assert np.allclose(np.asarray(resumed.x), np.asarray(full.x), atol=1e-12)
