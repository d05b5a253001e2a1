"""Nonlinear solver gates: NLCG and L-BFGS (``solvers/nonlinear.py``).

Ground truths: the analytic minimum of convex quadratics, the Rosenbrock
valley, and recovery of a model through a nonlinear elementwise operator
(the reference's ``JopBar`` pattern) via the adjoint-state least-squares
objective.
"""
import jax
import jax.numpy as jnp
import numpy as np

import jets_tpu as jt
from jets_tpu.ops import square_operator
from jets_tpu.solvers import lbfgs, least_squares_objective, nlcg

KEY = jax.random.PRNGKey(3)


def _quad_fg(A, b):
    def fg(x):
        r = A @ x - b
        return 0.5 * jnp.dot(r, r), A.T @ (A @ x - b)
    return fg


def test_nlcg_quadratic():
    n = 30
    A = np.random.default_rng(0).standard_normal((n, n)) / np.sqrt(n)
    A = jnp.asarray(A + np.eye(n) * 2.0)
    b = jnp.asarray(np.random.default_rng(1).standard_normal(n))
    res = nlcg(_quad_fg(A, b), jnp.zeros(n), maxiter=200, tol=1e-10)
    x_star = jnp.linalg.solve(A, b)
    assert np.allclose(np.asarray(res.m), np.asarray(x_star), atol=1e-6)


def test_lbfgs_quadratic_faster_than_gd():
    n = 50
    rng = np.random.default_rng(0)
    Q = rng.standard_normal((n, n))
    A = jnp.asarray(Q.T @ Q / n + np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    def fg(x):
        r = A @ x - b
        return 0.5 * jnp.dot(r, r), A.T @ r

    res = lbfgs(fg, jnp.zeros(n), maxiter=100, mem=10, tol=1e-10)
    x_star = jnp.linalg.solve(A, b)
    assert np.allclose(np.asarray(res.m), np.asarray(x_star), atol=1e-5)
    assert int(res.iterations) < 80


def test_lbfgs_rosenbrock():
    def fg(m):
        x, y = m[0], m[1]
        phi = (1.0 - x) ** 2 + 100.0 * (y - x * x) ** 2
        g = jnp.array([
            -2.0 * (1.0 - x) - 400.0 * x * (y - x * x),
            200.0 * (y - x * x),
        ])
        return phi, g

    res = lbfgs(fg, jnp.array([-1.2, 1.0]), maxiter=400, mem=10, tol=1e-12)
    assert np.allclose(np.asarray(res.m), [1.0, 1.0], atol=1e-4)


def test_least_squares_objective_adjoint_state_gradient():
    sp = jt.Space((20,), jnp.float64)
    F = square_operator(sp)
    m_true = sp.rand(KEY) + 0.5
    d = F(m_true)
    fg = least_squares_objective(F, d)
    m0 = sp.ones()
    phi, g = fg(m0)
    # gradient ground truth by autodiff of the same objective
    g_ad = jax.grad(
        lambda m: 0.5 * jnp.sum((m * m - d) ** 2)
    )(m0)
    assert np.allclose(np.asarray(g), np.asarray(g_ad), atol=1e-12)


def test_nlcg_recovers_model_through_nonlinear_op():
    sp = jt.Space((20,), jnp.float64)
    F = square_operator(sp)
    m_true = sp.rand(KEY) + 0.5
    d = F(m_true)
    fg = least_squares_objective(F, d)
    res = nlcg(fg, sp.ones(), maxiter=300, tol=1e-12)
    assert float(res.phi) < 1e-12
    assert np.allclose(np.asarray(res.m), np.asarray(m_true), atol=1e-5)


def test_lbfgs_recovers_model_through_nonlinear_op():
    sp = jt.Space((20,), jnp.float64)
    F = square_operator(sp)
    m_true = sp.rand(KEY) + 0.5
    d = F(m_true)
    fg = least_squares_objective(F, d)
    res = lbfgs(fg, sp.ones(), maxiter=200, mem=8, tol=1e-12)
    assert float(res.phi) < 1e-12
    assert np.allclose(np.asarray(res.m), np.asarray(m_true), atol=1e-5)


def test_lbfgs_resume_from_state():
    n = 40
    rng = np.random.default_rng(2)
    Q = rng.standard_normal((n, n))
    A = jnp.asarray(Q.T @ Q / n + np.eye(n))
    b = jnp.asarray(rng.standard_normal(n))

    def fg(x):
        r = A @ x - b
        return 0.5 * jnp.dot(r, r), A.T @ r

    full = lbfgs(fg, jnp.zeros(n), maxiter=60, mem=5, tol=0.0)
    part = lbfgs(fg, jnp.zeros(n), maxiter=30, mem=5, tol=0.0)
    cont = lbfgs(fg, None, maxiter=60, mem=5, tol=0.0, state=part.state)
    # resumed run reaches (at least) the quality of the uninterrupted one
    assert float(cont.phi) <= float(full.phi) * (1.0 + 1e-6) + 1e-12
