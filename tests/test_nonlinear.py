"""Nonlinear solver gates: NLCG and L-BFGS (``solvers/nonlinear.py``).

Ground truths: the analytic minimum of convex quadratics, the Rosenbrock
valley, and recovery of a model through a nonlinear elementwise operator
(the reference's ``JopBar`` pattern) via the adjoint-state least-squares
objective.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

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


# ---------------------------------------------------------------------- #
# box constraints (projected NLCG / L-BFGS)
# ---------------------------------------------------------------------- #


def _box_quad_fg(t):
    """phi(x) = 1/2 ||x - t||^2 — projected minimum over a box is clip(t)."""
    def fg(x):
        r = x - t
        return 0.5 * jnp.vdot(r, r).real, r
    return fg


@pytest.mark.parametrize("solver", ["nlcg", "lbfgs"])
def test_bounded_solution_lands_on_box(solver):
    from jets_tpu.solvers import lbfgs, nlcg

    t = jnp.asarray([3.0, -2.0, 0.25, 0.8], jnp.float64)
    fg = _box_quad_fg(t)
    x0 = jnp.zeros(4, jnp.float64)
    run = nlcg if solver == "nlcg" else lbfgs
    res = run(fg, x0, maxiter=60, tol=1e-10, bounds=(0.0, 1.0))
    want = jnp.clip(t, 0.0, 1.0)
    np.testing.assert_allclose(np.asarray(res.m), np.asarray(want),
                               rtol=0, atol=1e-8)
    assert float(res.gnorm) <= 1e-8 * max(float(res.state.g0norm), 1.0)


def test_bounded_one_sided_and_pytree_bounds():
    from jets_tpu.solvers import lbfgs

    t = jnp.asarray([3.0, -2.0], jnp.float64)
    fg = _box_quad_fg(t)
    # lower bound only
    res = lbfgs(fg, jnp.zeros(2, jnp.float64), maxiter=50, tol=1e-10,
                bounds=(-1.0, None))
    np.testing.assert_allclose(np.asarray(res.m), [3.0, -1.0], atol=1e-8)
    # congruent-pytree bounds: per-component boxes
    res = lbfgs(fg, jnp.zeros(2, jnp.float64), maxiter=50, tol=1e-10,
                bounds=(jnp.asarray([-10.0, -0.5]),
                        jnp.asarray([2.5, 10.0])))
    np.testing.assert_allclose(np.asarray(res.m), [2.5, -0.5], atol=1e-8)


def test_bounded_blockvector_velocity_bounds():
    """Bound only the velocity block of a two-block model — the production
    FWI constraint pattern (bounds as a model-congruent BlockVector)."""
    from jets_tpu.core.blockspace import BlockSpace
    from jets_tpu.core.spaces import Space
    from jets_tpu.solvers import lbfgs

    sp = BlockSpace([Space((3,), jnp.float64), Space((3,), jnp.float64)])
    tgt = sp.zeros().setblock(
        0, jnp.asarray([2.0, -2.0, 0.5])).setblock(
        1, jnp.asarray([5.0, -5.0, 0.0]))

    def fg(m):
        r = tr_sub(m, tgt)
        return 0.5 * float_dot(r, r), r

    from jets_tpu.utils import tree as tr

    def tr_sub(a, b):
        return tr.sub(a, b)

    def float_dot(a, b):
        from jax.flatten_util import ravel_pytree
        return jnp.vdot(ravel_pytree(a)[0], ravel_pytree(b)[0]).real

    neg = jnp.full((3,), -jnp.inf, jnp.float64)
    pos = jnp.full((3,), jnp.inf, jnp.float64)
    lo = sp.zeros().setblock(0, jnp.full((3,), -1.0, jnp.float64)).setblock(
        1, neg)
    hi = sp.zeros().setblock(0, jnp.full((3,), 1.0, jnp.float64)).setblock(
        1, pos)
    res = lbfgs(fg, sp.zeros(), maxiter=60, tol=1e-10, bounds=(lo, hi))
    np.testing.assert_allclose(np.asarray(res.m.getblock(0)),
                               [1.0, -1.0, 0.5], atol=1e-8)
    np.testing.assert_allclose(np.asarray(res.m.getblock(1)),
                               [5.0, -5.0, 0.0], atol=1e-8)


def test_bounded_fwi_smoke():
    """End-to-end: bounded L-BFGS on a tiny FWI problem keeps the model
    inside the velocity box at every... at least at the solution."""
    from jets_tpu.ops.wave import wave_propagator
    from jets_tpu.solvers import lbfgs, least_squares_objective

    shape = (16, 16)
    F = wave_propagator(shape, nt=24, dt=1e-3, dx=10.0, freq=18.0,
                        src_idx=8 * 16 + 8, sponge_width=3,
                        dtype=jnp.float64)
    key = jax.random.PRNGKey(7)
    c_true = 1500.0 + 40.0 * jax.random.normal(key, shape, jnp.float64)
    d_obs = F(c_true)
    fg = least_squares_objective(F, d_obs)
    res = lbfgs(fg, jnp.full(shape, 1500.0, jnp.float64), maxiter=8,
                tol=1e-12, bounds=(1450.0, 1550.0))
    m = np.asarray(res.m)
    assert m.min() >= 1450.0 - 1e-9 and m.max() <= 1550.0 + 1e-9
    assert float(res.phi) < float(fg(jnp.full(shape, 1500.0,
                                              jnp.float64))[0])
