"""Gates for the normal-operator / preconditioner layer
(``solvers/precond.py``) and the orbax checkpoint backend.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops import diagonal_operator, matrix_operator
from jets_tpu.solvers import cg, cgls
from jets_tpu.solvers.precond import (
    estimate_diagonal,
    jacobi_preconditioner,
    normal_operator,
)

KEY = jax.random.PRNGKey(5)


def _tall_matrix_op(m=40, n=20):
    M = jax.random.normal(KEY, (m, n), dtype=jnp.float64)
    return matrix_operator(M), np.asarray(M)


def test_normal_operator_matches_dense():
    A, M = _tall_matrix_op()
    N = normal_operator(A, damp=0.3)
    dense = np.asarray(jt.materialize(N))
    expect = M.T @ M + 0.09 * np.eye(M.shape[1])
    assert np.allclose(dense, expect, atol=1e-12)
    # self-adjointness certified by the dot-product gate
    m1 = N.dom.randn(jax.random.PRNGKey(1))
    d1 = N.rng.randn(jax.random.PRNGKey(2))
    lhs, rhs = jt.dot_product_test(N, m1, d1)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)


def test_cg_on_normal_operator_matches_cgls():
    A, M = _tall_matrix_op()
    b = A.rng.randn(jax.random.PRNGKey(3))
    x_cgls = cgls(A, b, maxiter=200, tol=1e-14).x
    N = normal_operator(A)
    x_cg = cg(N, jt.adjoint(A)(b), maxiter=200, tol=1e-14).x
    assert np.allclose(np.asarray(x_cg), np.asarray(x_cgls), atol=1e-8)


def test_estimate_diagonal_converges():
    sp = jt.Space((50,), jnp.float64)
    w = sp.rand(KEY) + 0.5
    A = diagonal_operator(w)
    # diag(A^H A) = w^2 exactly; Hutchinson on a diagonal op is exact for
    # every sample (z * w^2 z = w^2 for Rademacher z)
    d = estimate_diagonal(A, key=KEY, nsamples=4)
    assert np.allclose(np.asarray(d), np.asarray(w) ** 2, rtol=1e-12)


def test_jacobi_preconditioner_accelerates_cg():
    # ill-conditioned diagonal system: unpreconditioned CG crawls,
    # Jacobi-preconditioned CG converges almost immediately
    n = 200
    w = jnp.logspace(0, 3, n, dtype=jnp.float64)  # cond ~ 1e6 on A^H A
    A = diagonal_operator(w)
    N = normal_operator(A)
    b = N.dom.randn(KEY)
    res_plain = cg(N, b, maxiter=150, tol=1e-10)
    M = jacobi_preconditioner(A, diag=w * w)
    res_pc = cg(N, b, maxiter=150, tol=1e-10, M=M)
    assert int(res_pc.iterations) < int(res_plain.iterations)
    assert int(res_pc.iterations) <= 5
    x_star = b / (w * w)
    assert np.allclose(np.asarray(res_pc.x), np.asarray(x_star), atol=1e-8)


def test_orbax_checkpoint_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    from jets_tpu.utils.checkpoint import (
        load_checkpoint_orbax,
        save_checkpoint_orbax,
    )

    sp = jt.Space((16, 8), jnp.float32)
    state = {
        "x": sp.randn(KEY),
        "r": sp.ones(),
        "i": jnp.asarray(7),
    }
    path = str(tmp_path / "ckpt")
    save_checkpoint_orbax(path, state)
    like = {"x": sp.zeros(), "r": sp.zeros(), "i": jnp.asarray(0)}
    back = load_checkpoint_orbax(path, like)
    for k in state:
        assert np.array_equal(np.asarray(back[k]), np.asarray(state[k]))


def test_estimate_diagonal_and_jacobi_on_block_operator():
    # regression: block-space domains (BlockVector probes) must work
    from jets_tpu.core.blockspace import BlockVector

    k1, k2 = jax.random.split(KEY)
    w1 = jt.Space((10,), jnp.float64).rand(k1) + 0.5
    w2 = jt.Space((6,), jnp.float64).rand(k2) + 0.5
    B = jt.block_operator([[diagonal_operator(w1), jt.zero_block(
        jt.Space((6,), jnp.float64), jt.Space((10,), jnp.float64))],
        [jt.zero_block(jt.Space((10,), jnp.float64), jt.Space((6,), jnp.float64)),
         diagonal_operator(w2)]])
    from jets_tpu.solvers.precond import estimate_diagonal, jacobi_preconditioner

    d = estimate_diagonal(B, key=KEY, nsamples=4)
    expect = np.concatenate([np.asarray(w1) ** 2, np.asarray(w2) ** 2])
    got = np.asarray(B.dom.ravel(d))
    assert np.allclose(got, expect, rtol=1e-12)
    M = jacobi_preconditioner(B, diag=d)
    z = M(B.dom.ones())
    assert np.allclose(np.asarray(B.dom.ravel(z)), 1.0 / expect, rtol=1e-12)
