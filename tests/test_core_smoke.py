"""End-to-end smoke of the L0-L3 slice."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops.diagonal import diagonal_operator
from jets_tpu.ops.matrix import matrix_operator


def test_space_basics():
    sp = jt.Space((3, 4), jnp.float32)
    assert sp.size == 12 and sp.ndim == 2
    assert sp.zeros().shape == (3, 4)
    x = sp.rand(jax.random.PRNGKey(0))
    assert x.dtype == jnp.float32
    y = sp.reshape(jnp.arange(12, dtype=jnp.float32))
    assert y.shape == (3, 4)
    assert jt.space_of(y) == sp


def test_diagonal_and_adjoint():
    w = jnp.arange(1.0, 6.0, dtype=jnp.float32)
    D = diagonal_operator(w)
    m = jnp.ones(5)
    np.testing.assert_allclose(D(m), w)
    np.testing.assert_allclose(D.H(m), w)
    lhs, rhs = jt.dot_product_test(D, D.dom.randn(jax.random.PRNGKey(1)),
                                   D.rng.randn(jax.random.PRNGKey(2)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def test_matrix_compose_materialize():
    key = jax.random.PRNGKey(0)
    A = matrix_operator(jax.random.normal(key, (4, 5), jnp.float64))
    w = jnp.arange(1.0, 5.0, dtype=jnp.float64)
    D = diagonal_operator(w)
    C = D @ A  # compose
    assert C.dom.size == 5 and C.rng.size == 4
    M = jt.materialize(C)
    dense = jnp.diag(w) @ A.jet.state["A"]
    np.testing.assert_allclose(M, dense, rtol=1e-5)
    # adjoint through the composite
    lhs, rhs = jt.dot_product_test(C, C.dom.randn(jax.random.PRNGKey(3)),
                                   C.rng.randn(jax.random.PRNGKey(4)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_derived_adjoint_linear_transpose():
    # operator with NO hand-written adjoint: dft must come from linear_transpose
    sp = jt.Space((6,), jnp.float32)

    def df(dm, m0, state):
        return jnp.cumsum(dm)

    A = jt.LinearOperator(jt.Jet(dom=sp, rng=sp, df=df))
    m = sp.randn(jax.random.PRNGKey(5))
    d = sp.randn(jax.random.PRNGKey(6))
    lhs, rhs = jt.dot_product_test(A, m, d)
    np.testing.assert_allclose(lhs, rhs, rtol=1e-6)


def test_nonlinear_jacobian():
    sp = jt.Space((4,), jnp.float64)

    def f(m, state):
        return m ** 2

    def df(dm, m0, state):
        return 2.0 * m0 * dm

    F = jt.Operator(jt.Jet(dom=sp, rng=sp, f=f, df=df, dft="self"))
    m0 = sp.randn(jax.random.PRNGKey(7))
    obs, exp = jt.linearization_test(F, m0)
    np.testing.assert_allclose(obs, exp, rtol=0.2)


def test_operator_through_jit():
    w = jnp.arange(1.0, 6.0, dtype=jnp.float32)
    D = diagonal_operator(w)

    @jax.jit
    def apply(op, m):
        return op(m)

    np.testing.assert_allclose(apply(D, jnp.ones(5)), w)


def test_block_operator_roundtrip():
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    f64 = jnp.float64
    A11 = matrix_operator(jax.random.normal(k1, (3, 4), f64))
    A22 = diagonal_operator(jnp.arange(1.0, 4.0, dtype=f64))
    B = jt.block_operator([
        [A11, jt.zero_block(jt.Space((3,), f64), jt.Space((3,), f64))],
        [jt.zero_block(jt.Space((4,), f64), jt.Space((3,), f64)), A22],
    ])
    assert jt.nblocks(B) == (2, 2)
    m = B.dom.randn(jax.random.PRNGKey(1))
    d = B(m)
    np.testing.assert_allclose(np.asarray(d.getblock(0)),
                               np.asarray(A11(m.getblock(0))), rtol=1e-6)
    lhs, rhs = jt.dot_product_test(B, m, B.rng.randn(jax.random.PRNGKey(2)))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)
