"""Pin the reference's block-operator shape semantics and remaining
algebra corners: singleton / tall-and-skinny / short-and-fat block
operators (``test/runtests.jl:704-758``), the vectorized block operator
(``:819-838``), masked dot-product tests (``src/Jets.jl:1211-1226``),
``A * B`` composition by ``*`` (``:425-436``), and sums containing
compositions (``:471-488``).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.core.algebra import vec
from jets_tpu.core.blockspace import BlockVector
from jets_tpu.ops import diagonal_operator, matrix_operator
from jets_tpu.core.verify import dot_product_test, materialize

KEY = jax.random.PRNGKey(11)


def _rand_matrix_op(rng_key, nr, nc):
    M = jax.random.normal(rng_key, (nr, nc), dtype=jnp.float64)
    return matrix_operator(M), np.asarray(M)


def test_block_singleton():
    # 1x1 block op behaves exactly like its child (reference :704-718)
    A, M = _rand_matrix_op(KEY, 7, 7)
    B = jt.block_operator([[A]])
    assert jt.nblocks(B) == (1, 1)
    x = A.dom.randn(KEY)
    xb = B.dom.reshape(jnp.asarray(x).ravel())
    y = B(xb)
    assert np.allclose(
        np.asarray(B.rng.ravel(y)), M @ np.asarray(x), atol=1e-12
    )


def test_block_tall_and_skinny():
    # n x 1 blocks: domain stays the single child domain (reference :720-742)
    k1, k2, k3 = jax.random.split(KEY, 3)
    A1, M1 = _rand_matrix_op(k1, 4, 6)
    A2, M2 = _rand_matrix_op(k2, 5, 6)
    A3, M3 = _rand_matrix_op(k3, 3, 6)
    B = jt.block_operator([[A1], [A2], [A3]])
    assert jt.nblocks(B) == (3, 1)
    dense = np.vstack([M1, M2, M3])
    assert np.allclose(np.asarray(materialize(B)), dense, atol=1e-12)
    m = B.dom.randn(KEY)
    d = B.rng.randn(jax.random.PRNGKey(1))
    lhs, rhs = dot_product_test(B, m, d)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)


def test_block_short_and_fat():
    # 1 x n blocks (reference :744-758)
    k1, k2 = jax.random.split(KEY)
    A1, M1 = _rand_matrix_op(k1, 4, 6)
    A2, M2 = _rand_matrix_op(k2, 4, 3)
    B = jt.block_operator([[A1, A2]])
    assert jt.nblocks(B) == (1, 2)
    dense = np.hstack([M1, M2])
    assert np.allclose(np.asarray(materialize(B)), dense, atol=1e-12)
    # adjoint maps data back into the concatenated block domain
    d = B.rng.randn(KEY)
    a = jt.adjoint(B)(d)
    assert np.allclose(
        np.asarray(B.dom.ravel(a)),
        dense.T @ np.asarray(B.rng.ravel(d)),
        atol=1e-12,
    )


def test_vectorized_block_operator():
    # vec of a block op: 1-D in, 1-D out, same dense action (reference :819-838)
    k1, k2 = jax.random.split(KEY)
    A1, M1 = _rand_matrix_op(k1, 4, 6)
    A2, M2 = _rand_matrix_op(k2, 5, 6)
    B = jt.block_operator([[A1], [A2]])
    Bv = vec(B)
    assert Bv.dom.ndim == 1 and Bv.rng.ndim == 1
    x = Bv.dom.randn(KEY)
    dense = np.vstack([M1, M2])
    assert np.allclose(np.asarray(Bv(x)), dense @ np.asarray(x), atol=1e-12)
    m = Bv.dom.randn(KEY)
    d = Bv.rng.randn(jax.random.PRNGKey(1))
    lhs, rhs = dot_product_test(Bv, m, d)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)


def test_dot_product_test_masks():
    # masks restrict the identity to sub-spaces (reference src/Jets.jl:1211-1226)
    sp = jt.Space((16,), jnp.float64)
    w = sp.rand(KEY) + 0.5
    A = diagonal_operator(w)
    m = sp.randn(jax.random.PRNGKey(1))
    d = sp.randn(jax.random.PRNGKey(2))
    mmask = jnp.concatenate([jnp.ones(8), jnp.zeros(8)])
    dmask = jnp.concatenate([jnp.zeros(4), jnp.ones(12)])
    lhs, rhs = dot_product_test(A, m, d, mmask=mmask, dmask=dmask)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)
    # and the masked value differs from the unmasked one (mask has an effect)
    lhs_full, _ = dot_product_test(A, m, d)
    assert abs(float(lhs_full) - float(lhs)) > 1e-8


def test_star_composes_operators():
    # `A * B` composes when B is an operator (reference :425-436)
    k1, k2 = jax.random.split(KEY)
    A, MA = _rand_matrix_op(k1, 5, 5)
    B, MB = _rand_matrix_op(k2, 5, 5)
    C = A * B
    assert np.allclose(np.asarray(materialize(C)), MA @ MB, atol=1e-12)
    # and `A * x` applies when x is a domain member
    x = B.dom.randn(KEY)
    assert np.allclose(np.asarray(A * x), MA @ np.asarray(x), atol=1e-12)


def test_sum_of_compositions():
    # A1@A2 + A3@A4 against dense ground truth (reference :471-488)
    ks = jax.random.split(KEY, 4)
    ops, mats = zip(*[_rand_matrix_op(k, 6, 6) for k in ks])
    S = ops[0] @ ops[1] + ops[2] @ ops[3]
    dense = mats[0] @ mats[1] + mats[2] @ mats[3]
    assert np.allclose(np.asarray(materialize(S)), dense, atol=1e-12)
    m = S.dom.randn(KEY)
    d = S.rng.randn(jax.random.PRNGKey(5))
    lhs, rhs = dot_product_test(S, m, d)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-12)


def test_block_of_compositions_getblock():
    # getblock through a composition composes the (i,j) blocks
    # (reference src/Jets.jl:1100-1110)
    k1, k2, k3, k4 = jax.random.split(KEY, 4)
    A11, M11 = _rand_matrix_op(k1, 4, 4)
    A22, M22 = _rand_matrix_op(k2, 4, 4)
    B11, N11 = _rand_matrix_op(k3, 4, 4)
    B22, N22 = _rand_matrix_op(k4, 4, 4)
    z = jt.zero_block(A11.dom, A11.rng)
    A = jt.block_operator([[A11, z], [z, A22]])
    B = jt.block_operator([[B11, z], [z, B22]])
    C = A @ B
    blk = jt.getblock(C, 1, 1)
    assert np.allclose(
        np.asarray(materialize(blk)), M22 @ N22, atol=1e-12
    )


def test_vec_preserves_symmetric_space_semantics():
    # regression: vec() must no-op on 1-D symmetric-space operators (its
    # weighted inner product has no flat-Space equivalent) and refuse n-D
    # symmetric spaces rather than silently dropping the weights
    from jets_tpu.ops import rfft_operator

    A = rfft_operator(jt.Space((8,), jnp.float64))
    Av = vec(A)
    assert Av is A  # no-op: the weighted range survives
    m = Av.dom.randn(KEY)
    d = Av.rng.randn(jax.random.PRNGKey(1))
    lhs, rhs = dot_product_test(Av, m, d)
    assert complex(lhs) == pytest.approx(complex(rhs), rel=1e-12)

    A2 = rfft_operator(jt.Space((4, 8), jnp.float64))
    with pytest.raises(NotImplementedError):
        vec(A2)
