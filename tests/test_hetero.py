"""Heterogeneous block distribution (mixed-shape block rows on the mesh):
group-stacking equivalent of DistributedJets' arbitrary-row distribution
(``docs/src/index.md:15``) — sharded forward/adjoint match the plain
single-device ``block_operator`` and a solver converges on the distributed
operator."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.core.block import block_operator
from jets_tpu.core.blockspace import BlockVector
from jets_tpu.ops.diagonal import diagonal_operator
from jets_tpu.ops.matrix import matrix_operator
from jets_tpu.parallel.hetero import distribute_block_rows
from jets_tpu.parallel.sharded import make_block_mesh

N = 24  # shared model dimension


def _mixed_rows(seed=0):
    """16 matrix rows (rng (10,)) + 8 diagonal rows (rng (24,)) — two
    structure groups with different range shapes and kernels."""
    rng = np.random.default_rng(seed)
    rows = []
    for _ in range(16):
        rows.append(matrix_operator(
            jnp.asarray(rng.standard_normal((10, N)) / np.sqrt(N))))
    for _ in range(8):
        rows.append(diagonal_operator(
            jnp.asarray(0.5 + rng.random(N))))
    return rows


def test_grouping_and_sharding():
    rows = _mixed_rows()
    mesh = make_block_mesh(8)
    layout = distribute_block_rows(rows, mesh)
    assert layout.groups == [list(range(16)), list(range(16, 24))]
    assert layout.sharded == [True, True]
    # 16 % 8 == 0 and 8 % 8 == 0: both groups live on the mesh
    wr = layout.operator.jet.state["ops"][0][0].jet.state["bstate"]
    (stack,) = wr.values()
    assert len(stack.sharding.device_set) == 8


def test_forward_adjoint_match_single_device():
    rows = _mixed_rows()
    mesh = make_block_mesh(8)
    layout = distribute_block_rows(rows, mesh)
    A = layout.operator
    ref = block_operator([[r] for r in rows])

    m = ref.dom.randn(jax.random.PRNGKey(1))
    d_ref = ref(m)
    d_new = A(m)
    # same blocks, regrouped: unpack back to original row order
    blocks = layout.unpack(d_new)
    for i in range(len(rows)):
        np.testing.assert_allclose(
            np.asarray(blocks[i]), np.asarray(d_ref.getblock(i)),
            rtol=1e-12, atol=1e-12,
        )
    # adjoint: pack the reference's blocks into the grouped layout
    d = [np.asarray(d_ref.getblock(i)) for i in range(len(rows))]
    a_ref = ref.adjoint_apply(d_ref)
    a_new = A.adjoint_apply(layout.pack(d))
    np.testing.assert_allclose(np.asarray(a_new), np.asarray(a_ref),
                               rtol=1e-10, atol=1e-12)


def test_dot_product_gate_on_distributed_operator():
    rows = _mixed_rows(seed=3)
    mesh = make_block_mesh(8)
    layout = distribute_block_rows(rows, mesh)
    A = layout.operator
    m = A.dom.randn(jax.random.PRNGKey(2))
    d = A.rng.randn(jax.random.PRNGKey(3))
    lhs, rhs = jt.dot_product_test(A, m, d)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-11)


def test_lsqr_converges_on_distributed_hetero_operator():
    """A solver on the sharded mixed-shape operator matches the
    single-device solve."""
    from jets_tpu.solvers import lsqr

    rows = _mixed_rows(seed=5)
    mesh = make_block_mesh(8)
    layout = distribute_block_rows(rows, mesh)
    A = layout.operator
    ref = block_operator([[r] for r in rows])

    m_true = ref.dom.randn(jax.random.PRNGKey(7))
    d_ref = ref(m_true)
    blocks = [np.asarray(d_ref.getblock(i)) for i in range(len(rows))]
    b = layout.pack(blocks)

    r0 = lsqr(ref, d_ref, maxiter=60, tol=1e-13)
    r1 = lsqr(A, b, maxiter=60, tol=1e-13)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(r0.x),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(r1.x), np.asarray(m_true),
                               rtol=1e-6, atol=1e-8)


def test_unsharded_fallback_group():
    """A group whose size does not divide the mesh axis stays unsharded
    but still computes correctly."""
    rng = np.random.default_rng(9)
    rows = [
        matrix_operator(jnp.asarray(rng.standard_normal((7, N))))
        for _ in range(3)  # 3 % 8 != 0
    ] + [diagonal_operator(jnp.asarray(1.0 + rng.random(N)))
         for _ in range(8)]
    mesh = make_block_mesh(8)
    layout = distribute_block_rows(rows, mesh)
    assert layout.sharded == [False, True]
    ref = block_operator([[r] for r in rows])
    m = ref.dom.randn(jax.random.PRNGKey(4))
    got = layout.unpack(layout.operator(m))
    want = ref(m)
    for i in range(len(rows)):
        np.testing.assert_allclose(np.asarray(got[i]),
                                   np.asarray(want.getblock(i)),
                                   rtol=1e-12, atol=1e-12)


def test_rejects_nonlinear_and_mixed_domains():
    rows = _mixed_rows()
    with pytest.raises(ValueError):
        distribute_block_rows(
            rows + [diagonal_operator(jnp.ones(5))], make_block_mesh(8)
        )
    with pytest.raises(TypeError):
        distribute_block_rows([rows[0].H], make_block_mesh(8))
