"""Semantics pinned by the reference's test-suite (SURVEY §4), re-pinned
here: functional linearization independence, sum sign bookkeeping, state-key
ambiguity, resource-cleanup recursion, perfstat propagation, block algebra
introspection, and the upstate refresh hook."""
import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops.diagonal import diagonal_operator
from jets_tpu.ops.elementwise import power_operator, square_operator
from jets_tpu.ops.matrix import matrix_operator


F64 = jnp.float64


def test_linearize_independence():
    """The reference pins jacobian! ALIASING (test/runtests.jl:203-217);
    our functional design deliberately deviates: every linearize() is
    independent — pin that."""
    sp = jt.Space((5,), F64)
    F = square_operator(sp)
    m1 = jnp.arange(1.0, 6.0)
    m2 = jnp.arange(10.0, 15.0)
    J1 = F.linearize(m1)
    J2 = F.linearize(m2)
    x = jnp.ones(5)
    np.testing.assert_allclose(J1(x), 2 * m1)
    np.testing.assert_allclose(J2(x), 2 * m2)  # J1 unaffected by J2
    np.testing.assert_allclose(J1(x), 2 * m1)


def test_upstate_refresh_on_linearize():
    """upstate runs at linearize time and refreshes derived state
    (reference upstate!, src/Jets.jl:297-301; JopRosenbrock test)."""
    sp = jt.Space((4,), F64)
    F = power_operator(sp, 3.0)
    m0 = jnp.array([1.0, 2.0, 3.0, 4.0])
    J = F.linearize(m0)
    np.testing.assert_allclose(J(jnp.ones(4)), 3.0 * m0**2)
    # gates
    obs, exp = jt.linearization_test(F, m0, mu=(0.1, 0.05, 0.025, 0.0125))
    np.testing.assert_allclose(np.asarray(obs), np.asarray(exp), rtol=0.2)
    lhs, rhs = jt.dot_product_test(J, sp.randn(jax.random.PRNGKey(0)),
                                   sp.randn(jax.random.PRNGKey(1)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_sum_sign_bookkeeping():
    """A - (B - C) distributes to A - B + C (reference flipsgn,
    src/Jets.jl:657-676, pinned at test/runtests.jl:464-465)."""
    sp = jt.Space((6,), F64)
    wa, wb, wc = (jnp.full(6, v) for v in (2.0, 3.0, 5.0))
    A, B, C = (diagonal_operator(w) for w in (wa, wb, wc))
    op = A - (B - C)
    m = jnp.ones(6)
    np.testing.assert_allclose(op(m), wa - wb + wc)
    # flattening: nested sums collapse into one sum jet
    assert jt.is_sum(op)
    assert len(op.jet.state["ops"]) == 3
    assert op.jet.state["sgns"] == (1, -1, 1)


def test_composite_flattening():
    sp = jt.Space((4,), F64)
    ws = [jnp.full(4, float(i + 2)) for i in range(4)]
    ops = [diagonal_operator(w) for w in ws]
    C = (ops[0] @ ops[1]) @ (ops[2] @ ops[3])
    assert jt.is_composite(C)
    assert len(C.jet.state["ops"]) == 4  # chains flatten (jops_comp)
    np.testing.assert_allclose(C(jnp.ones(4)), ws[0] * ws[1] * ws[2] * ws[3])


def test_state_key_lookup_and_ambiguity():
    """Composite state(key) searches children; ambiguity raises
    (reference src/Jets.jl:607-623, test/runtests.jl:438-451)."""
    w1 = jnp.ones(3)
    D1 = diagonal_operator(w1)
    D2 = diagonal_operator(2 * w1)
    C = D1 @ D2
    with pytest.raises(KeyError):
        jt.state(C, "w")  # both children have "w" -> ambiguous
    M = matrix_operator(jnp.eye(3))
    C2 = M @ D1
    np.testing.assert_allclose(jt.state(C2, "w"), w1)  # unique -> found
    np.testing.assert_allclose(jt.state(C2, "A"), jnp.eye(3))
    with pytest.raises(KeyError):
        jt.state(C2, "nope")


def test_close_recursion():
    """close() recurses through combinators (reference JopClose fixture,
    test/runtests.jl:11-18, recursion pinned :840-886)."""
    closed = []

    def make_closing_op(tag):
        fd, path = tempfile.mkstemp()
        os.close(fd)

        def closer(jet, _tag=tag, _path=path):
            closed.append(_tag)
            if os.path.exists(_path):
                os.remove(_path)

        sp = jt.Space((3,), F64)
        j = jt.Jet(dom=sp, rng=sp,
                   df=lambda dm, m0, s: dm, dft="self", close=closer)
        return jt.LinearOperator(j), path

    A, pa = make_closing_op("A")
    B, pb = make_closing_op("B")
    C, pc = make_closing_op("C")
    combo = A @ (B + C)
    jt.close(combo)
    assert sorted(closed) == ["A", "B", "C"]
    assert not os.path.exists(pa) and not os.path.exists(pb)


def test_perfstat_propagation():
    """Combinators surface the first non-None child perfstat
    (reference :597-605, :723-731; test/runtests.jl:888-899)."""
    sp = jt.Space((3,), F64)
    plain = jt.LinearOperator(jt.Jet(dom=sp, rng=sp,
                                     df=lambda dm, m0, s: dm, dft="self"))
    stats = {"mflops": 42}
    instr = jt.LinearOperator(
        jt.Jet(dom=sp, rng=sp, df=lambda dm, m0, s: 2 * dm, dft="self",
               perfstat=lambda jet: stats)
    )
    assert jt.perfstat(plain) is None
    assert jt.perfstat(instr) is stats
    assert jt.perfstat(plain @ instr) is stats
    assert jt.perfstat(plain + instr) is stats


def test_adjoint_block_indices_transpose():
    """getblock of an adjoint block op transposes indices and returns
    adjoint blocks (reference src/Jets.jl:1088, test :760-787)."""
    k = jax.random.PRNGKey(0)
    A = matrix_operator(jax.random.normal(k, (3, 4), F64))
    D = diagonal_operator(jnp.arange(1.0, 4.0))
    Z1 = jt.zero_block(jt.Space((3,), F64), jt.Space((3,), F64))
    Z2 = jt.zero_block(jt.Space((4,), F64), jt.Space((3,), F64))
    B = jt.block_operator([[A, Z1], [Z2, D]])
    blk = jt.getblock(B.H, 0, 1)  # = (B[1][0])^H = Z2^H
    assert blk.dom == Z2.rng and blk.rng == Z2.dom
    blk2 = jt.getblock(B.H, 0, 0)
    m = jnp.ones(3)
    np.testing.assert_allclose(np.asarray(blk2(m)), np.asarray(A.H(m)))
    assert jt.nblocks(B.H) == (2, 2)


def test_scale_and_neg():
    sp = jt.Space((4,), F64)
    D = diagonal_operator(jnp.arange(1.0, 5.0))
    m = jnp.ones(4)
    np.testing.assert_allclose((3.0 * D)(m), 3.0 * jnp.arange(1.0, 5.0))
    np.testing.assert_allclose((-D)(m), -jnp.arange(1.0, 5.0))
    # adjoint of scaled: (aA)^H = conj(a) A^H
    S = 2.0 * D
    lhs, rhs = jt.dot_product_test(S, sp.randn(jax.random.PRNGKey(2)),
                                   sp.randn(jax.random.PRNGKey(3)))
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=1e-12)


def test_blockvector_arithmetic_preserves_type():
    """Blockwise broadcasting produces BlockVectors (reference BlockArray
    broadcast machinery, test/runtests.jl:553-600)."""
    bs = jt.BlockSpace([jt.Space((3,), F64), jt.Space((2, 2), F64)])
    x = bs.ones()
    y = bs.rand(jax.random.PRNGKey(4))
    z = 2.0 * x + y - x / 2.0
    assert isinstance(z, jt.BlockVector)
    np.testing.assert_allclose(np.asarray(z.getblock(0)),
                               1.5 + np.asarray(y.getblock(0)))
    lo, hi = z.extrema()
    assert float(lo) <= float(hi)
    filled = z.fill(7.0)
    np.testing.assert_allclose(filled.ravel(), 7.0)


def test_matrix_interop_in_algebra():
    """Plain 2-D arrays participate in the algebra directly (reference
    matrix interop, src/Jets.jl:573-576,691-708)."""
    k = jax.random.PRNGKey(5)
    M = jax.random.normal(k, (4, 4), F64)
    D = diagonal_operator(jnp.arange(1.0, 5.0))
    C = D @ M  # auto-wrap on compose
    m = jnp.ones(4)
    np.testing.assert_allclose(np.asarray(C(m)),
                               np.arange(1.0, 5.0) * np.asarray(M @ m))
    S = D + M * 0.0  # auto-wrap on sum (zero matrix keeps value simple)
    np.testing.assert_allclose(np.asarray(S(m)), np.arange(1.0, 5.0))
