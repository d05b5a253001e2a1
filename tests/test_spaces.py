"""Space-protocol coverage over shapes × dtypes (reference parameterized
testsets, test/runtests.jl:58-94) + symmetric/block space semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt


@pytest.mark.parametrize("shape", [(7,), (3, 5), (2, 3, 4)])
@pytest.mark.parametrize("dtype", [jnp.float32, jnp.float64,
                                   jnp.complex64, jnp.complex128])
def test_space_protocol(shape, dtype):
    sp = jt.Space(shape, dtype)
    assert sp.ndim == len(shape)
    assert sp.size == int(np.prod(shape))
    assert len(sp) == sp.size
    z = sp.zeros()
    o = sp.ones()
    assert z.shape == shape and z.dtype == dtype
    assert float(jnp.real(jnp.sum(o))) == sp.size
    r = sp.rand(jax.random.PRNGKey(0))
    n = sp.randn(jax.random.PRNGKey(1))
    assert r.dtype == dtype and n.dtype == dtype
    # reshape round trip
    flat = sp.ravel(n)
    back = sp.reshape(flat)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(n))
    # space equality/hash
    assert sp == jt.Space(shape, dtype)
    assert hash(sp) == hash(jt.Space(shape, dtype))
    assert sp != jt.Space(shape + (1,), dtype)
    assert jt.space_of(n) == sp


def test_space_immutable_and_errors():
    sp = jt.Space((4,))
    with pytest.raises(AttributeError):
        sp.shape = (5,)
    with pytest.raises(ValueError):
        sp.reshape(jnp.ones(3))


def test_randperm():
    sp = jt.Space((10,))
    p = jt.randperm(jax.random.PRNGKey(0), sp)
    assert sorted(np.asarray(p).tolist()) == list(range(10))
    k = jt.randperm(jax.random.PRNGKey(0), sp, 4)
    assert k.shape == (4,)
    # the k-sample is sorted (reference src/Jets.jl:124) and is a subset of
    # the full permutation's support
    kl = np.asarray(k).tolist()
    assert kl == sorted(kl)
    assert len(set(kl)) == 4 and set(kl) <= set(range(10))


def test_norms_all_orders():
    sp = jt.Space((6,), jnp.float64)
    x = jnp.array([1.0, -2.0, 0.0, 4.0, -5.0, 0.5])
    np.testing.assert_allclose(float(sp.norm(x, 1)), np.sum(np.abs(x)))
    np.testing.assert_allclose(float(sp.norm(x, 2)), np.linalg.norm(x))
    np.testing.assert_allclose(float(sp.norm(x, jnp.inf)), 5.0)
    np.testing.assert_allclose(float(sp.norm(x, -jnp.inf)), 0.0)
    np.testing.assert_allclose(float(sp.norm(x, 0)), 5.0)  # nonzero count
    np.testing.assert_allclose(float(sp.norm(x, 3)),
                               np.sum(np.abs(np.asarray(x))**3)**(1/3))


def test_symmetric_space_weights():
    """Stored-bin multiplicities: DC and Nyquist count once, others twice
    (reference SymmetricArray doubled-norm semantics)."""
    ss = jt.SymmetricSpace((5,), (8,), jnp.complex128)  # even logical
    x = jnp.ones(5, jnp.complex128)
    # weights [1,2,2,2,1] -> norm^2 = 8
    np.testing.assert_allclose(float(ss.norm(x)), np.sqrt(8.0))
    so = jt.SymmetricSpace((5,), (9,), jnp.complex128)  # odd logical
    # weights [1,2,2,2,2] -> norm^2 = 9
    np.testing.assert_allclose(float(so.norm(x)), 3.0)
    with pytest.raises(ValueError):
        jt.SymmetricSpace((4,), (8,), jnp.complex128)  # wrong stored length


def test_blockspace_indices_and_reshape():
    bs = jt.BlockSpace([jt.Space((3,), jnp.float64),
                        jt.Space((2, 2), jnp.float64)])
    assert bs.size == 7 and bs.nblocks == 2
    assert list(bs.indices(0)) == [0, 1, 2]
    assert list(bs.indices(1)) == [3, 4, 5, 6]
    flat = jnp.arange(7.0)
    bv = bs.reshape(flat)
    np.testing.assert_array_equal(np.asarray(bv.getblock(1)),
                                  [[3.0, 4.0], [5.0, 6.0]])
    np.testing.assert_array_equal(np.asarray(bv.ravel()), np.asarray(flat))
    with pytest.raises(TypeError):
        jt.BlockSpace([jt.Space((3,), jnp.float64),
                       jt.Space((2,), jnp.float32)])  # mixed dtype


def test_symmetric_space_dot_matches_full_spectrum():
    # <x, y>_sym == <X, Y> over the FULL spectrum for rfft outputs of real
    # signals (the reference's doubled-half semantics, runtests.jl:227-258)
    import numpy as np

    n = 16
    rng = np.random.default_rng(0)
    a, b = rng.standard_normal(n), rng.standard_normal(n)
    A, B = np.fft.rfft(a), np.fft.rfft(b)
    Af, Bf = np.fft.fft(a), np.fft.fft(b)
    sp = jt.SymmetricSpace((n // 2 + 1,), (n,), jnp.complex128)
    lhs = complex(sp.dot(jnp.asarray(A), jnp.asarray(B)))
    rhs = complex(np.vdot(Af, Bf))
    assert lhs == pytest.approx(rhs, rel=1e-12)


def test_symmetric_space_odd_logical_length():
    # odd logical length: only bin 0 is self-conjugate (no Nyquist bin)
    import numpy as np

    n = 15
    rng = np.random.default_rng(1)
    a = rng.standard_normal(n)
    A = np.fft.rfft(a)
    sp = jt.SymmetricSpace((n // 2 + 1,), (n,), jnp.complex128)
    assert float(sp.norm(jnp.asarray(A))) == pytest.approx(
        float(np.linalg.norm(np.fft.fft(a))), rel=1e-12
    )


def test_symmetric_space_allocators_and_equality():
    sp = jt.SymmetricSpace((9,), (16,), jnp.complex128)
    z = sp.zeros()
    assert z.shape == (9,) and z.dtype == jnp.complex128
    k = jax.random.PRNGKey(0)
    r = sp.randn(k)
    assert r.dtype == jnp.complex128
    assert sp == jt.SymmetricSpace((9,), (16,), jnp.complex128)
    assert sp != jt.Space((9,), jnp.complex128)
    with pytest.raises(ValueError):
        jt.SymmetricSpace((8,), (16,), jnp.complex128)  # wrong stored len
