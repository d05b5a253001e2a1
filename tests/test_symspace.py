"""Generic symmetric spaces: the ``symspace()`` author hook (arbitrary
Hermitian index maps, reference ``src/Jets.jl:408-441``) and the logical
views (reference ``SymmetricArray``'s conj-map reads, ``:443-516``) —
full-spectrum equivalence gates BEYOND the rfft case."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt

KEY = jax.random.PRNGKey(0)


# ------------------------------------------------ rfft-space logical views

@pytest.mark.parametrize("n", [8, 9])
def test_rfft_to_logical_matches_full_fft_1d(n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n)
    sp = jt.SymmetricSpace((n // 2 + 1,), (n,), jnp.complex128)
    full = np.asarray(sp.to_logical(jnp.asarray(np.fft.rfft(x))))
    np.testing.assert_allclose(full, np.fft.fft(x), atol=1e-12)
    # from_logical is the left inverse
    back = np.asarray(sp.from_logical(jnp.asarray(np.fft.fft(x))))
    np.testing.assert_allclose(back, np.fft.rfft(x), atol=1e-12)


@pytest.mark.parametrize("shape", [(6, 8), (5, 9), (4, 6, 8)])
def test_rfft_to_logical_matches_full_fft_nd(shape):
    """n-D: the mirrored bins reflect EVERY axis modularly (the full DFT
    Hermitian symmetry), not just the rfft axis."""
    rng = np.random.default_rng(sum(shape))
    x = rng.standard_normal(shape)
    stored = shape[:-1] + (shape[-1] // 2 + 1,)
    sp = jt.SymmetricSpace(stored, shape, jnp.complex128, axis=-1)
    full = np.asarray(sp.to_logical(jnp.asarray(np.fft.rfftn(x))))
    np.testing.assert_allclose(full, np.fft.fftn(x), atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(sp.from_logical(jnp.asarray(np.fft.fftn(x)))),
        np.fft.rfftn(x), atol=1e-11,
    )


# ------------------------------------------------ symspace: arbitrary maps

def _rfft_map(n):
    def index_map(out_idx):
        (i,) = out_idx
        return ((n - i) % n,)

    return index_map


def test_symspace_reproduces_rfft_semantics():
    """The author hook with the modular-reflection map reproduces the
    dedicated rfft space's dot/norm exactly."""
    n = 16
    rng = np.random.default_rng(2)
    A = jnp.asarray(np.fft.rfft(rng.standard_normal(n)))
    B = jnp.asarray(np.fft.rfft(rng.standard_normal(n)))
    dedicated = jt.SymmetricSpace((n // 2 + 1,), (n,), jnp.complex128)
    generic = jt.symspace((n // 2 + 1,), (n,), jnp.complex128, _rfft_map(n))
    assert complex(generic.dot(A, B)) == pytest.approx(
        complex(dedicated.dot(A, B)), rel=1e-12
    )
    assert float(generic.norm(A)) == pytest.approx(
        float(dedicated.norm(A)), rel=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(generic.to_logical(A)),
        np.asarray(dedicated.to_logical(A)), atol=1e-12,
    )


def _reflection_map(n):
    """A NON-rfft Hermitian redundancy: pure reflection i -> n-1-i (no
    self-conjugate bins; every stored bin mirrors exactly once)."""

    def index_map(out_idx):
        (i,) = out_idx
        return (n - 1 - i,)

    return index_map


def test_symspace_arbitrary_map_full_spectrum_equivalence():
    """dot/norm of the MAPPED space equal the unweighted dot/norm of the
    expanded logical array — for an arbitrary (non-rfft) map."""
    n, h = 12, 6
    sp = jt.symspace((h,), (n,), jnp.complex128, _reflection_map(n))
    k1, k2 = jax.random.split(KEY)
    x = sp.randn(k1)
    y = sp.randn(k2)
    X, Y = sp.to_logical(x), sp.to_logical(y)
    assert X.shape == (n,)
    # logical array is consistent: mirrored half is the conjugate reflection
    np.testing.assert_allclose(
        np.asarray(X[h:]), np.conj(np.asarray(X[:h]))[::-1], atol=1e-12
    )
    assert complex(sp.dot(x, y)) == pytest.approx(
        complex(jnp.vdot(X, Y)), rel=1e-12
    )
    assert float(sp.norm(x)) == pytest.approx(
        float(jnp.linalg.norm(X)), rel=1e-12
    )
    # from_logical inverts to_logical
    np.testing.assert_allclose(np.asarray(sp.from_logical(X)),
                               np.asarray(x), atol=1e-12)


def test_symspace_2d_map():
    """2-D prefix box with a per-axis modular reflection map."""
    n1, n2 = 4, 8
    h2 = n2 // 2 + 1

    def index_map(out_idx):
        i, j = out_idx
        return ((n1 - i) % n1, (n2 - j) % n2)

    sp = jt.symspace((n1, h2), (n1, n2), jnp.complex128, index_map)
    rng = np.random.default_rng(3)
    x = rng.standard_normal((n1, n2))
    A = jnp.asarray(np.fft.rfftn(x))
    np.testing.assert_allclose(
        np.asarray(sp.to_logical(A)), np.fft.fftn(x), atol=1e-11
    )
    # Parseval against the full spectrum
    assert float(sp.norm(A)) == pytest.approx(
        float(np.linalg.norm(np.fft.fftn(x))), rel=1e-12
    )


def test_symspace_operator_gate():
    """An operator whose RANGE is a mapped symmetric space passes the
    dot-product gate with the adjoint derived through the logical view —
    proving the weighted inner product makes author adjoints work."""
    from jets_tpu.core.jet import Jet, LinearOperator

    n = 16
    dom = jt.Space((n,), jnp.float64)
    rng_sp = jt.symspace((n // 2 + 1,), (n,), jnp.complex128, _rfft_map(n))

    def df(dm, m0, state):
        return jnp.fft.rfft(dm)

    def dft(dd, m0, state):
        # <d, rfft m>_sym = <to_logical(d), fft m> = n <ifft to_logical(d), m>
        return n * jnp.real(jnp.fft.ifft(rng_sp.to_logical(dd)))

    A = LinearOperator(Jet(dom=dom, rng=rng_sp, df=df, dft=dft))
    m = dom.randn(jax.random.PRNGKey(5))
    d = rng_sp.randn(jax.random.PRNGKey(6))
    lhs, rhs = jt.dot_product_test(A, m, d)
    assert complex(lhs) == pytest.approx(complex(rhs), rel=1e-11)


def test_symspace_validation():
    with pytest.raises(ValueError):
        jt.symspace((6,), (12,), jnp.complex128, None)  # no map
    with pytest.raises(ValueError):
        # map lands outside the stored box
        jt.symspace((4,), (12,), jnp.complex128, lambda out: (out[0],))
    with pytest.raises(ValueError):
        jt.symspace((13,), (12,), jnp.complex128, _rfft_map(12))


def test_vec_refuses_nd_mapped_space():
    from jets_tpu.core.algebra import vec
    from jets_tpu.core.jet import Jet, LinearOperator

    n1, n2 = 4, 8

    def index_map(out_idx):
        i, j = out_idx
        return ((n1 - i) % n1, (n2 - j) % n2)

    rng_sp = jt.symspace((n1, n2 // 2 + 1), (n1, n2), jnp.complex128,
                         index_map)
    A = LinearOperator(Jet(
        dom=jt.Space((n1, n2), jnp.float64), rng=rng_sp,
        df=lambda dm, m0, s: jnp.fft.rfftn(dm),
        dft=lambda dd, m0, s: jnp.real(
            jnp.fft.ifftn(rng_sp.to_logical(dd))) * (n1 * n2),
    ))
    with pytest.raises(NotImplementedError):
        vec(A)
