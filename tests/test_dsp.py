"""Gates for the DSP, wavelet, structural, and named-elementwise op packs.

Every linear op passes the dot-product test (the framework's mandatory CI
gate, reference ``src/Jets.jl:1211-1226``); nonlinears pass the
linearization (Taylor-decay) test. Ground truths: numpy FFT filtering,
orthonormality (Parseval), and dense materialization.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops import (
    atan_operator,
    bandpass_operator,
    cos_operator,
    exp_operator,
    imag_operator,
    log_operator,
    mute_operator,
    real_operator,
    resample_operator,
    reshape_operator,
    shift_operator,
    sigmoid_operator,
    sin_operator,
    sqrt_operator,
    tanh_operator,
    taper_operator,
    wavelet_operator,
)
from jets_tpu.core.verify import dot_product_test, linearization_test, materialize

KEY = jax.random.PRNGKey(7)


def _dp_gate(A, rtol=1e-10):
    k1, k2 = jax.random.split(KEY)
    m = A.dom.randn(k1)
    d = A.rng.randn(k2)
    lhs, rhs = dot_product_test(A, m, d)
    assert abs(lhs - rhs) <= rtol * (abs(lhs) + abs(rhs)) + 1e-12


# ---------------------------------------------------------------- wavelet

@pytest.mark.parametrize("wavelet", ["haar", "db2", "db3", "db4"])
@pytest.mark.parametrize("levels", [1, 2, 3])
def test_wavelet_orthonormal_and_adjoint(wavelet, levels):
    sp = jt.Space((32,), jnp.float64)
    W = wavelet_operator(sp, wavelet=wavelet, levels=levels)
    _dp_gate(W)
    # orthonormality: W^T W = I (adjoint = inverse) and Parseval
    M = np.asarray(materialize(W))
    assert np.allclose(M.T @ M, np.eye(32), atol=1e-12)
    x = sp.randn(KEY)
    assert np.isclose(
        float(jnp.linalg.norm(W(x))), float(jnp.linalg.norm(x)), rtol=1e-12
    )


def test_wavelet_2d_roundtrip():
    sp = jt.Space((16, 8), jnp.float64)
    W = wavelet_operator(sp, wavelet="db2", levels=2)
    _dp_gate(W)
    x = sp.randn(KEY)
    back = jt.adjoint(W)(W(x))
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-12)


def test_wavelet_haar_level1_matches_hand():
    sp = jt.Space((4,), jnp.float64)
    W = wavelet_operator(sp, wavelet="haar", levels=1)
    x = jnp.array([1.0, 2.0, 3.0, 4.0])
    y = np.asarray(W(x))
    s = 1 / np.sqrt(2)
    expect = np.array([s * 3.0, s * 7.0, s * -1.0, s * -1.0])
    assert np.allclose(y, expect)


def test_wavelet_validation():
    with pytest.raises(ValueError):
        wavelet_operator(jt.Space((6,), jnp.float64), levels=2)
    with pytest.raises(ValueError):
        wavelet_operator(jt.Space((8,), jnp.float64), wavelet="nope")


# -------------------------------------------------------------------- dsp

def test_taper_selfadjoint_and_edges():
    sp = jt.Space((32, 16), jnp.float64)
    T = taper_operator(sp, (4, 3))
    _dp_gate(T)
    x = sp.ones()
    y = np.asarray(T(x))
    assert y[16, 8] == pytest.approx(1.0)
    assert y[0, 8] < 0.1 and y[16, 0] < 0.2  # edges pulled to ~0


def test_bandpass_matches_numpy_and_is_symmetric():
    n, dt = 128, 0.004
    sp = jt.Space((n,), jnp.float64)
    B = bandpass_operator(sp, dt, 10.0, 60.0, f_taper=5.0)
    _dp_gate(B)
    x = sp.randn(KEY)
    # ground truth by numpy rfft masking
    f = np.fft.rfftfreq(n, d=dt)
    y = np.asarray(B(x))
    Y = np.fft.rfft(y)
    X = np.fft.rfft(np.asarray(x))
    # fully-passed band is untouched, fully-stopped band is zeroed
    passed = (f >= 10.0) & (f <= 60.0)
    stopped = (f < 5.0) | (f > 65.0)
    assert np.allclose(Y[passed], X[passed], atol=1e-12)
    assert np.allclose(Y[stopped], 0.0, atol=1e-12)
    # symmetric operator: M == M^T
    M = np.asarray(materialize(B))
    assert np.allclose(M, M.T, atol=1e-12)


def test_shift_integer_matches_roll_and_unitary():
    n = 64
    sp = jt.Space((n,), jnp.float64)
    S = shift_operator(sp, 5.0, dt=1.0)
    _dp_gate(S)
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(S(x)), np.roll(np.asarray(x), 5), atol=1e-10)
    # unitary: adjoint = inverse
    back = jt.adjoint(S)(S(x))
    assert np.allclose(np.asarray(back), np.asarray(x), atol=1e-10)


def test_shift_fractional_linearity():
    sp = jt.Space((64,), jnp.float64)
    S = shift_operator(sp, 2.5, dt=1.0)
    _dp_gate(S)
    lhs, rhs = jt.linearity_test(S)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)


def test_resample_downsample_band_limited_exact():
    # a band-limited signal survives 2x Fourier downsample exactly
    n, n_out = 64, 32
    sp = jt.Space((n,), jnp.float64)
    R = resample_operator(sp, n_out)
    _dp_gate(R)
    t = np.arange(n) / n
    x = np.sin(2 * np.pi * 3 * t) + 0.5 * np.cos(2 * np.pi * 7 * t)
    y = np.asarray(R(jnp.asarray(x)))
    t2 = np.arange(n_out) / n_out
    expect = np.sin(2 * np.pi * 3 * t2) + 0.5 * np.cos(2 * np.pi * 7 * t2)
    assert np.allclose(y, expect, atol=1e-10)
    assert R.rng.shape == (n_out,)


def test_resample_upsample_shape_and_adjoint():
    sp = jt.Space((8, 32), jnp.float64)
    R = resample_operator(sp, 48, axis=1)
    assert R.rng.shape == (8, 48)
    _dp_gate(R)


def test_mute_masks():
    sp = jt.Space((16,), jnp.float64)
    mask = jnp.concatenate([jnp.zeros(4), jnp.ones(12)])
    M = mute_operator(sp, mask)
    _dp_gate(M)
    y = np.asarray(M(sp.ones()))
    assert np.all(y[:4] == 0) and np.all(y[4:] == 1)


# ------------------------------------------------------------- structural

def test_reshape_operator_roundtrip():
    sp = jt.Space((6, 4), jnp.float64)
    R = reshape_operator(sp, (3, 8))
    _dp_gate(R)
    x = sp.randn(KEY)
    assert np.allclose(
        np.asarray(jt.adjoint(R)(R(x))), np.asarray(x), atol=0
    )
    with pytest.raises(ValueError):
        reshape_operator(sp, (5, 5))


def test_real_imag_operators():
    sp = jt.Space((12,), jnp.complex128)
    Re, Im = real_operator(sp), imag_operator(sp)
    k1, k2 = jax.random.split(KEY)
    m = sp.randn(k1)
    d = Re.rng.randn(k2)
    # R-linear adjoint identity under the REAL inner product Re<.,.>
    for A in (Re, Im):
        lhs = float(jnp.vdot(d, A(m)).real)
        rhs = float(jnp.vdot(jt.adjoint(A)(d), m).real)
        assert lhs == pytest.approx(rhs, rel=1e-12)
    assert np.allclose(
        np.asarray(Re(m) + 1j * Im(m)), np.asarray(m), atol=0
    )


# ------------------------------------------------- named elementwise pack

@pytest.mark.parametrize(
    "ctor,positive",
    [
        (exp_operator, False),
        (log_operator, True),
        (sqrt_operator, True),
        (tanh_operator, False),
        (sigmoid_operator, False),
        (atan_operator, False),
        (sin_operator, False),
        (cos_operator, False),
    ],
)
def test_named_elementwise_linearization(ctor, positive):
    sp = jt.Space((50,), jnp.float64)
    F = ctor(sp)
    m0 = sp.rand(KEY) + (1.0 if positive else 0.0)
    obs, exp = linearization_test(F, m0)
    # Taylor ratios approach the expected (mu_{i-1}/mu_i)^2 = 4
    assert np.allclose(np.asarray(obs)[-2:], np.asarray(exp)[-2:], rtol=0.2)
    # tangent adjoint pair is exact (diagonal)
    J = jt.linearize(F, m0)
    _dp_gate(J)


# ------------------------------------------------------------------ gradient

def test_gradient_operator_matches_dense():
    from jets_tpu.ops import gradient_operator

    sp = jt.Space((5, 4), jnp.float64)
    G = gradient_operator(sp, dx=0.5)
    _dp_gate(G)
    x = sp.randn(KEY)
    g = np.asarray(G(x))
    xn = np.asarray(x)
    expect0 = np.zeros_like(xn)
    expect0[:-1] = (xn[1:] - xn[:-1]) / 0.5
    expect1 = np.zeros_like(xn)
    expect1[:, :-1] = (xn[:, 1:] - xn[:, :-1]) / 0.5
    assert np.allclose(g[0], expect0, atol=1e-12)
    assert np.allclose(g[1], expect1, atol=1e-12)
    # -div is the adjoint: <Gx, y> == <x, G'y> certified above; also check
    # G'G is symmetric positive semidefinite (a graph Laplacian)
    M = np.asarray(jt.materialize(G))
    L = M.T @ M
    assert np.allclose(L, L.T)
    w = np.linalg.eigvalsh(L)
    assert w.min() > -1e-10


# --------------------------------------------------------------------- radon

def test_radon_slant_stack():
    from jets_tpu.ops.radon import radon_operator

    nt, dt = 128, 0.004
    offsets = np.arange(8) * 100.0
    slownesses = np.linspace(-4e-4, 4e-4, 9)
    R = radon_operator(nt, offsets, slownesses, dt, dtype=jnp.float64)
    assert R.dom.shape == (nt, 9) and R.rng.shape == (nt, 8)
    _dp_gate(R)
    lhs, rhs = jt.linearity_test(R)
    assert np.allclose(np.asarray(lhs), np.asarray(rhs), atol=1e-12)
    # a single-slowness spike at tau=t0 maps to a moved-out linear event:
    # d(t, x) peaks at t = t0 + p*x
    ip = 7  # p = slownesses[7]
    p = float(slownesses[ip])
    t0 = 40
    m = jnp.zeros((nt, 9), jnp.float64).at[t0, ip].set(1.0)
    d = np.asarray(R(m))
    for ix, x in enumerate(offsets):
        expect_t = (t0 * dt + p * x) / dt
        assert abs(int(np.argmax(d[:, ix])) - round(expect_t)) <= 1


# --------------------------------------------------- structural (orthogonal)

def test_transpose_flip_permutation_operators():
    from jets_tpu.ops import (
        flip_operator, permutation_operator, transpose_operator,
    )

    sp = jt.Space((4, 6), jnp.float64)
    T = transpose_operator(sp, (1, 0))
    assert T.rng.shape == (6, 4)
    _dp_gate(T)
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(T(x)), np.asarray(x).T, atol=0)
    assert np.allclose(np.asarray(jt.adjoint(T)(T(x))), np.asarray(x), atol=0)

    Fl = flip_operator(sp, (1,))
    _dp_gate(Fl)
    assert np.allclose(np.asarray(Fl(x)), np.asarray(x)[:, ::-1], atol=0)

    perm = jax.random.permutation(KEY, sp.size)
    P = permutation_operator(sp, perm)
    _dp_gate(P)
    assert np.allclose(np.asarray(jt.adjoint(P)(P(x))), np.asarray(x), atol=0)
    M = np.asarray(materialize(P))
    assert np.allclose(M.T @ M, np.eye(sp.size), atol=0)  # orthogonal
