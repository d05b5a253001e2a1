"""Gates for the JetPack-extra op pack: causal integration/difference,
interpolation, acquisition geometry (blend, LMO), mix/roughness smoothers,
circshift, and the nonlinear envelope.

Strategy per the reference suite (``test/runtests.jl``): dot-product gate on
every linear op, Taylor-decay linearization gate on the nonlinear one, and
dense/numpy ground truths for the structural claims (inverse pairs,
permutation unitarity, blend-vs-loop equality).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.core.verify import dot_product_test, linearization_test, materialize
from jets_tpu.ops import (
    blend_operator,
    circshift_operator,
    difference_operator,
    envelope_operator,
    integration_operator,
    interp_operator,
    lmo_operator,
    mix_operator,
    roughness_operator,
)

KEY = jax.random.PRNGKey(13)


def _dp_gate(A, rtol=1e-10):
    k1, k2 = jax.random.split(KEY)
    m = A.dom.randn(k1)
    d = A.rng.randn(k2)
    lhs, rhs = dot_product_test(A, m, d)
    assert abs(lhs - rhs) <= rtol * (abs(lhs) + abs(rhs)) + 1e-12


# ------------------------------------------------------------- causal ops

@pytest.mark.parametrize("alpha", [1.0, 0.9])
@pytest.mark.parametrize("axis", [0, 1])
def test_integration_adjoint_and_dense(alpha, axis):
    sp = jt.Space((6, 7), jnp.float64)
    L = integration_operator(sp, alpha=alpha, axis=axis)
    _dp_gate(L)
    # dense ground truth: lower-triangular Toeplitz alpha^(t-s) along axis
    n = sp.shape[axis]
    T = np.tril(alpha ** (np.subtract.outer(np.arange(n), np.arange(n))))
    M = np.asarray(materialize(L)).reshape(sp.size, sp.size)
    x = np.random.default_rng(0).standard_normal(sp.shape)
    want = np.apply_along_axis(lambda v: T @ v, axis, x)
    assert np.allclose(np.asarray(L(jnp.asarray(x))), want, atol=1e-12)
    assert M.shape == (42, 42)


def test_difference_inverts_integration():
    sp = jt.Space((32,), jnp.float64)
    D = difference_operator(sp)
    S = integration_operator(sp, alpha=1.0)
    _dp_gate(D)
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(D(S(x))), np.asarray(x), atol=1e-12)
    assert np.allclose(np.asarray(S(D(x))), np.asarray(x), atol=1e-12)
    # dense transpose identity
    MD = np.asarray(materialize(D))
    MDt = np.asarray(materialize(D.H))
    assert np.allclose(MD.T, MDt, atol=1e-14)


# ------------------------------------------------------------------ interp

def test_interp_matches_numpy_and_adjoint():
    sp = jt.Space((4, 16), jnp.float64)
    pos = np.array([0.0, 0.25, 3.5, 7.9, 15.0])
    A = interp_operator(sp, pos, axis=1)
    assert A.rng.shape == (4, 5)
    _dp_gate(A)
    x = np.asarray(sp.randn(KEY))
    got = np.asarray(A(jnp.asarray(x)))
    grid = np.arange(16.0)
    want = np.stack([np.interp(pos, grid, row) for row in x])
    assert np.allclose(got, want, atol=1e-12)


def test_interp_adjoint_accumulates_duplicate_bins():
    sp = jt.Space((8,), jnp.float64)
    # two positions land in the same cell — scatter-add must accumulate
    A = interp_operator(sp, np.array([2.25, 2.75]), axis=0)
    _dp_gate(A)
    M = np.asarray(materialize(A))
    assert np.allclose(M.T, np.asarray(materialize(A.H)), atol=1e-14)


# ------------------------------------------------------------- acquisition

def test_blend_matches_loop_and_adjoint():
    nshots, nt, T = 3, 10, 40
    t0 = [0, 7, 23]
    B = blend_operator(nshots, nt, t0, T, dtype=jnp.float64)
    _dp_gate(B)
    x = np.asarray(B.dom.randn(KEY))
    want = np.zeros(T)
    for s in range(nshots):
        want[t0[s]:t0[s] + nt] += x[s]
    assert np.allclose(np.asarray(B(jnp.asarray(x))), want, atol=1e-12)


def test_blend_rejects_overrunning_firing_times():
    with pytest.raises(ValueError):
        blend_operator(2, 10, [0, 35], 40)


def test_lmo_adjoint_and_integer_shift_ground_truth():
    sp = jt.Space((3, 32), jnp.float64)
    dt = 0.004
    offsets = np.array([0.0, 100.0, 200.0])
    slowness = 2 * dt / 100.0  # trace i advances by 2*i samples exactly
    L = lmo_operator(sp, dt, offsets, slowness)
    _dp_gate(L)
    x = np.asarray(sp.randn(KEY))
    got = np.asarray(L(jnp.asarray(x)))
    for i in range(3):
        assert np.allclose(got[i], np.roll(x[i], -2 * i), atol=1e-10)


# ------------------------------------------------------------ mix/roughness

def test_mix_self_adjoint_and_mean_ground_truth():
    sp = jt.Space((9, 11), jnp.float64)
    A = mix_operator(sp, (3, 1))
    _dp_gate(A)
    x = np.asarray(sp.randn(KEY))
    got = np.asarray(A(jnp.asarray(x)))
    pad = np.pad(x, ((1, 1), (0, 0)))
    want = (pad[:-2] + pad[1:-1] + pad[2:]) / 3.0
    assert np.allclose(got, want, atol=1e-12)
    M = np.asarray(materialize(A))
    assert np.allclose(M, M.T, atol=1e-14)


def test_roughness_is_identity_minus_mix():
    sp = jt.Space((16,), jnp.float64)
    R = roughness_operator(sp, (5,))
    A = mix_operator(sp, (5,))
    _dp_gate(R)
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(R(x)), np.asarray(x) - np.asarray(A(x)),
                       atol=1e-14)
    # constant signal (away from edges) is maximally smooth
    c = jnp.ones(sp.shape, sp.dtype)
    assert np.allclose(np.asarray(R(c))[2:-2], 0.0, atol=1e-14)


# -------------------------------------------------------------- circshift

def test_circshift_unitary_permutation():
    sp = jt.Space((6, 8), jnp.float64)
    C = circshift_operator(sp, (2, -3))
    _dp_gate(C)
    x = np.asarray(sp.randn(KEY))
    assert np.allclose(np.asarray(C(jnp.asarray(x))),
                       np.roll(x, (2, -3), axis=(0, 1)), atol=1e-15)
    M = np.asarray(materialize(C))
    assert np.allclose(M.T @ M, np.eye(sp.size), atol=1e-14)


# --------------------------------------------------------------- envelope

def test_envelope_linearization_and_adjoint():
    sp = jt.Space((64,), jnp.float64)
    F = envelope_operator(sp)
    k1, k2 = jax.random.split(KEY)
    m0 = sp.randn(k1) + 2.0  # keep |analytic| away from 0
    obs, exp = linearization_test(F, m0)
    assert np.allclose(np.asarray(obs)[-2:], np.asarray(exp)[-2:], rtol=0.2)
    J = F.linearize(m0)
    m = sp.randn(k2)
    d = sp.randn(jax.random.PRNGKey(99))
    lhs, rhs = dot_product_test(J, m, d)
    assert abs(lhs - rhs) <= 1e-10 * (abs(lhs) + abs(rhs))


def test_envelope_of_analytic_tone_is_flat():
    n = 128
    sp = jt.Space((n,), jnp.float64)
    t = np.arange(n)
    x = jnp.asarray(np.cos(2 * np.pi * 8 * t / n))
    F = envelope_operator(sp)
    e = np.asarray(F(x))
    assert np.allclose(e, 1.0, atol=1e-10)


# ------------------------------------------------------------- projection

def test_projection_idempotent_self_adjoint():
    from jets_tpu.ops import projection_operator
    rng = np.random.default_rng(4)
    V = rng.standard_normal((3, 6, 5))
    P = projection_operator(jnp.asarray(V))
    _dp_gate(P)
    M = np.asarray(materialize(P))
    assert np.allclose(M, M.T, atol=1e-12)          # self-adjoint
    assert np.allclose(M @ M, M, atol=1e-12)        # idempotent
    assert np.isclose(np.trace(M), 3.0, atol=1e-10)  # rank = k
    # P fixes the spanning vectors
    v0 = jnp.asarray(V[0])
    assert np.allclose(np.asarray(P(v0)), np.asarray(v0), atol=1e-10)


def test_projection_complement_and_rank_deficiency():
    from jets_tpu.ops import projection_operator
    rng = np.random.default_rng(5)
    v = rng.standard_normal(12)
    V = np.stack([v, 2 * v, rng.standard_normal(12)])  # rank 2, not 3
    P = projection_operator(jnp.asarray(V))
    C = projection_operator(jnp.asarray(V), complement=True)
    M, MC = np.asarray(materialize(P)), np.asarray(materialize(C))
    assert np.isclose(np.trace(M), 2.0, atol=1e-10)
    assert np.allclose(M + MC, np.eye(12), atol=1e-12)
    _dp_gate(C)


# ------------------------------------------------------------ translation

def test_translation_matches_integer_roll():
    from jets_tpu.ops import translation_operator
    sp = jt.Space((16, 32), jnp.float64)
    T = translation_operator(sp, (3.0, -5.0))
    _dp_gate(T)
    x = np.asarray(sp.randn(KEY))
    got = np.asarray(T(jnp.asarray(x)))
    assert np.allclose(got, np.roll(x, (3, -5), axis=(0, 1)), atol=1e-10)


def test_translation_zero_shift_is_identity():
    from jets_tpu.ops import translation_operator
    sp = jt.Space((8,), jnp.float64)
    T = translation_operator(sp, (0.0,))
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(T(x)), np.asarray(x))


# ------------------------------------------------------------------- nim

def test_nim_monotone_profile_and_linearization():
    from jets_tpu.ops import nim_operator
    sp = jt.Space((3, 40), jnp.float64)
    F = nim_operator(sp, p=2.0, axis=1)
    m0 = sp.randn(KEY) + 0.1
    d = np.asarray(F(m0))
    assert np.all(np.diff(d, axis=1) >= -1e-14)          # monotone (p even)
    assert np.allclose(d[:, -1], 1.0, atol=1e-12)        # normalized
    obs, exp = linearization_test(F, m0)
    assert np.allclose(np.asarray(obs)[-2:], np.asarray(exp)[-2:], rtol=0.2)
    # handwritten tangent/adjoint pair passes the gate
    J = F.linearize(m0)
    lhs, rhs = dot_product_test(J, sp.randn(jax.random.PRNGKey(1)),
                                sp.randn(jax.random.PRNGKey(2)))
    assert abs(lhs - rhs) <= 1e-10 * (abs(lhs) + abs(rhs))
    # tangent matches jax.jvp of the forward
    dm = sp.randn(jax.random.PRNGKey(3))
    jvp = jax.jvp(lambda m: F(m), (m0,), (dm,))[1]
    assert np.allclose(np.asarray(J(dm)), np.asarray(jvp), atol=1e-12)


# --------------------------------------------------------------- reghost

def test_reghost_adjoint_and_vertical_incidence_ground_truth():
    from jets_tpu.ops import reghost_operator
    nx, nt, dt, dx = 8, 256, 0.004, 12.5
    c, depth = 1500.0, 15.0
    sp = jt.Space((nx, nt), jnp.float64)
    G = reghost_operator(sp, dt, dx, depth, c=c)
    _dp_gate(G, rtol=1e-9)
    # vertical incidence (k=0, a trace constant across x): ghost is a pure
    # two-way-delay echo with R=-1 — d(t) = m(t) - m(t - 2*depth/c)
    t = np.arange(nt) * dt
    pulse = np.exp(-0.5 * ((t - 0.3) / 0.01) ** 2)
    m = np.broadcast_to(pulse, (nx, nt)).copy()
    d = np.asarray(G(jnp.asarray(m)))
    lag = 2 * depth / c  # 0.02 s = 5 samples exactly
    want = pulse - np.roll(pulse, int(round(lag / dt)))
    assert np.allclose(d[0], want, atol=1e-8)
    # output is exactly real-valued machinery (already real dtype) and
    # x-invariant input stays x-invariant
    assert np.allclose(d, d[0][None, :], atol=1e-10)


def test_reghost_zero_reflectivity_is_identity():
    from jets_tpu.ops import reghost_operator
    sp = jt.Space((4, 64), jnp.float64)
    G = reghost_operator(sp, 0.004, 10.0, 12.0, sea_surface_reflectivity=0.0)
    x = sp.randn(KEY)
    assert np.allclose(np.asarray(G(x)), np.asarray(x), atol=1e-12)


# ---------------------------------------------------------------- convnd

@pytest.mark.parametrize("kshape", [(3, 3), (2, 4), (5, 1)])
def test_convnd_matches_scipy_and_adjoint(kshape):
    from jets_tpu.ops import convnd_operator
    from scipy.signal import convolve2d
    rng = np.random.default_rng(6)
    sp = jt.Space((9, 10), jnp.float64)
    k = rng.standard_normal(kshape)
    A = convnd_operator(jnp.asarray(k), sp)
    _dp_gate(A)
    x = np.asarray(sp.randn(KEY))
    got = np.asarray(A(jnp.asarray(x)))
    full = convolve2d(x, k, mode="full")
    lo = [(L - 1) // 2 for L in kshape]
    want = full[lo[0]:lo[0] + 9, lo[1]:lo[1] + 10]
    assert np.allclose(got, want, atol=1e-12)
    M = np.asarray(materialize(A))
    assert np.allclose(M.T, np.asarray(materialize(A.H)), atol=1e-13)


def test_convnd_3d_gate():
    from jets_tpu.ops import convnd_operator
    sp = jt.Space((6, 5, 7), jnp.float64)
    k = np.random.default_rng(7).standard_normal((3, 2, 3))
    A = convnd_operator(jnp.asarray(k), sp)
    _dp_gate(A)
