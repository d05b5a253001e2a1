"""Property-style fuzz: random algebra trees built from the shipped op
packs must ALL pass the mandatory gates (the reference's test philosophy —
every operator, including every combinator output, satisfies the
dot-product identity; ``src/Jets.jl:1211-1226``).

Each seed builds a random chain of shape-compatible ops (compose / sum /
scale / adjoint-of / block) and runs dot-product + linearity against the
dense materialization ground truth.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.core.verify import dot_product_test, materialize
from jets_tpu.ops import (
    bandpass_operator,
    circshift_operator,
    difference_operator,
    integration_operator,
    mix_operator,
    roughness_operator,
    conv1d_operator,
    dct_operator,
    diagonal_operator,
    gradient_operator,
    identity_operator,
    matrix_operator,
    shift_operator,
    taper_operator,
    wavelet_operator,
)
from jets_tpu.ops.sampling import sinc_sampling_operator

N = 16
SP = jt.Space((N,), jnp.float64)


def _pool(rng):
    """Square N→N linear ops to draw from."""
    k = jax.random.PRNGKey(int(rng.integers(0, 2**31)))
    return [
        diagonal_operator(SP.rand(k) + 0.5),
        matrix_operator(jax.random.normal(k, (N, N), jnp.float64) / 4.0),
        identity_operator(SP),
        conv1d_operator(jnp.asarray([0.25, 0.5, 0.25]), N, jnp.float64),
        wavelet_operator(SP, "haar", levels=2),
        dct_operator(SP),
        bandpass_operator(SP, 0.01, 5.0, 40.0, f_taper=3.0),
        shift_operator(SP, 1.5, dt=1.0),
        taper_operator(SP, (3,)),
        circshift_operator(SP, (3,)),
        difference_operator(SP),
        integration_operator(SP, alpha=0.8),
        mix_operator(SP, (3,)),
        roughness_operator(SP, (5,)),
        sinc_sampling_operator(
            SP, [np.linspace(0.25, N - 1.25, N)]),
    ]


def _random_tree(rng, depth=0):
    pool = _pool(rng)
    op = pool[rng.integers(0, len(pool))]
    if depth >= 3:
        return op
    roll = rng.random()
    if roll < 0.35:
        return op @ _random_tree(rng, depth + 1)
    if roll < 0.55:
        return op + _random_tree(rng, depth + 1)
    if roll < 0.65:
        return op - _random_tree(rng, depth + 1)
    if roll < 0.75:
        return float(rng.uniform(0.5, 2.0)) * _random_tree(rng, depth + 1)
    if roll < 0.85:
        return jt.adjoint(_random_tree(rng, depth + 1))
    return op


@pytest.mark.parametrize("seed", range(12))
def test_random_algebra_tree_passes_gates(seed):
    rng = np.random.default_rng(seed)
    A = _random_tree(rng)
    assert A.dom.shape == (N,) and A.rng.shape == (N,)
    m = A.dom.randn(jax.random.PRNGKey(seed))
    d = A.rng.randn(jax.random.PRNGKey(seed + 100))
    lhs, rhs = dot_product_test(A, m, d)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-10, abs=1e-12)
    # materialization consistency: (A m) equals dense action
    M = np.asarray(materialize(A))
    assert np.allclose(np.asarray(A(m)), M @ np.asarray(m), atol=1e-10)
    # adjoint action equals dense transpose
    assert np.allclose(
        np.asarray(jt.adjoint(A)(d)), M.T @ np.asarray(d), atol=1e-10
    )


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_random_block_of_trees(seed):
    rng = np.random.default_rng(100 + seed)
    A11, A12 = _random_tree(rng), _random_tree(rng)
    A21, A22 = _random_tree(rng), _random_tree(rng)
    B = jt.block_operator([[A11, A12], [A21, A22]])
    m = B.dom.randn(jax.random.PRNGKey(seed))
    d = B.rng.randn(jax.random.PRNGKey(seed + 50))
    lhs, rhs = dot_product_test(B, m, d)
    assert float(lhs) == pytest.approx(float(rhs), rel=1e-10, abs=1e-12)
    dense = np.asarray(materialize(B))
    assert np.allclose(
        np.asarray(B.rng.ravel(B(m))),
        dense @ np.asarray(B.dom.ravel(m)),
        atol=1e-10,
    )


def test_random_tree_through_jit():
    rng = np.random.default_rng(7)
    A = _random_tree(rng)
    m = A.dom.randn(jax.random.PRNGKey(0))
    expect = np.asarray(A(m))
    got = np.asarray(jax.jit(lambda op, x: op(x))(A, m))
    assert np.allclose(got, expect, atol=1e-12)
