"""Gates for the fused Pallas 3-D wave step (``ops/pallas_wave.py``).

Scope of the bit-exactness contract (same as the 3-D solver kernels,
``ops/pallas_solver.py``): at ``order=2`` the kernel reproduces the jitted
XLA step bit-for-bit; at orders 4/8 XLA fuses the coefficient
multiply-accumulates into FMAs that the kernel (and interpret mode)
evaluates as separate ops, so equality there is to a few ulps.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import jets_tpu as jt
from jets_tpu.ops.pallas_wave import (
    fits_wave_pallas,
    fused_leapfrog_step,
    wave_step_tile,
)
from jets_tpu.ops.stencil import laplacian_nd
from jets_tpu.ops.wave import wave_propagator

SHAPE = (16, 8, 128)

# receivers along the x-line through the source: the default strided
# receiver set degenerates to the x=0 plane for W=128 shapes, which a
# short-nt wavefront (support grows one cell per step) can NEVER reach —
# traces would be exactly zero and every fused-vs-XLA agreement vacuous.
SRC_ZYX = (8, 4, 64)
RCV_LINE = jnp.asarray(
    [np.ravel_multi_index((SRC_ZYX[0], SRC_ZYX[1], x), (16, 8, 128))
     for x in range(128)], jnp.int32)


def _assert_live(d):
    """Guard against vacuously-passing agreement tests: the wavefront must
    actually have reached some receivers."""
    assert float(jnp.max(jnp.abs(d))) > 0.0, \
        "test signal is identically zero — receivers unreachable"


def _inputs(order, key=0):
    D, H, W = SHAPE
    k1, k2, k3 = jax.random.split(jax.random.PRNGKey(key), 3)
    u = jax.random.normal(k1, SHAPE, jnp.float32)
    up = jax.random.normal(k2, SHAPE, jnp.float32)
    c2 = jax.random.uniform(k3, SHAPE, jnp.float32) + 0.5
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    src = 5 * H * W + 3 * W + 17
    s_t, amp = jnp.float32(0.37), jnp.float32(2.5e-7)

    @jax.jit
    def xla_step(up, u, c2):
        D, H, W = SHAPE
        lap = laplacian_nd(u, order=order)
        mask = (jnp.zeros((D * H * W,), jnp.float32).at[src].set(amp)
                .reshape(SHAPE))
        sponge = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(
            1, 1, W)
        return ((2.0 * u - up) + c2 * lap) * sponge + s_t * mask

    return (up, u, c2, sz, sy.reshape(H, 1), sx.reshape(1, W), s_t, src,
            amp), xla_step


def test_fused_step_bit_exact_order2():
    (up, u, c2, sz, sy, sx, s_t, src, amp), xla_step = _inputs(2)
    out = fused_leapfrog_step(up, u, c2, sz, sy, sx, s_t, src, amp,
                              order=2, interpret=True)
    want = xla_step(up, u, c2)
    assert np.array_equal(np.asarray(out), np.asarray(want)), \
        "order-2 fused step must be bit-exact vs the jitted XLA step"


@pytest.mark.parametrize("order", [4, 8])
def test_fused_step_matches_higher_orders(order):
    (up, u, c2, sz, sy, sx, s_t, src, amp), xla_step = _inputs(order)
    out = fused_leapfrog_step(up, u, c2, sz, sy, sx, s_t, src, amp,
                              order=order, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(xla_step(
        up, u, c2)), rtol=2e-5, atol=2e-5)


def test_fused_step_source_injection_exact():
    """The in-register iota mask lands amp·s_t at exactly the source cell."""
    (up, u, c2, sz, sy, sx, s_t, src, _), _ = _inputs(2)
    amp = jnp.float32(0.125)  # exactly representable against an O(10) field
    a = fused_leapfrog_step(up, u, c2, sz, sy, sx, s_t, src, amp,
                            order=2, interpret=True)
    b = fused_leapfrog_step(up, u, c2, sz, sy, sx, s_t, src, jnp.float32(0.0),
                            order=2, interpret=True)
    d = np.array(a - b).ravel()
    np.testing.assert_allclose(d[src], 0.37 * 0.125, rtol=1e-5)
    d[src] = 0.0
    assert not d.any(), "source must touch exactly one cell"


def test_fits_and_tile_gating():
    assert fits_wave_pallas(SHAPE, jnp.float32, 2)
    assert not fits_wave_pallas((16, 8, 100), jnp.float32, 2)  # lanes
    assert not fits_wave_pallas((16, 8), jnp.float32, 2)       # 2-D
    assert not fits_wave_pallas(SHAPE, jnp.float64, 2)          # dtype
    assert wave_step_tile(SHAPE, 8) >= 4                        # halo fits
    with pytest.raises(ValueError, match="fused wave step"):
        wave_propagator((8, 8), nt=4, fused=True)


@pytest.mark.parametrize("order", [2, 4])
def test_fused_propagator_matches_xla_path(order):
    """Full fused-path propagator ≈ the XLA path over a whole scan, and its
    custom-jvp tangent/adjoint pass the dot-product gate."""
    kw = dict(nt=40, dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, space_order=order, dtype=jnp.float32)
    Ff = wave_propagator(SHAPE, fused=True, **kw)
    Fx = wave_propagator(SHAPE, fused=False, **kw)
    c = jnp.full(SHAPE, 1500.0, jnp.float32) + 20.0 * jax.random.normal(
        jax.random.PRNGKey(5), SHAPE, jnp.float32)
    df, dx_ = Ff(c), Fx(c)
    _assert_live(dx_)
    scale = float(jnp.max(jnp.abs(dx_))) or 1.0
    np.testing.assert_allclose(np.asarray(df) / scale,
                               np.asarray(dx_) / scale, atol=5e-5)

    J = Ff.linearize(c)
    m = J.dom.randn(jax.random.PRNGKey(6)).astype(jnp.float32)
    d = J.rng.randn(jax.random.PRNGKey(7)).astype(jnp.float32)
    lhs, rhs = jt.dot_product_test(J, m, d)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)

    # the tangent is the SAME XLA expression on both paths: gradients of
    # the fused and unfused propagators must agree tightly
    gf = jax.grad(lambda cc: jnp.sum(Ff(cc) ** 2))(c)
    gx = jax.grad(lambda cc: jnp.sum(Fx(cc) ** 2))(c)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx),
                               rtol=1e-3, atol=1e-5 * float(
                                   jnp.max(jnp.abs(gx))))


def test_fused_propagator_remat_path():
    """Blocked remat composes with the custom-jvp fused step: the gradient
    matches the plain-checkpoint fused path to compile-grouping noise
    (checkpoint boundaries change XLA's backward fusion groups — measured
    ~3e-9 relative; it is NOT bit-equal once receivers carry real
    signal)."""
    kw = dict(nt=24, dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, dtype=jnp.float32)
    F1 = wave_propagator(SHAPE, fused=True, remat_blocks=1, **kw)
    F4 = wave_propagator(SHAPE, fused=True, remat_blocks=4, **kw)
    c = jnp.full(SHAPE, 1500.0, jnp.float32)
    _assert_live(F1(c))
    g1 = jax.grad(lambda cc: jnp.sum(F1(cc) ** 2))(c)
    g4 = jax.grad(lambda cc: jnp.sum(F4(cc) ** 2))(c)
    scale = float(np.max(np.abs(np.asarray(g1))))
    assert scale > 0.0
    np.testing.assert_allclose(np.asarray(g1) / scale,
                               np.asarray(g4) / scale, rtol=0, atol=1e-6)


# ---------------------------------------------------------------------- #
# fused VTI coupled step
# ---------------------------------------------------------------------- #


def test_fused_vti_step_matches_xla():
    """Kernel (p_next, q_next) vs the jitted XLA coupled update."""
    from jets_tpu.ops.pallas_wave import fits_vti_pallas, fused_vti_step
    from jets_tpu.ops.wave import _d2_axis

    D, H, W = SHAPE
    ks = jax.random.split(jax.random.PRNGKey(9), 7)
    pp, p, qp, q = (jax.random.normal(k, SHAPE, jnp.float32)
                    for k in ks[:4])
    c2 = jax.random.uniform(ks[4], SHAPE, jnp.float32) + 0.5
    ah = 1.0 + 0.2 * jax.random.uniform(ks[5], SHAPE, jnp.float32)
    av = 1.0 + 0.1 * jax.random.uniform(ks[6], SHAPE, jnp.float32)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    inv_dx2 = jnp.float32(0.01)
    s_t, amp = jnp.float32(0.3), jnp.float32(0.125)
    src = 5 * H * W + 3 * W + 17
    assert fits_vti_pallas(SHAPE, jnp.float32, 2)

    po, qo = fused_vti_step(pp, p, qp, q, c2, ah, av, sz,
                            sy.reshape(H, 1), sx.reshape(1, W),
                            inv_dx2, s_t, src, amp, order=2, interpret=True)

    @jax.jit
    def xla(pp, p, qp, q):
        lh = _d2_axis(p, 1, inv_dx2, 2) + _d2_axis(p, 2, inv_dx2, 2)
        dzz = _d2_axis(q, 0, inv_dx2, 2)
        sponge = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(
            1, 1, W)
        mask = (jnp.zeros((D * H * W,), jnp.float32).at[src].set(amp)
                .reshape(SHAPE))
        pn = (2.0 * p - pp + c2 * (ah * lh + av * dzz)) * sponge \
            + s_t * mask
        qn = (2.0 * q - qp + c2 * (av * lh + dzz)) * sponge + s_t * mask
        return pn, qn

    pn, qn = xla(pp, p, qp, q)
    np.testing.assert_allclose(np.asarray(po), np.asarray(pn),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qo), np.asarray(qn),
                               rtol=2e-5, atol=2e-5)


def test_fused_vti_propagator_matches_xla_path():
    from jets_tpu.ops.wave import vti_wave_propagator

    kw = dict(nt=30, dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, dtype=jnp.float32)
    Ff = vti_wave_propagator(SHAPE, fused=True, **kw)
    Fx = vti_wave_propagator(SHAPE, fused=False, **kw)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    m = (Ff.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(0.1))
         .setblock(2, full(0.05)))
    df, dx_ = Ff(m), Fx(m)
    _assert_live(dx_)
    scale = float(jnp.max(jnp.abs(dx_))) or 1.0
    np.testing.assert_allclose(np.asarray(df) / scale,
                               np.asarray(dx_) / scale, atol=5e-5)

    J = Ff.linearize(m)
    mm = J.dom.randn(jax.random.PRNGKey(12))
    dd = J.rng.randn(jax.random.PRNGKey(13))
    lhs, rhs = jt.dot_product_test(J, mm, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)

    # gradients of fused vs XLA propagators agree (same XLA tangent)
    def loss(F):
        return jax.grad(lambda b: jnp.sum(F(m.setblock(0, full(1800.0)
                                            + b)) ** 2))(full(0.0))

    gf, gx = loss(Ff), loss(Fx)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-3,
                               atol=1e-5 * float(jnp.max(jnp.abs(gx))))


def test_fused_vti_odd_nt_and_remat():
    from jets_tpu.ops.wave import vti_wave_propagator

    kw = dict(dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, dtype=jnp.float32)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    F21 = vti_wave_propagator(SHAPE, nt=21, fused=True, **kw)
    m = (F21.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(0.1))
         .setblock(2, full(0.05)))
    d21 = F21(m)
    _assert_live(d21)
    assert d21.shape[0] == 21
    Fx = vti_wave_propagator(SHAPE, nt=21, fused=False, **kw)
    scale = float(jnp.max(jnp.abs(d21))) or 1.0
    np.testing.assert_allclose(np.asarray(d21) / scale,
                               np.asarray(Fx(m)) / scale, atol=5e-5)
    # remat composes with the fused coupled step
    F4 = vti_wave_propagator(SHAPE, nt=20, fused=True, remat_blocks=5, **kw)
    g = jax.grad(lambda b: jnp.sum(F4(m.setblock(0, full(1800.0) + b))
                                   ** 2))(full(0.0))
    assert bool(jnp.all(jnp.isfinite(g)))


# ---------------------------------------------------------------------- #
# fused TTI coupled step
# ---------------------------------------------------------------------- #


def test_fused_tti_step_matches_xla():
    """Kernel (p_next, q_next) vs the jitted XLA coupled TTI update
    (six second derivatives per field, including the composed-first-
    difference cross terms)."""
    from jets_tpu.ops.pallas_wave import fits_tti_pallas, fused_tti_step
    from jets_tpu.ops.wave import _d1_axis, _d2_axis

    D, H, W = SHAPE
    ks = jax.random.split(jax.random.PRNGKey(21), 10)
    pp, p, qp, q = (jax.random.normal(k, SHAPE, jnp.float32)
                    for k in ks[:4])
    c2 = jax.random.uniform(ks[4], SHAPE, jnp.float32) + 0.5
    ah = 1.0 + 0.2 * jax.random.uniform(ks[5], SHAPE, jnp.float32)
    av = 1.0 + 0.1 * jax.random.uniform(ks[6], SHAPE, jnp.float32)
    theta = 0.3 * jax.random.uniform(ks[7], SHAPE, jnp.float32)
    phi = 2.0 * jax.random.uniform(ks[8], SHAPE, jnp.float32)
    nz = jnp.cos(theta)
    st = jnp.sin(theta)
    ny = st * jnp.cos(phi)
    nx = st * jnp.sin(phi)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    inv_dx2, inv_dx = jnp.float32(0.01), jnp.float32(0.1)
    s_t, amp = jnp.float32(0.3), jnp.float32(0.125)
    src = 5 * H * W + 3 * W + 17
    assert fits_tti_pallas(SHAPE, jnp.float32, 2)

    po, qo = fused_tti_step(pp, p, qp, q, c2, ah, av, nz, ny, nx, sz,
                            sy.reshape(H, 1), sx.reshape(1, W),
                            inv_dx2, inv_dx, s_t, src, amp,
                            order=2, interpret=True)

    czz, cyy, cxx = nz * nz, ny * ny, nx * nx
    czy, czx, cyx = 2.0 * nz * ny, 2.0 * nz * nx, 2.0 * ny * nx

    @jax.jit
    def xla(pp, p, qp, q):
        def dij(u, i, j):
            return _d1_axis(_d1_axis(u, i, inv_dx, 2), j, inv_dx, 2)

        def HV(u):
            uzz = _d2_axis(u, 0, inv_dx2, 2)
            uyy = _d2_axis(u, 1, inv_dx2, 2)
            uxx = _d2_axis(u, 2, inv_dx2, 2)
            uzy, uzx, uyx = dij(u, 0, 1), dij(u, 0, 2), dij(u, 1, 2)
            V = (czz * uzz + cyy * uyy + cxx * uxx
                 + czy * uzy + czx * uzx + cyx * uyx)
            Hh = ((1.0 - czz) * uzz + (1.0 - cyy) * uyy + (1.0 - cxx) * uxx
                  - czy * uzy - czx * uzx - cyx * uyx)
            return Hh, V

        Hp, _ = HV(p)
        _, Vq = HV(q)
        sponge = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(
            1, 1, W)
        mask = (jnp.zeros((D * H * W,), jnp.float32).at[src].set(amp)
                .reshape(SHAPE))
        pn = (2.0 * p - pp + c2 * (ah * Hp + av * Vq)) * sponge + s_t * mask
        qn = (2.0 * q - qp + c2 * (av * Hp + Vq)) * sponge + s_t * mask
        return pn, qn

    pn, qn = xla(pp, p, qp, q)
    np.testing.assert_allclose(np.asarray(po), np.asarray(pn),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(qo), np.asarray(qn),
                               rtol=2e-5, atol=2e-5)


def test_fused_tti_propagator_matches_xla_path():
    from jets_tpu.ops.wave import tti_wave_propagator

    kw = dict(nt=30, dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, dtype=jnp.float32)
    Ff = tti_wave_propagator(SHAPE, fused=True, **kw)
    Fx = tti_wave_propagator(SHAPE, fused=False, **kw)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    m = (Ff.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(0.1))
         .setblock(2, full(0.05)).setblock(3, full(0.2))
         .setblock(4, full(0.7)))
    df, dx_ = Ff(m), Fx(m)
    _assert_live(dx_)
    scale = float(jnp.max(jnp.abs(dx_))) or 1.0
    np.testing.assert_allclose(np.asarray(df) / scale,
                               np.asarray(dx_) / scale, atol=5e-5)

    J = Ff.linearize(m)
    mm = J.dom.randn(jax.random.PRNGKey(22))
    dd = J.rng.randn(jax.random.PRNGKey(23))
    lhs, rhs = jt.dot_product_test(J, mm, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)

    # gradients of fused vs XLA propagators agree (the fused step's tangent
    # IS the XLA expression) — checked through the tilt-angle block too
    def loss(F):
        return jax.grad(lambda b: jnp.sum(F(m.setblock(3, full(0.2)
                                            + b)) ** 2))(full(0.0))

    gf, gx = loss(Ff), loss(Fx)
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-3,
                               atol=1e-5 * float(jnp.max(jnp.abs(gx))))


def test_fused_tti_odd_nt_and_gating():
    from jets_tpu.ops.wave import tti_wave_propagator

    kw = dict(dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE,
              sponge_width=3, dtype=jnp.float32)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    F21 = tti_wave_propagator(SHAPE, nt=21, fused=True, **kw)
    m = (F21.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(0.1))
         .setblock(2, full(0.05)).setblock(3, full(0.15))
         .setblock(4, full(0.4)))
    d21 = F21(m)
    _assert_live(d21)
    assert d21.shape[0] == 21
    Fx = tti_wave_propagator(SHAPE, nt=21, fused=False, **kw)
    scale = float(jnp.max(jnp.abs(d21))) or 1.0
    np.testing.assert_allclose(np.asarray(d21) / scale,
                               np.asarray(Fx(m)) / scale, atol=5e-5)
    # 2-D grids cannot take the fused path
    with pytest.raises(ValueError, match="fused TTI"):
        tti_wave_propagator((8, 128), nt=4, fused=True)


# ---------------------------------------------------------------------- #
# fused visco-acoustic (Kosloff constant-Q) step
# ---------------------------------------------------------------------- #


def test_fused_q_step_bit_exact_order2():
    """Kernel vs the jitted XLA attenuating update (exact tree at order 2;
    the kernel recomputes (1−g)/(1/(1+g)) in-register from the single g
    field — the same f32 ops as the precomputed coefficient arrays)."""
    from jets_tpu.ops.pallas_wave import fits_q_pallas, fused_q_step

    D, H, W = SHAPE
    ks = jax.random.split(jax.random.PRNGKey(15), 4)
    up, u = (jax.random.normal(k, SHAPE, jnp.float32) for k in ks[:2])
    c2 = jax.random.uniform(ks[2], SHAPE, jnp.float32) + 0.5
    g = 0.02 * jax.random.uniform(ks[3], SHAPE, jnp.float32)
    og = 1.0 - g
    ig = 1.0 / (1.0 + g)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    s_t, amp = jnp.float32(0.37), jnp.float32(2.5e-7)
    src = 5 * H * W + 3 * W + 17
    assert fits_q_pallas(SHAPE, jnp.float32, 2)

    out = fused_q_step(up, u, c2, g, sz, sy.reshape(H, 1),
                       sx.reshape(1, W), s_t, src, amp,
                       order=2, interpret=True)

    @jax.jit
    def xla(up, u, c2):
        lap = laplacian_nd(u, order=2)
        sponge = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(
            1, 1, W)
        mask = (jnp.zeros((D * H * W,), jnp.float32).at[src].set(amp)
                .reshape(SHAPE))
        return ((2.0 * u - og * up + c2 * lap) * ig) * sponge + s_t * mask

    np.testing.assert_allclose(np.asarray(out), np.asarray(xla(up, u, c2)),
                               rtol=1e-6, atol=1e-6)

    # bf16 g: kernel upcast matches the XLA path on the same rounded field
    gr = jax.lax.reduce_precision(g, 8, 7)
    out16 = fused_q_step(up, u, c2, gr.astype(jnp.bfloat16), sz,
                         sy.reshape(H, 1), sx.reshape(1, W), s_t, src, amp,
                         order=2, interpret=True)

    @jax.jit
    def xla16(up, u, c2):
        lap = laplacian_nd(u, order=2)
        sponge = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(
            1, 1, W)
        mask = (jnp.zeros((D * H * W,), jnp.float32).at[src].set(amp)
                .reshape(SHAPE))
        return ((2.0 * u - (1.0 - gr) * up + c2 * lap)
                * (1.0 / (1.0 + gr))) * sponge + s_t * mask

    np.testing.assert_allclose(np.asarray(out16),
                               np.asarray(xla16(up, u, c2)),
                               rtol=1e-6, atol=1e-6)


def test_fused_q_propagator_matches_xla_path():
    from jets_tpu.ops.wave import q_wave_propagator

    kw = dict(nt=30, dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE, sponge_width=3, dtype=jnp.float32)
    Ff = q_wave_propagator(SHAPE, fused=True, **kw)
    Fx = q_wave_propagator(SHAPE, fused=False, **kw)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    m = Ff.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(60.0))
    df, dx_ = Ff(m), Fx(m)
    _assert_live(dx_)
    scale = float(jnp.max(jnp.abs(dx_))) or 1.0
    np.testing.assert_allclose(np.asarray(df) / scale,
                               np.asarray(dx_) / scale, atol=5e-5)

    J = Ff.linearize(m)
    mm = J.dom.randn(jax.random.PRNGKey(16))
    dd = J.rng.randn(jax.random.PRNGKey(17))
    lhs, rhs = jt.dot_product_test(J, mm, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)

    # gradient through BOTH model blocks (velocity and Q) matches XLA
    def loss(F):
        gm = jax.grad(lambda b: jnp.sum(F(m.setblock(1, full(60.0) + b))
                                        ** 2))(full(0.0))
        return gm

    gf, gx = loss(Ff), loss(Fx)
    assert float(jnp.max(jnp.abs(gx))) > 0.0
    np.testing.assert_allclose(np.asarray(gf), np.asarray(gx), rtol=1e-3,
                               atol=1e-5 * float(jnp.max(jnp.abs(gx))))


def test_fused_q_odd_nt_and_dtrec():
    from jets_tpu.ops.wave import q_wave_propagator

    kw = dict(dt=6e-4, dx=10.0, freq=16.0,
              src_idx=int(np.ravel_multi_index((8, 4, 64), SHAPE)),
              rcv_idx=RCV_LINE, sponge_width=3, dtype=jnp.float32)
    full = lambda v: jnp.full(SHAPE, v, jnp.float32)  # noqa: E731
    F21 = q_wave_propagator(SHAPE, nt=21, fused=True, **kw)
    m = F21.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(60.0))
    d21 = F21(m)
    _assert_live(d21)
    assert d21.shape[0] == 21
    Fx = q_wave_propagator(SHAPE, nt=21, fused=False, **kw)
    scale = float(jnp.max(jnp.abs(d21))) or 1.0
    np.testing.assert_allclose(np.asarray(d21) / scale,
                               np.asarray(Fx(m)) / scale, atol=5e-5)
    # dtrec composes with the fused attenuating step
    Fr = q_wave_propagator(SHAPE, nt=21, dtrec=1.2e-3, fused=True, **kw)
    assert Fr.rng.shape[0] == 11 and Fr(m).shape[0] == 11


# ---------------------------------------------------------------------- #
# fused adjoint (reverse-sweep) step — the FWI/RTM gradient hot path
# ---------------------------------------------------------------------- #

# int8 histories tile at (32, 128): H must be a multiple of 32
ASHAPE = (16, 32, 128)
ASRC = int(np.ravel_multi_index((8, 16, 64), ASHAPE))
ARCV = jnp.asarray(
    [np.ravel_multi_index((8, 16, x), ASHAPE) for x in range(128)],
    jnp.int32)
AKW = dict(nt=30, dt=6e-4, dx=10.0, freq=16.0, src_idx=ASRC,
           rcv_idx=ARCV, sponge_width=3, dtype=jnp.float32)


def test_fused_adjoint_step_bit_exact_order2():
    from jets_tpu.ops.pallas_wave import fused_adjoint_step

    D, H, W = SHAPE
    keys = jax.random.split(jax.random.PRNGKey(11), 5)
    a1 = jax.random.normal(keys[0], SHAPE, jnp.float32)
    a2 = jax.random.normal(keys[1], SHAPE, jnp.float32)
    gc2 = jax.random.normal(keys[2], SHAPE, jnp.float32)
    c2 = jax.random.uniform(keys[3], SHAPE, jnp.float32) + 0.5
    u = jax.random.normal(keys[4], SHAPE, jnp.float32)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)

    @jax.jit
    def xla_ref(a1, a2, gc2, c2, u):
        S = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(1, 1, W)
        ebar = a1 * S
        gc2n = gc2 + laplacian_nd(u, order=2) * ebar
        core = (2.0 * ebar + laplacian_nd(c2 * ebar, order=2)) - a2 * S
        return core, gc2n

    core, gc2n = fused_adjoint_step(
        a1, a2, gc2, c2, u, jnp.float32(1.0), sz,
        sy.reshape(H, 1), sx.reshape(1, W), order=2, interpret=True)
    cr, gr = xla_ref(a1, a2, gc2, c2, u)
    # ulp-level, not array_equal: the adjoint tree's trailing mul-adds
    # (gc2 + lap·ē, core − a2·S) are FMA-contracted differently by XLA
    # per surrounding context (measured: even jit-vs-eager of the SAME
    # reference expression differs by 1-2 ulp on CPU), so bitwise equality
    # is not a property of the tree itself here.
    np.testing.assert_allclose(np.asarray(core), np.asarray(cr),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gc2n), np.asarray(gr),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("order", [4, 8])
def test_fused_adjoint_step_higher_orders(order):
    from jets_tpu.ops.pallas_wave import (adjoint_step_tile,
                                          fused_adjoint_step)

    if adjoint_step_tile(SHAPE, order) is None:
        pytest.skip("no feasible tile at this order")
    D, H, W = SHAPE
    keys = jax.random.split(jax.random.PRNGKey(12), 5)
    a1 = jax.random.normal(keys[0], SHAPE, jnp.float32)
    a2 = jax.random.normal(keys[1], SHAPE, jnp.float32)
    gc2 = jax.random.normal(keys[2], SHAPE, jnp.float32)
    c2 = jax.random.uniform(keys[3], SHAPE, jnp.float32) + 0.5
    u = jax.random.normal(keys[4], SHAPE, jnp.float32)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)

    @jax.jit
    def xla_ref(a1, a2, gc2, c2, u):
        S = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(1, 1, W)
        ebar = a1 * S
        gc2n = gc2 + laplacian_nd(u, order=order) * ebar
        core = (2.0 * ebar
                + laplacian_nd(c2 * ebar, order=order)) - a2 * S
        return core, gc2n

    core, gc2n = fused_adjoint_step(
        a1, a2, gc2, c2, u, jnp.float32(1.0), sz,
        sy.reshape(H, 1), sx.reshape(1, W), order=order, interpret=True)
    cr, gr = xla_ref(a1, a2, gc2, c2, u)
    np.testing.assert_allclose(np.asarray(core), np.asarray(cr),
                               rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(np.asarray(gc2n), np.asarray(gr),
                               rtol=2e-5, atol=2e-5)


def test_fused_adjoint_step_int8_decode():
    """int8 history decode in-register: q.astype(f32)·(s/127) matches the
    XLA dec tree exactly."""
    from jets_tpu.ops.pallas_wave import fused_adjoint_step

    D, H, W = SHAPE
    keys = jax.random.split(jax.random.PRNGKey(13), 5)
    a1 = jax.random.normal(keys[0], SHAPE, jnp.float32)
    a2 = jax.random.normal(keys[1], SHAPE, jnp.float32)
    gc2 = jnp.zeros(SHAPE, jnp.float32)
    c2 = jax.random.uniform(keys[3], SHAPE, jnp.float32) + 0.5
    u = jax.random.normal(keys[4], SHAPE, jnp.float32)
    s = jnp.max(jnp.abs(u))
    q = jnp.round(u * (127.0 / s)).astype(jnp.int8)
    sz = jnp.ones((D,), jnp.float32)
    sy = jnp.ones((H,), jnp.float32)
    sx = jnp.ones((W,), jnp.float32)

    @jax.jit
    def xla_ref(a1, a2, gc2, c2, q, s):
        u_dec = q.astype(jnp.float32) * (s / 127.0)
        ebar = a1
        gc2n = gc2 + laplacian_nd(u_dec, order=2) * ebar
        core = (2.0 * ebar + laplacian_nd(c2 * ebar, order=2)) - a2
        return core, gc2n

    core, gc2n = fused_adjoint_step(
        a1, a2, gc2, c2, q, s / 127.0, sz,
        sy.reshape(H, 1), sx.reshape(1, W), order=2, interpret=True)
    cr, gr = xla_ref(a1, a2, gc2, c2, q, s)
    # sponge = 1 exactly: ebar trees coincide up to ×1.0 (exact); the
    # remaining slack is XLA's context-dependent FMA contraction (see
    # test_fused_adjoint_step_bit_exact_order2)
    np.testing.assert_allclose(np.asarray(gc2n), np.asarray(gr),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(core), np.asarray(cr),
                               rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("store,tol",
                         [("f32", 2e-5), ("bf16", 2e-2), ("int8", 5e-2)])
def test_fused_stored_adjoint_matches_xla(store, tol):
    """The whole fused stored-adjoint sweep (fused forward history + fused
    reverse kernel + in-place receiver injection) matches the XLA
    stored-adjoint path at the same storage setting."""
    from jets_tpu.ops.wave import wave_propagator

    kw = dict(AKW, store_adjoint=store)
    Ff = wave_propagator(ASHAPE, fused=True, **kw)
    Fx = wave_propagator(ASHAPE, fused=False, **kw)
    c = jnp.full(ASHAPE, 1500.0, jnp.float32) + 20.0 * jax.random.normal(
        jax.random.PRNGKey(21), ASHAPE, jnp.float32)
    # physical cotangent (modeled residual), not white noise
    d = Fx(c * 1.02) - Fx(c)
    _assert_live(d)
    gf = np.asarray(Ff.linearize(c).H(d))
    gx = np.asarray(Fx.linearize(c).H(d))
    scale = float(np.max(np.abs(gx)))
    assert scale > 0.0, "vacuous: zero adjoint"
    np.testing.assert_allclose(gf / scale, gx / scale, rtol=0, atol=tol)


def test_fused_stored_adjoint_matches_autodiff_and_gate():
    """fused f32 stored adjoint ≈ reverse-mode autodiff through the scan,
    and the dot-product gate holds on the fused operator."""
    from jets_tpu.ops.wave import wave_propagator

    Fa = wave_propagator(ASHAPE, fused=False, **AKW)
    Fs = wave_propagator(ASHAPE, fused=True, store_adjoint="f32", **AKW)
    c = jnp.full(ASHAPE, 1500.0, jnp.float32)
    d = Fa.rng.randn(jax.random.PRNGKey(22)).astype(jnp.float32)
    ga = np.asarray(Fa.linearize(c).H(d))
    gs = np.asarray(Fs.linearize(c).H(d))
    scale = float(np.max(np.abs(ga)))
    assert scale > 0.0
    np.testing.assert_allclose(gs / scale, ga / scale, rtol=1e-5, atol=1e-5)

    J = Fs.linearize(c)
    m = J.dom.randn(jax.random.PRNGKey(23)).astype(jnp.float32)
    dd = J.rng.randn(jax.random.PRNGKey(24)).astype(jnp.float32)
    lhs, rhs = jt.dot_product_test(J, m, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)


def test_fused_stored_adjoint_odd_nt():
    """Odd nt exercises BOTH padding paths (forward wavelet pad + reverse
    dummy front step)."""
    from jets_tpu.ops.wave import wave_propagator

    kw = dict(AKW, nt=25, store_adjoint="f32")
    Ff = wave_propagator(ASHAPE, fused=True, **kw)
    Fx = wave_propagator(ASHAPE, fused=False, **kw)
    c = jnp.full(ASHAPE, 1500.0, jnp.float32)
    d = Fx(c * 1.02) - Fx(c)
    _assert_live(d)
    gf = np.asarray(Ff.linearize(c).H(d))
    gx = np.asarray(Fx.linearize(c).H(d))
    scale = float(np.max(np.abs(gx)))
    assert scale > 0.0
    np.testing.assert_allclose(gf / scale, gx / scale, rtol=0, atol=2e-5)


def test_fused_adjoint_gating():
    from jets_tpu.ops.pallas_wave import fits_adjoint_pallas
    from jets_tpu.ops.wave import wave_propagator

    assert fits_adjoint_pallas(ASHAPE, jnp.float32, 2, "int8")
    assert fits_adjoint_pallas(SHAPE, jnp.float32, 2, "f32")
    # H=8 is sublane-feasible for f32 histories but not bf16/int8
    assert not fits_adjoint_pallas(SHAPE, jnp.float32, 2, "int8")
    assert not fits_adjoint_pallas(SHAPE, jnp.float32, 2, "bf16")
    assert not fits_adjoint_pallas((16, 8, 100), jnp.float32, 2, "f32")
    with pytest.raises(ValueError, match="stored-adjoint"):
        wave_propagator(SHAPE, nt=4, fused=True, store_adjoint="int8")


def test_fused_tti_bf16_coeff_mode():
    """Reduced-precision TTI coefficient mode: fused(bf16 fields) must
    match the XLA path on the SAME rounded coefficients, the rounded
    physics must stay close to the f32 physics, and the θ=0 VTI reduction
    must stay exact (bf16 represents 0/1 exactly)."""
    from jets_tpu.ops.wave import tti_wave_propagator

    kw = dict(nt=30, dt=6e-4, dx=10.0, freq=16.0, src_idx=ASRC,
              rcv_idx=ARCV, sponge_width=3, dtype=jnp.float32)
    Ff = tti_wave_propagator(ASHAPE, fused=True,
                             coeff_dtype=jnp.bfloat16, **kw)
    Fx = tti_wave_propagator(ASHAPE, fused=False,
                             coeff_dtype=jnp.bfloat16, **kw)
    F32 = tti_wave_propagator(ASHAPE, fused=False, **kw)
    full = lambda v: jnp.full(ASHAPE, v, jnp.float32)  # noqa: E731
    m = (Ff.dom.zeros().setblock(0, full(1800.0)).setblock(1, full(0.1))
         .setblock(2, full(0.05)).setblock(3, full(0.2))
         .setblock(4, full(0.7)))
    df, dx_, d32 = Ff(m), Fx(m), F32(m)
    _assert_live(dx_)
    scale = float(jnp.max(jnp.abs(dx_))) or 1.0
    # fused vs XLA on identical rounded coefficients: tight
    np.testing.assert_allclose(np.asarray(df) / scale,
                               np.asarray(dx_) / scale, atol=5e-5)
    # rounded vs f32 physics: bf16 coefficient rounding only
    rel = float(jnp.linalg.norm(dx_ - d32) / (jnp.linalg.norm(d32) + 1e-30))
    assert rel < 3e-2, f"bf16 coefficient rounding too large: {rel}"
    assert rel > 0.0, "vacuous: coeff rounding changed nothing"

    J = Ff.linearize(m)
    mm = J.dom.randn(jax.random.PRNGKey(31))
    dd = J.rng.randn(jax.random.PRNGKey(32))
    lhs, rhs = jt.dot_product_test(J, mm, dd)
    np.testing.assert_allclose(float(lhs), float(rhs), rtol=2e-5)

    # ε = δ = θ = φ = 0: every coefficient is exactly 0 or 1, which bf16
    # represents exactly — the isotropic reduction must be unchanged by
    # the coefficient mode (bit-for-bit)
    m0 = m
    for b in (1, 2, 3, 4):
        m0 = m0.setblock(b, full(0.0))
    np.testing.assert_array_equal(np.asarray(Fx(m0)), np.asarray(F32(m0)))


def test_tti_bf16_coeff_validation():
    from jets_tpu.ops.wave import tti_wave_propagator

    with pytest.raises(ValueError, match="3-D only"):
        tti_wave_propagator((16, 16), coeff_dtype=jnp.bfloat16)
    with pytest.raises(ValueError, match="coeff_dtype"):
        tti_wave_propagator(ASHAPE, coeff_dtype=jnp.int8)
    # H=8 misses the bf16 (16,128) tile: fused+bf16 must refuse eagerly
    with pytest.raises(ValueError, match="fused TTI"):
        tti_wave_propagator(SHAPE, fused=True, coeff_dtype=jnp.bfloat16)


# ---------------------------------------------------------------------- #
# fused VTI adjoint (reverse-sweep) step — the anisotropic gradient path
# ---------------------------------------------------------------------- #


def test_fused_vti_adjoint_step_bit_exact_order2():
    from jets_tpu.ops.pallas_wave import fused_vti_adjoint_step
    from jets_tpu.ops.wave import _d2_axis

    D, H, W = SHAPE
    keys = jax.random.split(jax.random.PRNGKey(31), 12)
    ap1, aq1, ap2, aq2 = (jax.random.normal(keys[k], SHAPE, jnp.float32)
                          for k in range(4))
    gC, gah, gav = (jax.random.normal(keys[4 + k], SHAPE, jnp.float32)
                    for k in range(3))
    C = jax.random.uniform(keys[7], SHAPE, jnp.float32) + 0.5
    av = jax.random.uniform(keys[8], SHAPE, jnp.float32) + 1.0
    ah = jax.random.uniform(keys[9], SHAPE, jnp.float32) + 1.0
    p = jax.random.normal(keys[10], SHAPE, jnp.float32)
    q = jax.random.normal(keys[11], SHAPE, jnp.float32)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    inv_dx2 = jnp.float32(0.01)

    @jax.jit
    def xla_ref(ap1, aq1, ap2, aq2, gC, gah, gav, C, av, ah, p, q):
        S = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(1, 1, W)
        ebp, ebq = ap1 * S, aq1 * S
        ebp1, ebq1 = ap2 * S, aq2 * S

        def Lh(u):
            return (_d2_axis(u, 1, inv_dx2, 2)
                    + _d2_axis(u, 2, inv_dx2, 2))

        def Dz(u):
            return _d2_axis(u, 0, inv_dx2, 2)

        lh_k, dzz_k = Lh(p), Dz(q)
        gCn = gC + ((ah * lh_k + av * dzz_k) * ebp
                    + (av * lh_k + dzz_k) * ebq)
        gahn = gah + (C * lh_k) * ebp
        gavn = gav + C * (dzz_k * ebp + lh_k * ebq)
        ap = (2.0 * ebp + Lh(C * ah * ebp) + Lh(C * av * ebq)) - ebp1
        aq = (2.0 * ebq + Dz(C * av * ebp) + Dz(C * ebq)) - ebq1
        return ap, aq, gCn, gahn, gavn

    out = fused_vti_adjoint_step(
        ap1, aq1, ap2, aq2, gC, gah, gav, C, av, ah, p, q,
        jnp.float32(1.0), jnp.float32(1.0), inv_dx2, sz,
        sy.reshape(H, 1), sx.reshape(1, W), order=2, interpret=True)
    ref = xla_ref(ap1, aq1, ap2, aq2, gC, gah, gav, C, av, ah, p, q)
    # ulp-level, not array_equal: trailing mul-adds FMA-contract
    # differently per context (see test_fused_adjoint_step_bit_exact)
    for got, want in zip(out, ref):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-6, atol=1e-5)


@pytest.mark.parametrize("store,tol",
                         [("f32", 2e-5), ("bf16", 2e-2), ("int8", 5e-2)])
def test_fused_vti_stored_adjoint_matches_xla(store, tol):
    """Whole fused VTI stored-adjoint sweep (fused forward history + fused
    reverse kernel + injection) vs the XLA stored path, per model block."""
    from jets_tpu.ops.wave import vti_wave_propagator

    kw = dict(AKW, store_adjoint=store)
    Ff = vti_wave_propagator(ASHAPE, fused=True, **kw)
    Fx = vti_wave_propagator(ASHAPE, fused=False, **kw)

    def model(F):
        full = lambda v: jnp.full(ASHAPE, v, jnp.float32)  # noqa: E731
        return (F.dom.zeros().setblock(0, full(1500.0))
                .setblock(1, full(0.1)).setblock(2, full(0.05)))

    m0 = model(Fx)
    d = Fx(m0.setblock(0, jnp.full(ASHAPE, 1530.0, jnp.float32))) - Fx(m0)
    _assert_live(d)
    gf = Ff.linearize(m0).H(d)
    gx = Fx.linearize(m0).H(d)
    for b in range(3):
        f = np.asarray(gf.getblock(b))
        x = np.asarray(gx.getblock(b))
        scale = float(np.max(np.abs(x)))
        assert scale > 0.0, f"vacuous: zero adjoint block {b}"
        np.testing.assert_allclose(f / scale, x / scale, rtol=0, atol=tol)


def test_fused_vti_stored_adjoint_odd_nt_and_gating():
    from jets_tpu.ops.pallas_wave import fits_vti_adjoint_pallas
    from jets_tpu.ops.wave import vti_wave_propagator

    kw = dict(AKW, nt=25, store_adjoint="f32")
    Ff = vti_wave_propagator(ASHAPE, fused=True, **kw)
    Fx = vti_wave_propagator(ASHAPE, fused=False, **kw)
    full = lambda v: jnp.full(ASHAPE, v, jnp.float32)  # noqa: E731
    m0 = (Fx.dom.zeros().setblock(0, full(1500.0))
          .setblock(1, full(0.1)).setblock(2, full(0.05)))
    d = Fx(m0.setblock(0, full(1530.0))) - Fx(m0)
    _assert_live(d)
    gf = Ff.linearize(m0).H(d)
    gx = Fx.linearize(m0).H(d)
    for b in range(3):
        f = np.asarray(gf.getblock(b))
        x = np.asarray(gx.getblock(b))
        scale = float(np.max(np.abs(x)))
        assert scale > 0.0
        np.testing.assert_allclose(f / scale, x / scale, rtol=0, atol=2e-5)

    assert fits_vti_adjoint_pallas(ASHAPE, jnp.float32, 2, "int8")
    # H=8 feasible for f32 histories but not bf16/int8
    assert fits_vti_adjoint_pallas(SHAPE, jnp.float32, 2, "f32")
    assert not fits_vti_adjoint_pallas(SHAPE, jnp.float32, 2, "int8")
    with pytest.raises(ValueError, match="stored-adjoint"):
        vti_wave_propagator(SHAPE, nt=4, fused=True, store_adjoint="int8")


# ---------------------------------------------------------------------- #
# fused TTI adjoint (reverse-sweep) step — the production gradient path
# ---------------------------------------------------------------------- #


def test_fused_tti_adjoint_step_bit_exact_order2():
    from jets_tpu.ops.pallas_wave import fused_tti_adjoint_step
    from jets_tpu.ops.wave import _d1_axis, _d2_axis

    D, H, W = SHAPE
    keys = jax.random.split(jax.random.PRNGKey(41), 17)
    ap1, aq1, ap2, aq2 = (jax.random.normal(keys[k], SHAPE, jnp.float32)
                          for k in range(4))
    accs = tuple(jax.random.normal(keys[4 + k], SHAPE, jnp.float32)
                 for k in range(6))
    C = jax.random.uniform(keys[10], SHAPE, jnp.float32) + 0.5
    ah = jax.random.uniform(keys[11], SHAPE, jnp.float32) + 1.0
    av = jax.random.uniform(keys[12], SHAPE, jnp.float32) + 1.0
    th = 0.4 * jax.random.normal(keys[13], SHAPE, jnp.float32)
    phi = jax.random.normal(keys[14], SHAPE, jnp.float32)
    nz = jnp.cos(th)
    ny = jnp.sin(th) * jnp.cos(phi)
    nx = jnp.sin(th) * jnp.sin(phi)
    p = jax.random.normal(keys[15], SHAPE, jnp.float32)
    q = jax.random.normal(keys[16], SHAPE, jnp.float32)
    sz = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
    sy = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32)
    sx = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32)
    inv_dx2 = jnp.float32(0.01)
    inv_dx = jnp.float32(0.1)

    czz, cyy, cxx = nz * nz, ny * ny, nx * nx
    czy, czx, cyx = 2.0 * nz * ny, 2.0 * nz * nx, 2.0 * ny * nx

    def _dij(u, i, j):
        return _d1_axis(_d1_axis(u, i, inv_dx, 2), j, inv_dx, 2)

    def derivs(u):
        return (_d2_axis(u, 0, inv_dx2, 2), _d2_axis(u, 1, inv_dx2, 2),
                _d2_axis(u, 2, inv_dx2, 2),
                _dij(u, 0, 1), _dij(u, 0, 2), _dij(u, 1, 2))

    def HT(w):
        return (_d2_axis((1.0 - czz) * w, 0, inv_dx2, 2)
                + _d2_axis((1.0 - cyy) * w, 1, inv_dx2, 2)
                + _d2_axis((1.0 - cxx) * w, 2, inv_dx2, 2)
                - _dij(czy * w, 0, 1) - _dij(czx * w, 0, 2)
                - _dij(cyx * w, 1, 2))

    def VT(w):
        return (_d2_axis(czz * w, 0, inv_dx2, 2)
                + _d2_axis(cyy * w, 1, inv_dx2, 2)
                + _d2_axis(cxx * w, 2, inv_dx2, 2)
                + _dij(czy * w, 0, 1) + _dij(czx * w, 0, 2)
                + _dij(cyx * w, 1, 2))

    @jax.jit
    def xla_ref(ap1, aq1, ap2, aq2, accs, p, q):
        gC, gah, gav, gnz, gny, gnx = accs
        S = (sz[:, None, None] * sy[None, :, None]) * sx.reshape(1, 1, W)
        ebp, ebq = ap1 * S, aq1 * S
        ebp1, ebq1 = ap2 * S, aq2 * S
        dp6, dq6 = derivs(p), derivs(q)
        Hp = ((1.0 - czz) * dp6[0] + (1.0 - cyy) * dp6[1]
              + (1.0 - cxx) * dp6[2]
              - czy * dp6[3] - czx * dp6[4] - cyx * dp6[5])
        Vq = (czz * dq6[0] + cyy * dq6[1] + cxx * dq6[2]
              + czy * dq6[3] + czx * dq6[4] + cyx * dq6[5])
        gC = gC + ((ah * Hp + av * Vq) * ebp + (av * Hp + Vq) * ebq)
        gah_ = gah + (C * Hp) * ebp
        gav_ = gav + C * (Vq * ebp + Hp * ebq)
        dz_c = [C * ((av * q_d - ah * p_d) * ebp + (q_d - av * p_d) * ebq)
                for p_d, q_d in zip(dp6, dq6)]
        dczz, dcyy, dcxx, dczy, dczx, dcyx = dz_c
        gnz_ = gnz + (2.0 * nz * dczz + 2.0 * ny * dczy + 2.0 * nx * dczx)
        gny_ = gny + (2.0 * ny * dcyy + 2.0 * nz * dczy + 2.0 * nx * dcyx)
        gnx_ = gnx + (2.0 * nx * dcxx + 2.0 * nz * dczx + 2.0 * ny * dcyx)
        ap = (2.0 * ebp + HT(C * ah * ebp + C * av * ebq)) - ebp1
        aq = (2.0 * ebq + VT(C * av * ebp + C * ebq)) - ebq1
        return ap, aq, gC, gah_, gav_, gnz_, gny_, gnx_

    out = fused_tti_adjoint_step(
        ap1, aq1, ap2, aq2, *accs, C, ah, av, nz, ny, nx, p, q,
        jnp.float32(1.0), jnp.float32(1.0), inv_dx2, inv_dx, sz,
        sy.reshape(H, 1), sx.reshape(1, W), order=2, interpret=True)
    ref = xla_ref(ap1, aq1, ap2, aq2, accs, p, q)
    for k, (got, want) in enumerate(zip(out, ref)):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=2e-5, err_msg=f"out {k}")


def _tti_model(F, shape):
    full = lambda v: jnp.full(shape, v, jnp.float32)  # noqa: E731
    m = F.dom.zeros()
    for b, v in enumerate((1500.0, 0.1, 0.05, 0.2, 0.7)):
        m = m.setblock(b, full(v))
    return m


@pytest.mark.parametrize("store,tol",
                         [("f32", 5e-5), ("bf16", 2e-2), ("int8", 5e-2)])
def test_fused_tti_stored_adjoint_matches_xla(store, tol):
    """Whole fused TTI stored-adjoint sweep vs the XLA stored path, per
    model block (all five parameters incl. tilt and azimuth)."""
    from jets_tpu.ops.wave import tti_wave_propagator

    kw = dict(AKW, store_adjoint=store)
    Ff = tti_wave_propagator(ASHAPE, fused=True, **kw)
    Fx = tti_wave_propagator(ASHAPE, fused=False, **kw)
    m0 = _tti_model(Fx, ASHAPE)
    d = Fx(m0.setblock(0, jnp.full(ASHAPE, 1530.0, jnp.float32))) - Fx(m0)
    _assert_live(d)
    gf = Ff.linearize(m0).H(d)
    gx = Fx.linearize(m0).H(d)
    for b in range(5):
        f = np.asarray(gf.getblock(b))
        x = np.asarray(gx.getblock(b))
        scale = float(np.max(np.abs(x)))
        assert scale > 0.0, f"vacuous: zero adjoint block {b}"
        np.testing.assert_allclose(f / scale, x / scale, rtol=0, atol=tol)


def test_fused_tti_stored_adjoint_bf16_coeff_and_odd_nt():
    """bf16-coefficient fused reverse matches the XLA stored sweep on the
    same rounded coefficients; odd nt exercises both padding paths."""
    from jets_tpu.ops.pallas_wave import fits_tti_adjoint_pallas
    from jets_tpu.ops.wave import tti_wave_propagator

    kw = dict(AKW, nt=25, store_adjoint="f32",
              coeff_dtype=jnp.bfloat16)
    Ff = tti_wave_propagator(ASHAPE, fused=True, **kw)
    Fx = tti_wave_propagator(ASHAPE, fused=False, **kw)
    m0 = _tti_model(Fx, ASHAPE)
    d = Fx(m0.setblock(0, jnp.full(ASHAPE, 1530.0, jnp.float32))) - Fx(m0)
    _assert_live(d)
    gf = Ff.linearize(m0).H(d)
    gx = Fx.linearize(m0).H(d)
    for b in range(5):
        f = np.asarray(gf.getblock(b))
        x = np.asarray(gx.getblock(b))
        scale = float(np.max(np.abs(x)))
        assert scale > 0.0
        np.testing.assert_allclose(f / scale, x / scale, rtol=0, atol=5e-5)

    assert fits_tti_adjoint_pallas(ASHAPE, jnp.float32, 2, "int8")
    assert not fits_tti_adjoint_pallas(SHAPE, jnp.float32, 2, "int8")
    with pytest.raises(ValueError, match="stored-adjoint"):
        tti_wave_propagator(SHAPE, nt=4, fused=True, store_adjoint="int8")
