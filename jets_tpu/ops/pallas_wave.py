"""Fused Pallas TPU kernel for the 3-D leapfrog wave step.

In the HBM-bound 3-D regime (256³ f32) the XLA scan body does NOT fuse the
Laplacian into the leapfrog update: the measured step (614 µs after the
round-3 in-register sponge/source rewrite) implies ~7.5 full-grid HBM
touches — a separate stencil pass (read u, write lap), the update pass
(read lap/u/u_prev/c², write u_next), plus the while-loop carry rotation.
The minimum for the physics is FOUR touches: read ``u`` (stencilled),
``u_prev``, ``c²dt²``, write ``u_next``. This kernel does exactly that —
one slab-pipelined pass reusing the double-buffered DMA ring of
``pallas_solver._lap3d_kernel`` (guide: /opt/skills/guides/pallas_guide.md),
with the leapfrog update, the per-axis sponge product and the in-register
iota source mask fused into the stencil's epilogue, and ``u_prev`` aliased
in place to ``u_next``. Measured inside the real propagator scan on TPU
v5e (256³ f32, marginal over two nt budgets): **420 µs/step = 1.46× the
XLA step** — but ONLY with the scan body paired two-steps-per-iteration
(``ops/wave.py``): unpaired, the carry rotation forced copies around the
aliased kernel and the same kernel LOST to XLA (728 µs). Always measure
in the loop.

Bit-exactness contract (gated by ``tests/test_pallas_wave.py``): the kernel
reproduces the EXACT floating-point operation tree of the XLA step in
``ops/wave.py::_propagate``::

    lap    = laplacian_nd add order          (ops/stencil.py:91-128)
    e      = (2·u − u_prev) + c²dt²·lap
    u_next = e·((sz·sy)·sx) + s_t·mask       (mask = amp one-hot at src)

so the fused and XLA paths are interchangeable mid-solve. The sponge enters
as the precomputed ``szy = sz⊗sy`` plane and ``sx`` row — ``szy·sx`` is the
same multiplication tree as ``_mul_sponge``'s ``(sz·sy)·sx``.

Differentiation: the kernel is wrapped in ``jax.custom_jvp`` inside
``ops/wave.py`` (tangent = the XLA leapfrog expression, which JAX also
transposes for the adjoint), so FWI gradients are untouched; only the
nonlinear forward rides the fused kernel.

Reference parity: this is the TPU equivalent of JetPackWaveFD's hand-tuned
C++ propagator kernels (the reference family's compute core; Jets.jl itself
is pure calculus, ``src/Jets.jl:1-1293``).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .stencil import _D2_COEFFS

__all__ = [
    "fused_leapfrog_step", "wave_step_tile", "fits_wave_pallas",
    "fused_vti_step", "vti_step_tile", "fits_vti_pallas",
    "fused_tti_step", "tti_step_tile", "fits_tti_pallas",
    "fused_q_step", "q_step_tile", "fits_q_pallas",
    "fused_adjoint_step", "adjoint_step_tile", "fits_adjoint_pallas",
    "fused_vti_adjoint_step", "vti_adjoint_step_tile",
    "fits_vti_adjoint_pallas",
    "fused_tti_adjoint_step", "tti_adjoint_step_tile",
    "fits_tti_adjoint_pallas",
]


def _ring_io(hbm, scr, sems, *, T, hw, nsl, H, W):
    """Double-buffered slab DMA ring with zero-filled halos at the grid
    top/bottom — the shared ring of every slab-pipelined kernel in this
    module, factored out for the multi-ring adjoint kernels. Returns
    ``(start, wait)`` taking ``(j, slot)``."""
    P = T + 2 * hw

    def center(j, sl):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T, T)],
            scr.at[pl.ds(sl * P + hw, T)], sems.at[sl, 0])

    def front(j, sl):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T - hw, hw)],
            scr.at[pl.ds(sl * P, hw)], sems.at[sl, 1])

    def back(j, sl):
        return pltpu.make_async_copy(
            hbm.at[pl.ds(j * T + T, hw)],
            scr.at[pl.ds(sl * P + hw + T, hw)], sems.at[sl, 2])

    def start(j, sl):
        center(j, sl).start()

        @pl.when(j > 0)
        def _():
            front(j, sl).start()

        @pl.when(j < nsl - 1)
        def _():
            back(j, sl).start()

    def wait(j, sl):
        center(j, sl).wait()

        @pl.when(j > 0)
        def _():
            front(j, sl).wait()

        @pl.when(j == 0)
        def _():
            scr[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scr.dtype)

        @pl.when(j < nsl - 1)
        def _():
            back(j, sl).wait()

        @pl.when(j == nsl - 1)
        def _():
            scr[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                (hw, H, W), scr.dtype)

    return start, wait


def _wave_kernel(scal_ref, idx_ref, spz_ref, sy_blk, sx_blk, up_blk, c2_blk,
                 u_hbm, out_blk, scratch, sems, *, T, D, H, W, order):
    """One (T,H,W) slab of ``u_next``; ``u`` streamed via the DMA ring."""
    c0, cs = _D2_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw  # slab + hw halo slices per side

    def center_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T, T)],
            scratch.at[pl.ds(sl * P + hw, T)],
            sems.at[sl, 0],
        )

    def front_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T - hw, hw)],
            scratch.at[pl.ds(sl * P, hw)],
            sems.at[sl, 1],
        )

    def back_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T + T, hw)],
            scratch.at[pl.ds(sl * P + hw + T, hw)],
            sems.at[sl, 2],
        )

    def start_slab(j, sl):
        center_dma(j, sl).start()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).start()

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).start()

    def wait_slab(j, sl):
        center_dma(j, sl).wait()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).wait()

        @pl.when(j == 0)
        def _():
            scratch[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scratch.dtype)

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).wait()

        @pl.when(j == nsl - 1)
        def _():
            scratch[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                (hw, H, W), scratch.dtype
            )

    @pl.when(i == 0)
    def _():
        start_slab(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        start_slab(i + 1, nslot)  # one slab of prefetch

    wait_slab(i, slot)

    base = slot * P
    c = scratch[pl.ds(base + hw, T)]
    # EXACT add order of ops/stencil.laplacian_nd: (c0·nd)·c, then per axis
    # (z,y,x) per tap s=1..hw: "+ lo + hi" when the coefficient is 1.0,
    # "+ coef·(lo+hi)" otherwise (the bit-exactness contract).
    lap = (c0 * 3.0) * c
    for s, coef in enumerate(cs, start=1):
        zlo = scratch[pl.ds(base + hw - s, T)]
        zhi = scratch[pl.ds(base + hw + s, T)]
        if coef == 1.0:
            lap = lap + zlo + zhi
        else:
            lap = lap + coef * (zlo + zhi)
    for s, coef in enumerate(cs, start=1):
        ylo = jnp.pad(c[:, :-s, :], ((0, 0), (s, 0), (0, 0)))
        yhi = jnp.pad(c[:, s:, :], ((0, 0), (0, s), (0, 0)))
        if coef == 1.0:
            lap = lap + ylo + yhi
        else:
            lap = lap + coef * (ylo + yhi)
    for s, coef in enumerate(cs, start=1):
        xlo = jnp.pad(c[:, :, :-s], ((0, 0), (0, 0), (s, 0)))
        xhi = jnp.pad(c[:, :, s:], ((0, 0), (0, 0), (0, s)))
        if coef == 1.0:
            lap = lap + xlo + xhi
        else:
            lap = lap + coef * (xlo + xhi)

    e = (2.0 * c - up_blk[...]) + c2_blk[...] * lap
    # sponge: e·((sz·sy)·sx) — sz comes from SMEM as T scalars stacked to a
    # (T,1,1) column (a (T,H) VMEM block would break the (8,128) tiling
    # rule for small T, and a dynamic sublane slice of a resident (D,H)
    # plane needs an 8-aligned start Mosaic can't prove for T=4); sy is
    # (H,1) so the (sz·sy)·sx product broadcasts into the block with no
    # relayout. The scalar tree matches _mul_sponge exactly.
    s_t = scal_ref[0]
    amp = scal_ref[1]
    # in-register one-hot source, per slice: flat = (z·H + y)·W + x
    iy = lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    yx = iy * W + ix
    for t in range(T):
        plane = (spz_ref[i * T + t] * sy_blk[...]) * sx_blk[...]
        flat_t = (i * T + t) * (H * W) + yx
        mask_t = jnp.where(flat_t == idx_ref[0], amp, jnp.zeros_like(amp))
        out_blk[pl.ds(t, 1)] = e[t:t + 1] * plane[None] + s_t * mask_t


def wave_step_tile(shape, order: int, itemsize: int = 4):
    """Largest z tile: DMA ring 2·(T+2·hw) slices + 3 blocked grid arrays
    double-buffered (6·T) within ~12 MB of VMEM; T must cover the halo."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        vmem = (2 * (t + 2 * hw) + 6 * t) * H * W * itemsize
        if vmem <= 12 * 2**20:
            return t
    return None


def fits_wave_pallas(shape, dtype, order: int) -> bool:
    """True when the fused step applies: 3-D f32 grid, lane/sublane-aligned
    minor dims, VMEM-feasible z tile covering the stencil halo."""
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    return wave_step_tile(shape, order) is not None


def fused_leapfrog_step(u_prev, u, c2dt2, spz, sy, sx, s_t, src_idx, amp, *,
                        order: int = 2, interpret: bool = False):
    """``u_next = ((2u − u_prev) + c²dt²·lap(u))·((sz·sy)·sx) + s_t·mask``
    in ONE slab-pipelined HBM pass (4 grid touches; ``u_prev`` aliased in
    place to ``u_next``). ``spz``/``sy``/``sx`` are the per-axis sponge
    factors shaped ``(D,)`` (SMEM), ``(H, 1)`` and ``(1, W)``; ``src_idx``
    is the flat source index, ``amp`` the injection amplitude (``dt²`` for
    the isotropic propagator). Raw kernel — no autodiff rules;
    ``ops/wave.py`` wraps it in ``custom_jvp``."""
    D, H, W = u.shape
    T = wave_step_tile(u.shape, order, u.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {u.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, u.dtype), jnp.asarray(amp, u.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_wave_kernel, T=T, D=D, H=H, W=W, order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec,
            vspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((D, H, W), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), u.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        # u_prev is consumed by this step: write u_next into its buffer
        # (safe: each block is read before its output block is stored;
        # skipped in interpret mode where eager aliasing clobbers)
        input_output_aliases={} if interpret else {5: 0},
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, u_prev, c2dt2, u)


# ---------------------------------------------------------------------------
# Fused VTI coupled step — the pseudo-acoustic two-field system
# (ops/wave.py::_propagate_vti). XLA leaves the 4-carry coupled body
# heavily de-fused (measured 2403 µs/step on 256³ f32 vs a ~740 µs 9-touch
# roofline: reads p, q, p_prev, q_prev, c²dt², 1+2ε, √(1+2δ); writes
# p_next, q_next). This kernel does the whole coupled update in ONE pass:
# p streams as blocked VMEM (its stencil is HORIZONTAL-only — no z halo),
# q through the DMA ring (its stencil is vertical-only), both prev fields
# aliased in place to the outputs.
# ---------------------------------------------------------------------------


def _vti_kernel(scal_ref, idx_ref, spz_ref, sy_blk, sx_blk, pp_blk, p_blk,
                qp_blk, c2_blk, ah_blk, av_blk, q_hbm, po_blk, qo_blk,
                *rest, T, D, H, W, order, hist=None):
    if hist is not None:
        penc_blk, qenc_blk, pmax_ref, qmax_ref, scratch, sems = rest
    else:
        scratch, sems = rest
    c0, cs = _D2_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    def center_dma(j, sl):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(j * T, T)],
            scratch.at[pl.ds(sl * P + hw, T)], sems.at[sl, 0])

    def front_dma(j, sl):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(j * T - hw, hw)],
            scratch.at[pl.ds(sl * P, hw)], sems.at[sl, 1])

    def back_dma(j, sl):
        return pltpu.make_async_copy(
            q_hbm.at[pl.ds(j * T + T, hw)],
            scratch.at[pl.ds(sl * P + hw + T, hw)], sems.at[sl, 2])

    def start_slab(j, sl):
        center_dma(j, sl).start()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).start()

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).start()

    def wait_slab(j, sl):
        center_dma(j, sl).wait()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).wait()

        @pl.when(j == 0)
        def _():
            scratch[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scratch.dtype)

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).wait()

        @pl.when(j == nsl - 1)
        def _():
            scratch[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                (hw, H, W), scratch.dtype)

    @pl.when(i == 0)
    def _():
        start_slab(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        start_slab(i + 1, nslot)

    wait_slab(i, slot)

    inv_dx2 = scal_ref[2]
    base = slot * P
    qc = scratch[pl.ds(base + hw, T)]
    # EXACT _d2_axis tree: out = c0·x; out = out + c·(lo+hi); out·inv_dx2
    dzz = c0 * qc
    for s, coef in enumerate(cs, start=1):
        zlo = scratch[pl.ds(base + hw - s, T)]
        zhi = scratch[pl.ds(base + hw + s, T)]
        dzz = dzz + coef * (zlo + zhi)
    dzz = dzz * inv_dx2

    p = p_blk[...]
    d2y = c0 * p
    for s, coef in enumerate(cs, start=1):
        ylo = jnp.pad(p[:, :-s, :], ((0, 0), (s, 0), (0, 0)))
        yhi = jnp.pad(p[:, s:, :], ((0, 0), (0, s), (0, 0)))
        d2y = d2y + coef * (ylo + yhi)
    d2y = d2y * inv_dx2
    d2x = c0 * p
    for s, coef in enumerate(cs, start=1):
        xlo = jnp.pad(p[:, :, :-s], ((0, 0), (0, 0), (s, 0)))
        xhi = jnp.pad(p[:, :, s:], ((0, 0), (0, 0), (0, s)))
        d2x = d2x + coef * (xlo + xhi)
    d2x = d2x * inv_dx2
    lh = d2y + d2x  # matches: d2(p,1) + d2(p,2)

    c2 = c2_blk[...]
    ah = ah_blk[...]
    av = av_blk[...]
    e_p = 2.0 * p - pp_blk[...] + c2 * (ah * lh + av * dzz)
    e_q = 2.0 * qc - qp_blk[...] + c2 * (av * lh + dzz)

    s_t = scal_ref[0]
    amp = scal_ref[1]
    iy = lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    yx = iy * W + ix
    m_p = jnp.float32(0.0)
    m_q = jnp.float32(0.0)
    for t in range(T):
        plane = (spz_ref[i * T + t] * sy_blk[...]) * sx_blk[...]
        flat_t = (i * T + t) * (H * W) + yx
        mask_t = jnp.where(flat_t == idx_ref[0], amp, jnp.zeros_like(amp))
        val_p = e_p[t:t + 1] * plane[None] + s_t * mask_t
        val_q = e_q[t:t + 1] * plane[None] + s_t * mask_t
        po_blk[pl.ds(t, 1)] = val_p
        qo_blk[pl.ds(t, 1)] = val_q
        if hist is not None:
            m_p = jnp.maximum(m_p, jnp.max(jnp.abs(val_p)))
            m_q = jnp.maximum(m_q, jnp.max(jnp.abs(val_q)))
    if hist is not None:
        # encode the INPUT fields p_k (blocked) / q_k (ring center) with
        # the deferred scales from SMEM — exact XLA enc trees
        pmax_ref[i] = m_p
        qmax_ref[i] = m_q
        if hist == "int8":
            penc_blk[...] = jnp.round(p * scal_ref[3]).astype(jnp.int8)
            qenc_blk[...] = jnp.round(qc * scal_ref[4]).astype(jnp.int8)
        elif hist == "bf16":
            penc_blk[...] = p.astype(jnp.bfloat16)
            qenc_blk[...] = qc.astype(jnp.bfloat16)
        else:
            penc_blk[...] = p
            qenc_blk[...] = qc


# swept in-loop at 256³ (r4): T=2 → 970 µs, T=4 (budget 20/limit 32) →
# 1080 µs — the bigger tile LOSES here (the q-only ring keeps T=2's DMA
# overhead low and the larger working set hurts); keep the 16 MB default.
_VTI_VMEM_BUDGET = 12 * 2**20
_VTI_VMEM_LIMIT = 16 * 2**20


def vti_step_tile(shape, order: int, itemsize: int = 4):
    """8 blocked grid arrays double-buffered (16·T) + the q DMA ring."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        vmem = (2 * (t + 2 * hw) + 16 * t) * H * W * itemsize
        if vmem <= _VTI_VMEM_BUDGET:
            return t
    return None


def fits_vti_pallas(shape, dtype, order: int) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    return vti_step_tile(shape, order) is not None


def fused_vti_step(p_prev, p, q_prev, q, c2dt2, ah, av, spz, sy, sx,
                   inv_dx2, s_t, src_idx, amp, *, order: int = 2,
                   interpret: bool = False):
    """One coupled VTI leapfrog step in a single slab-pipelined pass
    (9 grid touches — the physics minimum); returns ``(p_next, q_next)``
    with ``p_prev``/``q_prev`` aliased in place. Raw kernel; ``ops/wave.py``
    wraps it in ``custom_jvp``."""
    D, H, W = p.shape
    T = vti_step_tile(p.shape, order, p.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {p.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, p.dtype), jnp.asarray(amp, p.dtype),
                      jnp.asarray(inv_dx2, p.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vti_kernel, T=T, D=D, H=H, W=W, order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((D, H, W), p.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {5: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VTI_VMEM_LIMIT),
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, p_prev, p, q_prev, c2dt2, ah, av, q)


def fused_vti_hist_step(p_prev, p, q_prev, q, c2dt2, ah, av, spz, sy, sx,
                        inv_dx2, s_t, src_idx, amp, qfp, qfq, *,
                        store: str = "int8", order: int = 2,
                        interpret: bool = False):
    """:func:`fused_vti_step` + in-kernel two-field history encoding (the
    stored-adjoint forward sweep). Returns ``(p_next, q_next, p_enc,
    q_enc, pmax, qmax)`` — encoded snapshots of the INPUT fields
    (quantized by the deferred ``qfp/qfq = 127/scale``) and per-slab
    ``max|·_next|`` partials for the NEXT step's scales. Same aliasing as
    the plain step."""
    D, H, W = p.shape
    T = vti_step_tile(p.shape, order, p.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {p.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, p.dtype), jnp.asarray(amp, p.dtype),
                      jnp.asarray(inv_dx2, p.dtype),
                      jnp.asarray(qfp, p.dtype), jnp.asarray(qfq, p.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    sdt = _STORE_DTYPES[store]
    return pl.pallas_call(
        functools.partial(_vti_kernel, T=T, D=D, H=H, W=W, order=order,
                          hist=store),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((D, H, W), p.dtype)] * 2
        + [jax.ShapeDtypeStruct((D, H, W), sdt)] * 2
        + [jax.ShapeDtypeStruct((D // T,), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {5: 0, 7: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VTI_VMEM_LIMIT),
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, p_prev, p, q_prev, c2dt2, ah, av, q)


# ---------------------------------------------------------------------------
# Fused 3-D TTI coupled step — tilted-TI pseudo-acoustics with azimuth
# (ops/wave.py::_propagate_tti3d). This is the most HBM-hostile step in the
# pack: each field needs SIX second derivatives (zz, yy, xx and the three
# cross terms ∂zy/∂zx/∂yx as composed central first differences), and XLA
# materializes the intermediate first-derivative fields — the measured XLA
# body runs far above the physics roofline. The kernel computes everything
# for one slab in-register from TWO DMA rings (p and q both carry z halos
# here, unlike VTI where only q does): reads p, q (stencilled), p_prev,
# q_prev, c²dt², 1+2ε, √(1+2δ) and the symmetry-axis components
# (nz, ny, nx); writes p_next, q_next with both prev fields aliased in
# place — 12 grid touches per step, the physics minimum for this
# parameterization. The six direction coefficients (nᵢ², 2nᵢnⱼ) are
# recomputed in-register from the axis fields (3 reads instead of 6;
# float32 products are bitwise equal to the precomputed fields the XLA
# path closes over).
#
# Bit-exactness contract (gated by tests/test_pallas_wave.py): at order 2
# the kernel reproduces the exact floating-point trees of
# ``_d2_axis``/``_d1_axis``/``_HV`` in ops/wave.py, so the fused and XLA
# TTI paths are interchangeable mid-solve.
# ---------------------------------------------------------------------------


def _tti_kernel(scal_ref, idx_ref, spz_ref, sy_blk, sx_blk, pp_blk, qp_blk,
                c2_blk, ah_blk, av_blk, nz_blk, ny_blk, nx_blk, p_hbm, q_hbm,
                po_blk, qo_blk, *rest, T, D, H, W, order, hist=None):
    if hist is not None:
        (penc_blk, qenc_blk, pmax_ref, qmax_ref,
         pscr, qscr, psems, qsems) = rest
    else:
        pscr, qscr, psems, qsems = rest
    from .wave import _D1_COEFFS  # first-derivative taps (wave.py owns them)

    c0, cs = _D2_COEFFS[order]
    c1s = _D1_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    def ring(hbm, scr, sems):
        """Double-buffered slab DMA ring with zero-filled halos at the grid
        top/bottom — the same ring as ``_wave_kernel``/``_vti_kernel``,
        instantiated once per streamed field."""
        def center(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T, T)],
                scr.at[pl.ds(sl * P + hw, T)], sems.at[sl, 0])

        def front(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T - hw, hw)],
                scr.at[pl.ds(sl * P, hw)], sems.at[sl, 1])

        def back(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T + T, hw)],
                scr.at[pl.ds(sl * P + hw + T, hw)], sems.at[sl, 2])

        def start(j, sl):
            center(j, sl).start()

            @pl.when(j > 0)
            def _():
                front(j, sl).start()

            @pl.when(j < nsl - 1)
            def _():
                back(j, sl).start()

        def wait(j, sl):
            center(j, sl).wait()

            @pl.when(j > 0)
            def _():
                front(j, sl).wait()

            @pl.when(j == 0)
            def _():
                scr[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scr.dtype)

            @pl.when(j < nsl - 1)
            def _():
                back(j, sl).wait()

            @pl.when(j == nsl - 1)
            def _():
                scr[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                    (hw, H, W), scr.dtype)

        return start, wait

    pstart, pwait = ring(p_hbm, pscr, psems)
    qstart, qwait = ring(q_hbm, qscr, qsems)

    @pl.when(i == 0)
    def _():
        pstart(0, 0)
        qstart(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        pstart(i + 1, nslot)
        qstart(i + 1, nslot)

    pwait(i, slot)
    qwait(i, slot)

    inv_dx2 = scal_ref[2]
    inv_dx = scal_ref[3]
    base = slot * P

    def _pad_y(a, lo, hi):
        return jnp.pad(a, ((0, 0), (lo, hi), (0, 0)))

    def _pad_x(a, lo, hi):
        return jnp.pad(a, ((0, 0), (0, 0), (lo, hi)))

    def _d1y(a):
        # EXACT _d1_axis tree: out = Σ_s c_s·(x[+s] − x[−s]); out·inv_dx
        out = None
        for s, c1 in enumerate(c1s, start=1):
            term = c1 * (_pad_y(a[:, s:, :], 0, s) - _pad_y(a[:, :-s, :], s, 0))
            out = term if out is None else out + term
        return out * inv_dx

    def _d1x(a):
        out = None
        for s, c1 in enumerate(c1s, start=1):
            term = c1 * (_pad_x(a[:, :, s:], 0, s) - _pad_x(a[:, :, :-s], s, 0))
            out = term if out is None else out + term
        return out * inv_dx

    def derivs(scr):
        """All six second derivatives of one field on the T center slices,
        matching ops/wave.py's ``_d2_axis`` / composed ``_d1_axis`` trees."""
        su = scr[pl.ds(base, P)]          # (P, H, W) slab + z halos
        c = su[hw:hw + T]
        d2z = c0 * c
        for s, coef in enumerate(cs, start=1):
            d2z = d2z + coef * (su[hw + s:hw + s + T] + su[hw - s:hw - s + T])
        d2z = d2z * inv_dx2
        d2y = c0 * c
        for s, coef in enumerate(cs, start=1):
            d2y = d2y + coef * (_pad_y(c[:, s:, :], 0, s)
                                + _pad_y(c[:, :-s, :], s, 0))
        d2y = d2y * inv_dx2
        d2x = c0 * c
        for s, coef in enumerate(cs, start=1):
            d2x = d2x + coef * (_pad_x(c[:, :, s:], 0, s)
                                + _pad_x(c[:, :, :-s], s, 0))
        d2x = d2x * inv_dx2
        # inner ∂z on the center slices (z halos supply the taps), then the
        # outer in-plane first derivatives — _dij(u,0,1) / _dij(u,0,2)
        vz = None
        for s, c1 in enumerate(c1s, start=1):
            term = c1 * (su[hw + s:hw + s + T] - su[hw - s:hw - s + T])
            vz = term if vz is None else vz + term
        vz = vz * inv_dx
        dzy = _d1y(vz)
        dzx = _d1x(vz)
        dyx = _d1x(_d1y(c))               # _dij(u, 1, 2)
        return c, d2z, d2y, d2x, dzy, dzx, dyx

    pc, pzz, pyy, pxx, pzy, pzx, pyx = derivs(pscr)
    qc, qzz, qyy, qxx, qzy, qzx, qyx = derivs(qscr)

    # coefficient fields may arrive in bf16 (the "reduced-precision
    # coefficients" mode: ~0.4% relative rounding on smooth direction
    # cosines / Thomsen factors for 2.5 fewer f32 grid touches per step);
    # upcast in-register. A no-op for f32 inputs.
    nz = nz_blk[...].astype(jnp.float32)
    ny = ny_blk[...].astype(jnp.float32)
    nx = nx_blk[...].astype(jnp.float32)
    # same expressions (and f32 products) as _propagate_tti3d's precomputed
    # coefficient fields
    czz, cyy, cxx = nz * nz, ny * ny, nx * nx
    czy, czx, cyx = 2.0 * nz * ny, 2.0 * nz * nx, 2.0 * ny * nx

    Hp = ((1.0 - czz) * pzz + (1.0 - cyy) * pyy + (1.0 - cxx) * pxx
          - czy * pzy - czx * pzx - cyx * pyx)
    Vq = (czz * qzz + cyy * qyy + cxx * qxx
          + czy * qzy + czx * qzx + cyx * qyx)

    c2 = c2_blk[...]
    ah = ah_blk[...].astype(jnp.float32)
    av = av_blk[...].astype(jnp.float32)
    e_p = 2.0 * pc - pp_blk[...] + c2 * (ah * Hp + av * Vq)
    e_q = 2.0 * qc - qp_blk[...] + c2 * (av * Hp + Vq)

    s_t = scal_ref[0]
    amp = scal_ref[1]
    iy = lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    yx = iy * W + ix
    m_p = jnp.float32(0.0)
    m_q = jnp.float32(0.0)
    for t in range(T):
        plane = (spz_ref[i * T + t] * sy_blk[...]) * sx_blk[...]
        flat_t = (i * T + t) * (H * W) + yx
        mask_t = jnp.where(flat_t == idx_ref[0], amp, jnp.zeros_like(amp))
        val_p = e_p[t:t + 1] * plane[None] + s_t * mask_t
        val_q = e_q[t:t + 1] * plane[None] + s_t * mask_t
        po_blk[pl.ds(t, 1)] = val_p
        qo_blk[pl.ds(t, 1)] = val_q
        if hist is not None:
            m_p = jnp.maximum(m_p, jnp.max(jnp.abs(val_p)))
            m_q = jnp.maximum(m_q, jnp.max(jnp.abs(val_q)))
    if hist is not None:
        # encode the INPUT fields from their ring centers with the
        # deferred SMEM scales — exact XLA enc trees
        pmax_ref[i] = m_p
        qmax_ref[i] = m_q
        if hist == "int8":
            penc_blk[...] = jnp.round(pc * scal_ref[4]).astype(jnp.int8)
            qenc_blk[...] = jnp.round(qc * scal_ref[5]).astype(jnp.int8)
        elif hist == "bf16":
            penc_blk[...] = pc.astype(jnp.bfloat16)
            qenc_blk[...] = qc.astype(jnp.bfloat16)
        else:
            penc_blk[...] = pc
            qenc_blk[...] = qc


# TTI kernel VMEM knobs. Mosaic's default scoped-vmem limit is 16 MB, but
# v5e accepts a raised vmem_limit_bytes; the declared-buffer budget leaves
# headroom for the kernel's in-register window temporaries. Swept in-loop
# at 256³ (r4): f32 coeffs T=1/2/4 → 1672/1611/1552 µs; bf16 coeffs
# T=2/4 → 1221/1162 µs (T=8 crashed the TPU compiler — backed off).
# Budget 26 MB / limit 44 MB selects T=4 for both coefficient widths.
_TTI_VMEM_BUDGET = 26 * 2**20
_TTI_VMEM_LIMIT = 44 * 2**20


def tti_step_tile(shape, order: int, itemsize: int = 4,
                  coeff_itemsize: int = 4):
    """5 f32 blocked grid arrays (pp, qp, c2, p_out, q_out) + 5 coefficient
    fields at their stored width (f32, or bf16 in reduced-precision
    coefficient mode), all double-buffered, + TWO DMA rings (both fields
    are z-stencilled here). bf16 coefficients halve their VMEM share, which
    lifts 256³ from T=1 to T=2 — the T=1 slab pipeline is where the
    measured 41% roofline gap of round 3 lived."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        vmem = (4 * (t + 2 * hw) * itemsize + 10 * t * itemsize
                + 10 * t * coeff_itemsize) * H * W
        if vmem <= _TTI_VMEM_BUDGET:
            return t
    return None


def fits_tti_pallas(shape, dtype, order: int,
                    coeff_itemsize: int = 4) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    if coeff_itemsize == 2 and H % 16 != 0:
        return False  # bf16 blocks tile at (16, 128)
    return tti_step_tile(shape, order, 4, coeff_itemsize) is not None


def fused_tti_step(p_prev, p, q_prev, q, c2dt2, ah, av, nz, ny, nx,
                   spz, sy, sx, inv_dx2, inv_dx, s_t, src_idx, amp, *,
                   order: int = 2, interpret: bool = False):
    """One coupled 3-D TTI leapfrog step in a single slab-pipelined pass
    (12 grid touches — the physics minimum for the (c, ε, δ, θ, φ)
    parameterization); returns ``(p_next, q_next)`` with ``p_prev``/
    ``q_prev`` aliased in place. ``nz/ny/nx`` are the symmetry-axis
    component fields ``(cosθ, sinθcosφ, sinθsinφ)``. The five coefficient
    fields ``ah/av/nz/ny/nx`` may be bf16 (upcast in-register — the
    reduced-precision coefficient mode; halves their VMEM share, lifting
    256³ to T=2). Raw kernel; ``ops/wave.py`` wraps it in ``custom_jvp``."""
    D, H, W = p.shape
    T = tti_step_tile(p.shape, order, p.dtype.itemsize,
                      jnp.dtype(ah.dtype).itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {p.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, p.dtype), jnp.asarray(amp, p.dtype),
                      jnp.asarray(inv_dx2, p.dtype),
                      jnp.asarray(inv_dx, p.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_tti_kernel, T=T, D=D, H=H, W=W, order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((D, H, W), p.dtype)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TTI_VMEM_LIMIT),
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, p_prev, q_prev, c2dt2, ah, av, nz, ny, nx,
      p, q)


def fused_tti_hist_step(p_prev, p, q_prev, q, c2dt2, ah, av, nz, ny, nx,
                        spz, sy, sx, inv_dx2, inv_dx, s_t, src_idx, amp,
                        qfp, qfq, *, store: str = "int8", order: int = 2,
                        interpret: bool = False):
    """:func:`fused_tti_step` + in-kernel two-field history encoding (the
    TTI stored-adjoint forward sweep; see :func:`fused_vti_hist_step`)."""
    D, H, W = p.shape
    T = tti_step_tile(p.shape, order, p.dtype.itemsize,
                      jnp.dtype(ah.dtype).itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {p.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, p.dtype), jnp.asarray(amp, p.dtype),
                      jnp.asarray(inv_dx2, p.dtype),
                      jnp.asarray(inv_dx, p.dtype),
                      jnp.asarray(qfp, p.dtype), jnp.asarray(qfq, p.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    sdt = _STORE_DTYPES[store]
    return pl.pallas_call(
        functools.partial(_tti_kernel, T=T, D=D, H=H, W=W, order=order,
                          hist=store),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec, vspec, vspec,
                   pl.BlockSpec(memory_space=pltpu.SMEM),
                   pl.BlockSpec(memory_space=pltpu.SMEM)],
        out_shape=[jax.ShapeDtypeStruct((D, H, W), p.dtype)] * 2
        + [jax.ShapeDtypeStruct((D, H, W), sdt)] * 2
        + [jax.ShapeDtypeStruct((D // T,), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), p.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {5: 0, 6: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TTI_VMEM_LIMIT),
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, p_prev, q_prev, c2dt2, ah, av, nz, ny, nx,
      p, q)


# ---------------------------------------------------------------------------
# Fused ADJOINT (reverse-sweep) step — the FWI/RTM gradient hot path.
# ops/wave.py::_adjoint_stored's reverse recurrence is, per reverse step k,
#
#     ē_k  = S ⊙ a_{k+1}                                  (S = sponge diag)
#     gc2 += L(u_k) ⊙ ē_k          (u_k decoded from the stored history)
#     a_k  = (2ē_k + L(c²dt²·ē_k) − ē_{k+1}) + Pᵀ ḡrec_{k-1}
#
# which XLA runs as a heavily de-fused multi-pass body (two separate
# stencils + sponge products + the gc2 read-modify-write). This kernel does
# the whole update in ONE slab-pipelined pass: a_{k+1}, c²dt² and the
# ENCODED history snapshot stream through three DMA rings (the history is
# decoded in-register, so an int8 history costs a quarter-touch of HBM
# traffic); ē_{k+1} is recomputed in-register as S ⊙ a_{k+2} (the scan
# carries (a_{k+1}, a_{k+2}) like the forward leapfrog, so no extra ē field
# is ever written); gc2 is read, accumulated and written in the same pass,
# aliased in place; the receiver injection Pᵀḡ is a tiny in-place XLA
# scatter-add applied to the kernel's output outside (128 scattered
# elements — not worth 2 full-grid touches of in-kernel masking).
#
# Touches per reverse step (int8 history): a_{k+1}(ring) + c²dt²(ring)
# + u_k(¼ ring) + a_{k+2} + gc2 read + gc2 write + a_k write ≈ 6¼ — vs the
# physics-blind XLA body. Bit-exactness contract at order 2 (gated by
# tests/test_pallas_wave.py): the kernel reproduces the exact FP trees of
# the XLA bstep (laplacian_nd / _mul_sponge / the restructured a_k sum),
# so fused and XLA stored-adjoints are interchangeable mid-inversion.
# ---------------------------------------------------------------------------


def _adjoint_kernel(scal_ref, spz_ref, sy_blk, sx_blk, a2_blk, gc2_blk,
                    a1_hbm, c2_hbm, u_hbm, acore_blk, gc2o_blk,
                    a1_scr, c2_scr, u_scr, a1_sems, c2_sems, u_sems, *,
                    T, D, H, W, order):
    c0, cs = _D2_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    def ring(hbm, scr, sems):
        def center(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T, T)],
                scr.at[pl.ds(sl * P + hw, T)], sems.at[sl, 0])

        def front(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T - hw, hw)],
                scr.at[pl.ds(sl * P, hw)], sems.at[sl, 1])

        def back(j, sl):
            return pltpu.make_async_copy(
                hbm.at[pl.ds(j * T + T, hw)],
                scr.at[pl.ds(sl * P + hw + T, hw)], sems.at[sl, 2])

        def start(j, sl):
            center(j, sl).start()

            @pl.when(j > 0)
            def _():
                front(j, sl).start()

            @pl.when(j < nsl - 1)
            def _():
                back(j, sl).start()

        def wait(j, sl):
            center(j, sl).wait()

            @pl.when(j > 0)
            def _():
                front(j, sl).wait()

            @pl.when(j == 0)
            def _():
                scr[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scr.dtype)

            @pl.when(j < nsl - 1)
            def _():
                back(j, sl).wait()

            @pl.when(j == nsl - 1)
            def _():
                scr[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                    (hw, H, W), scr.dtype)

        return start, wait

    a1_start, a1_wait = ring(a1_hbm, a1_scr, a1_sems)
    c2_start, c2_wait = ring(c2_hbm, c2_scr, c2_sems)
    u_start, u_wait = ring(u_hbm, u_scr, u_sems)

    @pl.when(i == 0)
    def _():
        a1_start(0, 0)
        c2_start(0, 0)
        u_start(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        a1_start(i + 1, nslot)
        c2_start(i + 1, nslot)
        u_start(i + 1, nslot)

    a1_wait(i, slot)
    c2_wait(i, slot)
    u_wait(i, slot)

    sc = scal_ref[0]
    base = slot * P

    # Per-slice computation (Mosaic rejects rank-expanding reshapes of
    # stacked scalars, so no (P,1,1) sponge column is built): ē and
    # w = c²dt²·ē are recomputed at each z a stencil tap needs them —
    # (2hw+1)·T recomputes of a 2-multiply expression, VPU-cheap against
    # the HBM traffic this kernel exists to save. Out-of-grid halo z's
    # clamp the spz read; their a1/c2 slices are zero-filled so the
    # clamped value is moot. Trees match _mul_sponge/(laplacian_nd |
    # _d2_axis) exactly.
    def plane_at(s):
        """Sponge plane (1,H,W) at window slice s — (spz[z]·sy)·sx."""
        z = i * T + (s - hw)
        zc = jnp.clip(z, 0, D - 1)
        return (spz_ref[zc] * sy_blk[...])[None] * sx_blk[...][None]

    def ebar_at(s):
        return a1_scr[pl.ds(base + s, 1)] * plane_at(s)

    def w_at(s):
        return c2_scr[pl.ds(base + s, 1)] * ebar_at(s)

    def u_at(s):
        # decode: q.astype(f32)·sc — sc = s/127 for int8, exactly 1.0 for
        # f32/bf16 (×1.0 is IEEE-exact: the f32 path matches the XLA dec)
        return u_scr[pl.ds(base + s, 1)].astype(jnp.float32) * sc

    def lap_slice(at, t):
        """EXACT laplacian_nd tree for output slice t: (c0·3)·c, then per
        axis (z,y,x) per tap s=1..hw, '+ lo + hi' when the coefficient is
        1.0, '+ coef·(lo+hi)' otherwise."""
        c = at(hw + t)
        lap = (c0 * 3.0) * c
        for s, coef in enumerate(cs, start=1):
            zlo = at(hw + t - s)
            zhi = at(hw + t + s)
            if coef == 1.0:
                lap = lap + zlo + zhi
            else:
                lap = lap + coef * (zlo + zhi)
        for s, coef in enumerate(cs, start=1):
            ylo = jnp.pad(c[:, :-s, :], ((0, 0), (s, 0), (0, 0)))
            yhi = jnp.pad(c[:, s:, :], ((0, 0), (0, s), (0, 0)))
            if coef == 1.0:
                lap = lap + ylo + yhi
            else:
                lap = lap + coef * (ylo + yhi)
        for s, coef in enumerate(cs, start=1):
            xlo = jnp.pad(c[:, :, :-s], ((0, 0), (0, 0), (s, 0)))
            xhi = jnp.pad(c[:, :, s:], ((0, 0), (0, 0), (0, s)))
            if coef == 1.0:
                lap = lap + xlo + xhi
            else:
                lap = lap + coef * (xlo + xhi)
        return lap

    for t in range(T):
        lap_w = lap_slice(w_at, t)
        lap_u = lap_slice(u_at, t)
        ebar_c = ebar_at(hw + t)
        ebarn = a2_blk[pl.ds(t, 1)] * plane_at(hw + t)   # ē_{k+1}
        gc2o_blk[pl.ds(t, 1)] = gc2_blk[pl.ds(t, 1)] + lap_u * ebar_c
        acore_blk[pl.ds(t, 1)] = (2.0 * ebar_c + lap_w) - ebarn


# swept in-loop at 256³ (r4, int8 gradient fwd+rev): adjoint T=2 →
# 1417 µs/step, T=4 (budget 20/limit 32) → 1339, T=8 (40/44) → 1313
# (the per-slice compute keeps window temporaries ~2 MB, so the big
# declared budget is safe).
_ADJ_VMEM_BUDGET = 40 * 2**20
_ADJ_VMEM_LIMIT = 44 * 2**20


def adjoint_step_tile(shape, order: int, store_itemsize: int = 4):
    """Largest z tile for the adjoint kernel: TWO f32 DMA rings (a_{k+1},
    c²dt²) + the history ring at its stored width + 4 blocked f32 arrays
    double-buffered, within ``_ADJ_VMEM_BUDGET`` (40 MB declared /
    ``_ADJ_VMEM_LIMIT`` 44 MB scoped — the r4 in-loop sweep picked T=8 at
    256³: 1313 µs vs 1339 at T=4 / 1417 at T=2; the per-slice compute
    keeps window temporaries ~2 MB, so the big declared budget is safe)."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        ring = 2 * (t + 2 * hw)
        vmem = (ring * 2 * 4 + ring * store_itemsize + 8 * t * 4) * H * W
        if vmem <= _ADJ_VMEM_BUDGET:
            return t
    return None


_STORE_DTYPES = {"f32": jnp.float32, "bf16": jnp.bfloat16, "int8": jnp.int8}


def fits_adjoint_pallas(shape, dtype, order: int, store: str = "f32") -> bool:
    """True when the fused adjoint sweep applies: 3-D f32 grid,
    lane/sublane-aligned minor dims (the history dtype tightens the
    sublane requirement: bf16 tiles at (16,128), int8 at (32,128)), and a
    VMEM-feasible slab tile covering the stencil halo."""
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS or store not in _STORE_DTYPES:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    sub = {"f32": 8, "bf16": 16, "int8": 32}[store]
    if H % sub != 0:
        return False
    itemsize = jnp.dtype(_STORE_DTYPES[store]).itemsize
    return adjoint_step_tile(shape, order, itemsize) is not None


def fused_adjoint_step(a1, a2, gc2, c2dt2, u_enc, sc, spz, sy, sx, *,
                       order: int = 2, interpret: bool = False):
    """One reverse-sweep step of the stored-wavefield adjoint in a single
    slab-pipelined pass. Returns ``(a_core, gc2_new)`` where

        ē      = S ⊙ a1,   S = (spz·sy)·sx per slice
        a_core = (2ē + L(c²dt²·ē)) − S ⊙ a2
        gc2ₙ   = gc2 + L(dec(u_enc)) ⊙ ē,   dec(q) = q.astype(f32)·sc

    with ``a2`` aliased in place to ``a_core`` and ``gc2`` to ``gc2_new``.
    The receiver injection Pᵀḡ is NOT included — add it to ``a_core``
    outside (``ops/wave.py::_adjoint_stored`` does, as an in-place
    scatter). Raw kernel — no autodiff rules (it IS the adjoint)."""
    D, H, W = a1.shape
    T = adjoint_step_tile(a1.shape, order, u_enc.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {a1.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.asarray(sc, jnp.float32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_adjoint_kernel, T=T, D=D, H=H, W=W, order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec, vspec],
        out_shape=[jax.ShapeDtypeStruct((D, H, W), jnp.float32)] * 2,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), u_enc.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {4: 0, 5: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_ADJ_VMEM_LIMIT),
        interpret=interpret,
    )(scal, spz, sy, sx, a2, gc2, a1, c2dt2, u_enc)


# ---------------------------------------------------------------------------
# Fused visco-acoustic (Kosloff constant-Q) step — the attenuation leapfrog
# of ops/wave.py::_propagate_q. Same slab pipeline as the isotropic kernel
# with ONE extra blocked coefficient field: the friction enters as
#     u_next = S · ((2u − (1−g)·u_prev + c²dt²·∆u) · 1/(1+g)) + s·mask
# with g = γ·dt streamed as a single field and (1−g) / 1/(1+g) recomputed
# IN-REGISTER (one subtract + one divide per element — VPU-free against
# the HBM traffic this buys). Round-3 shipped a two-field (1−g, 1/(1+g))
# version that measured SLOWER than XLA in-loop (777 vs 525 µs at 256³):
# the two extra fields forced the slab tile to T=2 and paid 7 touches.
# The single-field form is 5 touches (u stencilled, u_prev, c²dt², g read;
# u_next written aliased onto u_prev) and fits T=4; with bf16 g
# (coeff_dtype mode, same straight-through rounding as TTI) it is 4.5.
# The reference family's production propagators are all *DenQ
# (attenuating): this closes the fused-kernel story for the single-field
# attenuating physics.
# ---------------------------------------------------------------------------


def _q_kernel(scal_ref, idx_ref, spz_ref, sy_blk, sx_blk, up_blk, c2_blk,
              g_blk, u_hbm, out_blk, scratch, sems, *,
              T, D, H, W, order):
    c0, cs = _D2_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    def center_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T, T)],
            scratch.at[pl.ds(sl * P + hw, T)], sems.at[sl, 0])

    def front_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T - hw, hw)],
            scratch.at[pl.ds(sl * P, hw)], sems.at[sl, 1])

    def back_dma(j, sl):
        return pltpu.make_async_copy(
            u_hbm.at[pl.ds(j * T + T, hw)],
            scratch.at[pl.ds(sl * P + hw + T, hw)], sems.at[sl, 2])

    def start_slab(j, sl):
        center_dma(j, sl).start()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).start()

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).start()

    def wait_slab(j, sl):
        center_dma(j, sl).wait()

        @pl.when(j > 0)
        def _():
            front_dma(j, sl).wait()

        @pl.when(j == 0)
        def _():
            scratch[pl.ds(sl * P, hw)] = jnp.zeros((hw, H, W), scratch.dtype)

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).wait()

        @pl.when(j == nsl - 1)
        def _():
            scratch[pl.ds(sl * P + hw + T, hw)] = jnp.zeros(
                (hw, H, W), scratch.dtype)

    @pl.when(i == 0)
    def _():
        start_slab(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        start_slab(i + 1, nslot)

    wait_slab(i, slot)

    base = slot * P
    c = scratch[pl.ds(base + hw, T)]
    # EXACT laplacian_nd tree (as in _wave_kernel)
    lap = (c0 * 3.0) * c
    for s, coef in enumerate(cs, start=1):
        zlo = scratch[pl.ds(base + hw - s, T)]
        zhi = scratch[pl.ds(base + hw + s, T)]
        if coef == 1.0:
            lap = lap + zlo + zhi
        else:
            lap = lap + coef * (zlo + zhi)
    for s, coef in enumerate(cs, start=1):
        ylo = jnp.pad(c[:, :-s, :], ((0, 0), (s, 0), (0, 0)))
        yhi = jnp.pad(c[:, s:, :], ((0, 0), (0, s), (0, 0)))
        if coef == 1.0:
            lap = lap + ylo + yhi
        else:
            lap = lap + coef * (ylo + yhi)
    for s, coef in enumerate(cs, start=1):
        xlo = jnp.pad(c[:, :, :-s], ((0, 0), (0, 0), (s, 0)))
        xhi = jnp.pad(c[:, :, s:], ((0, 0), (0, 0), (0, s)))
        if coef == 1.0:
            lap = lap + xlo + xhi
        else:
            lap = lap + coef * (xlo + xhi)

    # EXACT _propagate_q tree: (2u − om1g·up + c²dt²·lap) · inv1pg, with
    # om1g = 1−g and inv1pg = 1/(1+g) recomputed in-register from the
    # single (possibly bf16) g field — the same f32 ops as the XLA path's
    # precomputed full-grid coefficient arrays, so bit-exactness holds
    g = g_blk[...].astype(jnp.float32)
    om1g = 1.0 - g
    inv1pg = 1.0 / (1.0 + g)
    e = (2.0 * c - om1g * up_blk[...] + c2_blk[...] * lap) \
        * inv1pg

    s_t = scal_ref[0]
    amp = scal_ref[1]
    iy = lax.broadcasted_iota(jnp.int32, (1, H, W), 1)
    ix = lax.broadcasted_iota(jnp.int32, (1, H, W), 2)
    yx = iy * W + ix
    for t in range(T):
        plane = (spz_ref[i * T + t] * sy_blk[...]) * sx_blk[...]
        flat_t = (i * T + t) * (H * W) + yx
        mask_t = jnp.where(flat_t == idx_ref[0], amp, jnp.zeros_like(amp))
        out_blk[pl.ds(t, 1)] = e[t:t + 1] * plane[None] + s_t * mask_t


_Q_VMEM_BUDGET = 12 * 2**20
_Q_VMEM_LIMIT = 16 * 2**20


def q_step_tile(shape, order: int, itemsize: int = 4,
                g_itemsize: int = 4):
    """3 f32 blocked grid arrays (u_prev, c²dt², u_next) + the g field at
    its stored width, double-buffered, + the u DMA ring. The single-field
    form fits T=4 at 256³ (the round-3 two-field kernel was stuck at T=2,
    which is where its in-loop loss lived)."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        vmem = (2 * (t + 2 * hw) * itemsize + 6 * t * itemsize
                + 2 * t * g_itemsize) * H * W
        if vmem <= _Q_VMEM_BUDGET:
            return t
    return None


def fits_q_pallas(shape, dtype, order: int, g_itemsize: int = 4) -> bool:
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    if g_itemsize == 2 and H % 16 != 0:
        return False  # bf16 blocks tile at (16, 128)
    return q_step_tile(shape, order, 4, g_itemsize) is not None


def fused_q_step(u_prev, u, c2dt2, g, spz, sy, sx, s_t, src_idx,
                 amp, *, order: int = 2, interpret: bool = False):
    """One Kosloff constant-Q leapfrog step in a single slab-pipelined pass
    (5 grid touches — 4.5 with a bf16 ``g``; ``u_prev`` aliased in place
    to ``u_next``). ``g`` is the single friction field γ·dt (f32 or bf16,
    upcast in-register; (1−g) and 1/(1+g) are recomputed per element).
    Raw kernel; ``ops/wave.py`` wraps it in ``custom_jvp``."""
    D, H, W = u.shape
    T = q_step_tile(u.shape, order, u.dtype.itemsize,
                    jnp.dtype(g.dtype).itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {u.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(s_t, u.dtype), jnp.asarray(amp, u.dtype)])
    sidx = jnp.asarray(src_idx, jnp.int32).reshape(1)
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_q_kernel, T=T, D=D, H=H, W=W, order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct((D, H, W), u.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), u.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases={} if interpret else {5: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_Q_VMEM_LIMIT),
        interpret=interpret,
    )(scal, sidx, spz, sy, sx, u_prev, c2dt2, g, u)


# ---------------------------------------------------------------------------
# Fused VTI ADJOINT (reverse-sweep) step — the anisotropic FWI gradient hot
# path. ops/wave.py::_adjoint_stored_vti's reverse recurrence is, per
# reverse step k (ēp = S ⊙ ap₁, ēq = S ⊙ aq₁, C = c²dt²),
#
#     gC  += (ah·Lh(p_k) + av·∂zz(q_k))⊙ēp + (av·Lh(p_k) + ∂zz(q_k))⊙ēq
#     gah += C·Lh(p_k)⊙ēp
#     gav += C·(∂zz(q_k)⊙ēp + Lh(p_k)⊙ēq)
#     ap   = Pᵀḡ + 2ēp + Lh(C·ah·ēp) + Lh(C·av·ēq) − S⊙ap₂
#     aq   =      2ēq + ∂zz(C·av·ēp) + ∂zz(C·ēq)  − S⊙aq₂
#
# which XLA runs as a heavily de-fused multi-pass body (measured 6824
# µs/step at 256³ f32 — barely 1.26× over autodiff-remat). The structural
# gift of the VTI split: Lh is HORIZONTAL-only and ∂zz VERTICAL-only, so
# only the fields inside a ∂zz — ap₁, aq₁ (via ē), C, av and the ENCODED
# q-history — need z halos (five DMA rings; the int8 q-history costs a
# quarter-touch); ah, the p-history, both a₊₊ fields and the THREE
# gradient accumulators ride blocked specs, with ap₂→ap, aq₂→aq and each
# accumulator aliased in place. Touches per reverse step (int8 history):
# 4 f32 rings + ¼ + ¼ + 6 blocked f32 reads + 5 writes ≈ 15.5 — the
# physics minimum for this parameterization, ~1.3 ms at the 819 GB/s
# roofline. The receiver injection Pᵀḡ stays an in-place XLA scatter on
# the kernel's ap output (as in the isotropic adjoint).
#
# Bit-exactness contract at order 2 (gated by tests/test_pallas_wave.py):
# the kernel reproduces the exact FP trees of _adjoint_stored_vti's XLA
# bstep (_mul_sponge / _d2_axis / the accumulator and a-update sums), so
# fused and XLA VTI stored-adjoints are interchangeable mid-inversion.
# ---------------------------------------------------------------------------


def _vti_adjoint_kernel(scal_ref, spz_ref, sy_blk, sx_blk,
                        ap2_blk, aq2_blk, gc_blk, gah_blk, gav_blk,
                        ah_blk, p_blk,
                        ap1_hbm, aq1_hbm, c_hbm, av_hbm, q_hbm,
                        apo_blk, aqo_blk, gco_blk, gaho_blk, gavo_blk,
                        ap1_scr, aq1_scr, c_scr, av_scr, q_scr,
                        ap1_sems, aq1_sems, c_sems, av_sems, q_sems, *,
                        T, D, H, W, order):
    c0, cs = _D2_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    rings = [
        _ring_io(ap1_hbm, ap1_scr, ap1_sems, T=T, hw=hw, nsl=nsl, H=H, W=W),
        _ring_io(aq1_hbm, aq1_scr, aq1_sems, T=T, hw=hw, nsl=nsl, H=H, W=W),
        _ring_io(c_hbm, c_scr, c_sems, T=T, hw=hw, nsl=nsl, H=H, W=W),
        _ring_io(av_hbm, av_scr, av_sems, T=T, hw=hw, nsl=nsl, H=H, W=W),
        _ring_io(q_hbm, q_scr, q_sems, T=T, hw=hw, nsl=nsl, H=H, W=W),
    ]

    @pl.when(i == 0)
    def _():
        for start, _w in rings:
            start(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        for start, _w in rings:
            start(i + 1, nslot)

    for _s, wait in rings:
        wait(i, slot)

    psc = scal_ref[0]
    qsc = scal_ref[1]
    inv_dx2 = scal_ref[2]
    base = slot * P

    def plane_at(s):
        """Sponge plane (1,H,W) at window slice s — (spz[z]·sy)·sx.
        Out-of-grid halo z's clamp the spz read; their ring slices are
        zero-filled so the clamped value is moot."""
        z = i * T + (s - hw)
        zc = jnp.clip(z, 0, D - 1)
        return (spz_ref[zc] * sy_blk[...])[None] * sx_blk[...][None]

    # whole-window slice lists, computed ONCE per z (vs the per-tap
    # recompute of the isotropic adjoint kernel: the VTI reverse needs
    # each window value in up to 2hw+1 taps AND the accumulators, so
    # recompute would multiply real VPU work, not a 2-multiply expression)
    planes = [plane_at(s) for s in range(P)]
    ebp = [ap1_scr[pl.ds(base + s, 1)] * planes[s] for s in range(P)]
    ebq = [aq1_scr[pl.ds(base + s, 1)] * planes[s] for s in range(P)]
    Cw = [c_scr[pl.ds(base + s, 1)] for s in range(P)]
    avw = [av_scr[pl.ds(base + s, 1)] for s in range(P)]
    # EXACT bstep trees: C * av * ebp ≡ (C·av)·ēp ; C * ebq
    w3 = [(Cw[s] * avw[s]) * ebp[s] for s in range(P)]
    w4 = [Cw[s] * ebq[s] for s in range(P)]
    # decode: q.astype(f32)·sc — sc = s/127 for int8, exactly 1.0 for
    # f32/bf16 (×1.0 is IEEE-exact, matching the XLA dec)
    qdec = [q_scr[pl.ds(base + s, 1)].astype(jnp.float32) * qsc
            for s in range(P)]

    def d2_h(m):
        """EXACT Lh tree: _d2_axis(m,1) + _d2_axis(m,2), each
        (c0·m + Σ coef·(lo+hi))·inv_dx2 (zero in-plane boundary)."""
        d2y = c0 * m
        for s, coef in enumerate(cs, start=1):
            ylo = jnp.pad(m[:, :-s, :], ((0, 0), (s, 0), (0, 0)))
            yhi = jnp.pad(m[:, s:, :], ((0, 0), (0, s), (0, 0)))
            d2y = d2y + coef * (ylo + yhi)
        d2y = d2y * inv_dx2
        d2x = c0 * m
        for s, coef in enumerate(cs, start=1):
            xlo = jnp.pad(m[:, :, :-s], ((0, 0), (0, 0), (s, 0)))
            xhi = jnp.pad(m[:, :, s:], ((0, 0), (0, 0), (0, s)))
            d2x = d2x + coef * (xlo + xhi)
        d2x = d2x * inv_dx2
        return d2y + d2x

    def d2_z(win, s_c):
        """EXACT _d2_axis(·, 0) tree on a window slice list."""
        out = c0 * win[s_c]
        for s, coef in enumerate(cs, start=1):
            out = out + coef * (win[s_c - s] + win[s_c + s])
        return out * inv_dx2

    for t in range(T):
        s_c = hw + t
        pdec = p_blk[pl.ds(t, 1)].astype(jnp.float32) * psc
        lh_k = d2_h(pdec)
        dzz_k = d2_z(qdec, s_c)
        ebp_c = ebp[s_c]
        ebq_c = ebq[s_c]
        C_c = Cw[s_c]
        av_c = avw[s_c]
        ah_c = ah_blk[pl.ds(t, 1)]
        gco_blk[pl.ds(t, 1)] = gc_blk[pl.ds(t, 1)] + (
            (ah_c * lh_k + av_c * dzz_k) * ebp_c
            + (av_c * lh_k + dzz_k) * ebq_c)
        gaho_blk[pl.ds(t, 1)] = gah_blk[pl.ds(t, 1)] + (C_c * lh_k) * ebp_c
        gavo_blk[pl.ds(t, 1)] = gav_blk[pl.ds(t, 1)] + C_c * (
            dzz_k * ebp_c + lh_k * ebq_c)
        ebp1 = ap2_blk[pl.ds(t, 1)] * planes[s_c]
        ebq1 = aq2_blk[pl.ds(t, 1)] * planes[s_c]
        m1 = C_c * ah_c * ebp_c
        m2 = C_c * av_c * ebq_c
        apo_blk[pl.ds(t, 1)] = (2.0 * ebp_c + d2_h(m1) + d2_h(m2)) - ebp1
        aqo_blk[pl.ds(t, 1)] = (2.0 * ebq_c + d2_z(w3, s_c)
                                + d2_z(w4, s_c)) - ebq1


# swept in-loop at 256³ (r5, int8 gradient fwd+rev, whole-sweep marginal):
# T=2 (budget 24/limit 34) → 3508 µs/step, T=4 (40/44) → 3380 — the
# bigger tile wins as for the iso adjoint; T=8 is VMEM-infeasible.
_VTI_ADJ_VMEM_BUDGET = 40 * 2**20
_VTI_ADJ_VMEM_LIMIT = 44 * 2**20


def vti_adjoint_step_tile(shape, order: int, store_itemsize: int = 4):
    """Largest z tile for the VTI adjoint kernel: FOUR f32 DMA rings
    (ap₁, aq₁, c²dt², av) + the q-history ring at its stored width + 10
    blocked f32 arrays (ap₂, aq₂, 3 accumulators in+out, ah) + the blocked
    p-history, double-buffered, within ``_VTI_ADJ_VMEM_BUDGET``."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        ring = 2 * (t + 2 * hw)
        vmem = (ring * (4 * 4 + store_itemsize)
                + 2 * t * (11 * 4 + store_itemsize)) * H * W
        if vmem <= _VTI_ADJ_VMEM_BUDGET:
            return t
    return None


def fits_vti_adjoint_pallas(shape, dtype, order: int,
                            store: str = "f32") -> bool:
    """True when the fused VTI adjoint sweep applies: 3-D f32 grid,
    lane/sublane-aligned minor dims (the history dtype tightens the
    sublane requirement as for the isotropic kernel), VMEM-feasible tile."""
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS or store not in _STORE_DTYPES:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    sub = {"f32": 8, "bf16": 16, "int8": 32}[store]
    if H % sub != 0:
        return False
    itemsize = jnp.dtype(_STORE_DTYPES[store]).itemsize
    return vti_adjoint_step_tile(shape, order, itemsize) is not None


def fused_vti_adjoint_step(ap1, aq1, ap2, aq2, gC, gah, gav, C, av, ah,
                           p_enc, q_enc, psc, qsc, inv_dx2, spz, sy, sx, *,
                           order: int = 2, interpret: bool = False):
    """One reverse-sweep step of the stored-wavefield VTI adjoint in a
    single slab-pipelined pass. Returns
    ``(ap_core, aq_core, gC', gah', gav')`` where (S = (spz·sy)·sx,
    ēp = S⊙ap1, ēq = S⊙aq1, histories decoded as q.astype(f32)·sc)

        ap_core = (2ēp + Lh(C·ah·ēp) + Lh(C·av·ēq)) − S⊙ap2
        aq_core = (2ēq + ∂zz(C·av·ēp) + ∂zz(C·ēq)) − S⊙aq2
        gC'  = gC + (ah·Lh(p) + av·∂zz(q))⊙ēp + (av·Lh(p) + ∂zz(q))⊙ēq
        gah' = gah + C·Lh(p)⊙ēp
        gav' = gav + C·(∂zz(q)⊙ēp + Lh(p)⊙ēq)

    with ``ap2→ap_core``, ``aq2→aq_core`` and each accumulator aliased in
    place. The receiver injection Pᵀḡ is NOT included — ops/wave.py adds
    it to ``ap_core`` outside as an in-place scatter. Raw kernel — no
    autodiff rules (it IS the adjoint)."""
    D, H, W = ap1.shape
    T = vti_adjoint_step_tile(ap1.shape, order, q_enc.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {ap1.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(psc, jnp.float32),
                      jnp.asarray(qsc, jnp.float32),
                      jnp.asarray(inv_dx2, jnp.float32)])
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        functools.partial(_vti_adjoint_kernel, T=T, D=D, H=H, W=W,
                          order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
            vspec, vspec, vspec, vspec, vspec, vspec, vspec,
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=[vspec] * 5,
        out_shape=[jax.ShapeDtypeStruct((D, H, W), jnp.float32)] * 5,
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), jnp.float32),
            pltpu.VMEM((2 * (T + 2 * hw), H, W), q_enc.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        input_output_aliases=(
            {} if interpret else {4: 0, 5: 1, 6: 2, 7: 3, 8: 4}),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_VTI_ADJ_VMEM_LIMIT),
        interpret=interpret,
    )(scal, spz, sy, sx, ap2, aq2, gC, gah, gav, ah, p_enc,
      ap1, aq1, C, av, q_enc)


# ---------------------------------------------------------------------------
# Fused 3-D TTI ADJOINT (reverse-sweep) step — the production anisotropic
# FWI gradient. ops/wave.py::_adjoint_stored_tti3d's reverse body carries
# TEN fields and applies twelve stencil passes per step; XLA de-fuses it
# completely (measured 23,412 µs/step at 256³ f32 — statistical parity
# with autodiff-remat, ~15× the fused TTI forward). This kernel runs the
# whole update in ONE slab-pipelined pass: ap₁, aq₁, c²dt², the five
# coefficient fields (1+2ε, √(1+2δ), nz, ny, nx — streamed at their
# stored width, so the bf16 coefficient mode halves their share) and BOTH
# encoded histories flow through ten DMA rings; both a₊₊ fields and the
# SIX gradient accumulators (gC, gah, gav, gnz, gny, gnx) ride blocked
# specs aliased in place. Touches per reverse step (int8 history, f32
# coeffs): 8 f32 rings + 2·¼ + 8 blocked reads + 8 writes ≈ 24.5 — vs
# the de-fused XLA body's ~200+. The six direction coefficients are
# recomputed in-register from the three axis reads, as in the forward
# TTI kernel. Receiver injection stays an XLA scatter on ap outside.
#
# Bit-exactness contract at order 2 (gated by tests/test_pallas_wave.py):
# the kernel reproduces the exact FP trees of _adjoint_stored_tti3d's XLA
# bstep (_mul_sponge / _d2_axis / _d1_axis compositions / H_of / V_of /
# HT / VT applied ONCE on the summed weight fields / the accumulator
# sums), so fused and XLA TTI stored-adjoints are interchangeable
# mid-inversion.
# ---------------------------------------------------------------------------


def _tti_adjoint_kernel(scal_ref, spz_ref, sy_blk, sx_blk,
                        ap2_blk, aq2_blk, gc_blk, gah_blk, gav_blk,
                        gnz_blk, gny_blk, gnx_blk,
                        ap1_hbm, aq1_hbm, c_hbm, ah_hbm, av_hbm,
                        nz_hbm, ny_hbm, nx_hbm, p_hbm, q_hbm,
                        apo_blk, aqo_blk, gco_blk, gaho_blk, gavo_blk,
                        gnzo_blk, gnyo_blk, gnxo_blk,
                        ap1_scr, aq1_scr, c_scr, ah_scr, av_scr,
                        nz_scr, ny_scr, nx_scr, p_scr, q_scr,
                        sems, *, T, D, H, W, order):
    from .wave import _D1_COEFFS

    c0, cs = _D2_COEFFS[order]
    c1s = _D1_COEFFS[order]
    hw = len(cs)
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2 * hw

    hbms = (ap1_hbm, aq1_hbm, c_hbm, ah_hbm, av_hbm, nz_hbm, ny_hbm,
            nx_hbm, p_hbm, q_hbm)
    scrs = (ap1_scr, aq1_scr, c_scr, ah_scr, av_scr, nz_scr, ny_scr,
            nx_scr, p_scr, q_scr)
    rings = [
        _ring_io(h, s, sems.at[r], T=T, hw=hw, nsl=nsl, H=H, W=W)
        for r, (h, s) in enumerate(zip(hbms, scrs))
    ]

    @pl.when(i == 0)
    def _():
        for start, _w in rings:
            start(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        for start, _w in rings:
            start(i + 1, nslot)

    for _s, wait in rings:
        wait(i, slot)

    psc = scal_ref[0]
    qsc = scal_ref[1]
    inv_dx2 = scal_ref[2]
    inv_dx = scal_ref[3]
    base = slot * P

    def plane_at(s):
        z = i * T + (s - hw)
        zc = jnp.clip(z, 0, D - 1)
        return (spz_ref[zc] * sy_blk[...])[None] * sx_blk[...][None]

    # whole-window slice lists, computed once per z (the TTI reverse reads
    # each window value in up to three transposed-derivative taps plus the
    # accumulator products — per-tap recompute would multiply real work)
    planes = [plane_at(s) for s in range(P)]
    ebp = [ap1_scr[pl.ds(base + s, 1)] * planes[s] for s in range(P)]
    ebq = [aq1_scr[pl.ds(base + s, 1)] * planes[s] for s in range(P)]
    Cwin = [c_scr[pl.ds(base + s, 1)] for s in range(P)]
    # coefficient windows upcast in-register (no-op for f32; the bf16
    # coefficient mode streams the same values the XLA path's
    # straight-through-rounded f32 fields hold)
    ahw = [ah_scr[pl.ds(base + s, 1)].astype(jnp.float32) for s in range(P)]
    avw = [av_scr[pl.ds(base + s, 1)].astype(jnp.float32) for s in range(P)]
    nzw = [nz_scr[pl.ds(base + s, 1)].astype(jnp.float32) for s in range(P)]
    nyw = [ny_scr[pl.ds(base + s, 1)].astype(jnp.float32) for s in range(P)]
    nxw = [nx_scr[pl.ds(base + s, 1)].astype(jnp.float32) for s in range(P)]
    # EXACT bstep trees: HT/VT apply ONCE on the summed weight field
    # (C·ah·ēp + C·av·ēq and C·av·ēp + C·ēq) — linearity halves the
    # transposed-operator arithmetic, the hot half of this kernel
    w12 = [(Cwin[s] * ahw[s]) * ebp[s] + (Cwin[s] * avw[s]) * ebq[s]
           for s in range(P)]
    w34 = [(Cwin[s] * avw[s]) * ebp[s] + Cwin[s] * ebq[s]
           for s in range(P)]
    pdec = [p_scr[pl.ds(base + s, 1)].astype(jnp.float32) * psc
            for s in range(P)]
    qdec = [q_scr[pl.ds(base + s, 1)].astype(jnp.float32) * qsc
            for s in range(P)]
    # z-halo-needed direction coefficients (same f32 products as the XLA
    # path's precomputed fields); in-plane-only ones are built at center
    czzw = [nzw[s] * nzw[s] for s in range(P)]
    czyw = [2.0 * nzw[s] * nyw[s] for s in range(P)]
    czxw = [2.0 * nzw[s] * nxw[s] for s in range(P)]

    def _pad_y(a, lo, hi):
        return jnp.pad(a, ((0, 0), (lo, hi), (0, 0)))

    def _pad_x(a, lo, hi):
        return jnp.pad(a, ((0, 0), (0, 0), (lo, hi)))

    def d2y_c(m):
        """EXACT _d2_axis(m, 1) tree on a center slice."""
        out = c0 * m
        for s, coef in enumerate(cs, start=1):
            out = out + coef * (_pad_y(m[:, s:, :], 0, s)
                                + _pad_y(m[:, :-s, :], s, 0))
        return out * inv_dx2

    def d2x_c(m):
        out = c0 * m
        for s, coef in enumerate(cs, start=1):
            out = out + coef * (_pad_x(m[:, :, s:], 0, s)
                                + _pad_x(m[:, :, :-s], s, 0))
        return out * inv_dx2

    def d1y_c(m):
        """EXACT _d1_axis(m, 1) tree on a center slice."""
        out = None
        for s, c1 in enumerate(c1s, start=1):
            term = c1 * (_pad_y(m[:, s:, :], 0, s)
                         - _pad_y(m[:, :-s, :], s, 0))
            out = term if out is None else out + term
        return out * inv_dx

    def d1x_c(m):
        out = None
        for s, c1 in enumerate(c1s, start=1):
            term = c1 * (_pad_x(m[:, :, s:], 0, s)
                         - _pad_x(m[:, :, :-s], s, 0))
            out = term if out is None else out + term
        return out * inv_dx

    for t in range(T):
        s_c = hw + t
        czz_c, czy_c, czx_c = czzw[s_c], czyw[s_c], czxw[s_c]
        ny_c, nx_c = nyw[s_c], nxw[s_c]
        cyy_c = ny_c * ny_c
        cxx_c = nx_c * nx_c
        cyx_c = 2.0 * ny_c * nx_c

        def d2z_w(f):
            """EXACT _d2_axis(·, 0) tree on a window slice list."""
            out = c0 * f[s_c]
            for s, coef in enumerate(cs, start=1):
                out = out + coef * (f[s_c + s] + f[s_c - s])
            return out * inv_dx2

        def d1z_w(f):
            """EXACT _d1_axis(·, 0) tree on a window slice list."""
            out = None
            for s, c1 in enumerate(c1s, start=1):
                term = c1 * (f[s_c + s] - f[s_c - s])
                out = term if out is None else out + term
            return out * inv_dx

        def ht_of(w):
            """EXACT HT tree: Σ D_d(κ_d·w) with the H coefficients."""
            out = d2z_w([(1.0 - czzw[s]) * w[s] for s in range(P)])
            out = out + d2y_c((1.0 - cyy_c) * w[s_c])
            out = out + d2x_c((1.0 - cxx_c) * w[s_c])
            out = out - d1y_c(d1z_w([czyw[s] * w[s] for s in range(P)]))
            out = out - d1x_c(d1z_w([czxw[s] * w[s] for s in range(P)]))
            out = out - d1x_c(d1y_c(cyx_c * w[s_c]))
            return out

        def vt_of(w):
            out = d2z_w([czzw[s] * w[s] for s in range(P)])
            out = out + d2y_c(cyy_c * w[s_c])
            out = out + d2x_c(cxx_c * w[s_c])
            out = out + d1y_c(d1z_w([czyw[s] * w[s] for s in range(P)]))
            out = out + d1x_c(d1z_w([czxw[s] * w[s] for s in range(P)]))
            out = out + d1x_c(d1y_c(cyx_c * w[s_c]))
            return out

        def derivs(win):
            """EXACT derivs tree: (d2z, d2y, d2x, dzy, dzx, dyx)."""
            c_ = win[s_c]
            vz = d1z_w(win)
            return (d2z_w(win), d2y_c(c_), d2x_c(c_),
                    d1y_c(vz), d1x_c(vz), d1x_c(d1y_c(c_)))

        dp6 = derivs(pdec)
        dq6 = derivs(qdec)
        # H_of / V_of EXACT trees
        Hp = ((1.0 - czz_c) * dp6[0] + (1.0 - cyy_c) * dp6[1]
              + (1.0 - cxx_c) * dp6[2]
              - czy_c * dp6[3] - czx_c * dp6[4] - cyx_c * dp6[5])
        Vq = (czz_c * dq6[0] + cyy_c * dq6[1] + cxx_c * dq6[2]
              + czy_c * dq6[3] + czx_c * dq6[4] + cyx_c * dq6[5])

        ebp_c, ebq_c = ebp[s_c], ebq[s_c]
        C_c = Cwin[s_c]
        ah_c, av_c = ahw[s_c], avw[s_c]
        nz_c = nzw[s_c]
        gco_blk[pl.ds(t, 1)] = gc_blk[pl.ds(t, 1)] + (
            (ah_c * Hp + av_c * Vq) * ebp_c + (av_c * Hp + Vq) * ebq_c)
        gaho_blk[pl.ds(t, 1)] = gah_blk[pl.ds(t, 1)] + (C_c * Hp) * ebp_c
        gavo_blk[pl.ds(t, 1)] = gav_blk[pl.ds(t, 1)] + C_c * (
            Vq * ebp_c + Hp * ebq_c)
        # six per-derivative coefficient contributions, folded straight
        # into the three axis-component accumulators (EXACT bstep trees)
        dz_c = [C_c * ((av_c * q_d - ah_c * p_d) * ebp_c
                       + (q_d - av_c * p_d) * ebq_c)
                for p_d, q_d in zip(dp6, dq6)]
        dczz, dcyy, dcxx, dczy, dczx, dcyx = dz_c
        gnzo_blk[pl.ds(t, 1)] = gnz_blk[pl.ds(t, 1)] + (
            2.0 * nz_c * dczz + 2.0 * ny_c * dczy + 2.0 * nx_c * dczx)
        gnyo_blk[pl.ds(t, 1)] = gny_blk[pl.ds(t, 1)] + (
            2.0 * ny_c * dcyy + 2.0 * nz_c * dczy + 2.0 * nx_c * dcyx)
        gnxo_blk[pl.ds(t, 1)] = gnx_blk[pl.ds(t, 1)] + (
            2.0 * nx_c * dcxx + 2.0 * nz_c * dczx + 2.0 * ny_c * dcyx)

        ebp1 = ap2_blk[pl.ds(t, 1)] * planes[s_c]
        ebq1 = aq2_blk[pl.ds(t, 1)] * planes[s_c]
        apo_blk[pl.ds(t, 1)] = (2.0 * ebp_c + ht_of(w12)) - ebp1
        aqo_blk[pl.ds(t, 1)] = (2.0 * ebq_c + vt_of(w34)) - ebq1


# swept in-loop at 256³ (r5, int8 gradient fwd+rev, whole-sweep marginal):
# T=1 (budget 24/limit 44) → 5830 µs/step; T=2 (budget 36, declared
# ≈35 MB + ~16 MB window lists) CRASHED the TPU compiler subprocess —
# the ~18 live window slice lists put T=2 past the 44 MB scoped ceiling.
_TTI_ADJ_VMEM_BUDGET = 24 * 2**20
_TTI_ADJ_VMEM_LIMIT = 44 * 2**20


def tti_adjoint_step_tile(shape, order: int, store_itemsize: int = 4,
                          coeff_itemsize: int = 4):
    """Largest z tile for the TTI adjoint kernel: THREE f32 DMA rings
    (ap₁, aq₁, c²dt²) + five coefficient rings at their stored width + two
    history rings at theirs + 16 blocked f32 arrays (2 adjoint fields + 6
    accumulators, in+out), within ``_TTI_ADJ_VMEM_BUDGET``."""
    D, H, W = shape
    hw = len(_D2_COEFFS[order][1])
    for t in (8, 4, 2, 1):
        if D % t or t < hw:
            continue
        ring = 2 * (t + 2 * hw)
        vmem = (ring * (3 * 4 + 5 * coeff_itemsize + 2 * store_itemsize)
                + 2 * t * 16 * 4) * H * W
        if vmem <= _TTI_ADJ_VMEM_BUDGET:
            return t
    return None


def fits_tti_adjoint_pallas(shape, dtype, order: int, store: str = "f32",
                            coeff_itemsize: int = 4) -> bool:
    """True when the fused TTI adjoint sweep applies (3-D f32 grid,
    aligned minor dims; history AND coefficient dtypes tighten the sublane
    requirement)."""
    if len(shape) != 3 or jnp.dtype(dtype) != jnp.float32:
        return False
    if order not in _D2_COEFFS or store not in _STORE_DTYPES:
        return False
    D, H, W = shape
    if W % 128 != 0 or H % 8 != 0:
        return False
    sub = {"f32": 8, "bf16": 16, "int8": 32}[store]
    if H % sub != 0:
        return False
    if coeff_itemsize == 2 and H % 16 != 0:
        return False
    itemsize = jnp.dtype(_STORE_DTYPES[store]).itemsize
    return tti_adjoint_step_tile(shape, order, itemsize,
                                 coeff_itemsize) is not None


def fused_tti_adjoint_step(ap1, aq1, ap2, aq2, gC, gah, gav, gnz, gny, gnx,
                           C, ah, av, nz, ny, nx, p_enc, q_enc,
                           psc, qsc, inv_dx2, inv_dx, spz, sy, sx, *,
                           order: int = 2, interpret: bool = False):
    """One reverse-sweep step of the stored-wavefield 3-D TTI adjoint in a
    single slab-pipelined pass. Returns ``(ap_core, aq_core, gC', gah',
    gav', gnz', gny', gnx')`` — the transposed coupled update (HT/VT with
    coefficients inside the derivatives) plus all six gradient
    accumulations, with ``ap2→ap_core``, ``aq2→aq_core`` and every
    accumulator aliased in place. The five coefficient fields may be bf16
    (upcast in-register — the reduced-precision coefficient mode).
    Receiver injection Pᵀḡ is NOT included (ops/wave.py scatters it onto
    ``ap_core``). Raw kernel — no autodiff rules (it IS the adjoint)."""
    D, H, W = ap1.shape
    T = tti_adjoint_step_tile(ap1.shape, order, q_enc.dtype.itemsize,
                              jnp.dtype(ah.dtype).itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {ap1.shape}")
    hw = len(_D2_COEFFS[order][1])
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.stack([jnp.asarray(psc, jnp.float32),
                      jnp.asarray(qsc, jnp.float32),
                      jnp.asarray(inv_dx2, jnp.float32),
                      jnp.asarray(inv_dx, jnp.float32)])
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    ring_scr = [
        pltpu.VMEM((2 * (T + 2 * hw), H, W), d)
        for d in (jnp.float32, jnp.float32, jnp.float32,
                  ah.dtype, av.dtype, nz.dtype, ny.dtype, nx.dtype,
                  p_enc.dtype, q_enc.dtype)
    ]
    return pl.pallas_call(
        functools.partial(_tti_adjoint_kernel, T=T, D=D, H=H, W=W,
                          order=order),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((H, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, W), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ] + [vspec] * 8 + [pl.BlockSpec(memory_space=pl.ANY)] * 10,
        out_specs=[vspec] * 8,
        out_shape=[jax.ShapeDtypeStruct((D, H, W), jnp.float32)] * 8,
        scratch_shapes=ring_scr + [pltpu.SemaphoreType.DMA((10, 2, 3))],
        input_output_aliases=(
            {} if interpret else {4: 0, 5: 1, 6: 2, 7: 3, 8: 4, 9: 5,
                                  10: 6, 11: 7}),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_TTI_ADJ_VMEM_LIMIT),
        interpret=interpret,
    )(scal, spz, sy, sx, ap2, aq2, gC, gah, gav, gnz, gny, gnx,
      ap1, aq1, C, ah, av, nz, ny, nx, p_enc, q_enc)
