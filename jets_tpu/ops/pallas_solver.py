"""Pallas TPU kernels for the HBM-bound solver tail (3-D flagship regime).

Round-1 measured the 3-D (256³) LSQR at 1.19 ms/iter against a ~0.8 ms HBM
roofline; profiling this round showed the loss is NOT in any single op but
in XLA's scheduling of the big while-loop body: the isolated segments hit
roofline, the composed body does not (extra full-grid async copies and
de-fused passes appear once x/w join the carry). These kernels pin the two
dominant segments to their minimal HBM pass counts; measured on TPU v5e
(256³ f32):

* :func:`xw_update` — the LSQR search/solution update
  ``x' = x + t1·w,  w' = inv_a·vh + t2·w`` as ONE two-output aliased pass
  (5 HBM touches). Swapping it into the real 3-D LSQR body: 1.194 →
  0.781 ms/iter.
* :func:`lap3d_axpy_norm2` — ``vh = ∆z + s·v`` with ``‖vh‖²`` accumulated
  in the same pass: the z volume is DMA'd slab-by-slab from HBM exactly
  once through a double-buffered VMEM ring (one slab of prefetch), so the
  whole fused op is 3 HBM touches. Standalone loop: 301 µs vs 936 µs for
  the XLA pad+sweep+axpy+norm chain (3.1×). The stencil add order matches
  ``ops/stencil.laplacian_nd`` BIT-EXACTLY (verified at s=0).
* :func:`laplacian3d` — the same slab pipeline without the axpy/norm
  epilogue (slab-pipelined double-buffered DMA ring over the z axis).

All kernels run in interpret mode on CPU (correctness tests); the solver
fast paths only select them on the TPU backend in the HBM regime (arrays
too large for VMEM-resident carries — small models keep the XLA path,
which wins there by staying in VMEM across iterations).

Guide: /opt/skills/guides/pallas_guide.md (double-buffering pattern,
predicated DMAs; a wait on a never-started DMA hangs, so every start/wait
pair sits under the same predicate).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "xw_update",
    "lsmr_update",
    "cg_update",
    "p_update",
    "lap3d_axpy_norm2",
    "laplacian3d",
    "fits_xw_pallas",
    "fits_lsmr_pallas",
    "fits_cg_pallas",
    "HBM_REGIME_BYTES",
]

# below this, Krylov carries stay VMEM-resident across while_loop iterations
# and the XLA path wins (measured: 2-D 2048² runs at ≳2.5 TB/s effective);
# above it, arrays stream from HBM and the fused Pallas passes win.
HBM_REGIME_BYTES = 32 * 2**20


# ---------------------------------------------------------------------------
# x/w update: one aliased two-output elementwise pass
# ---------------------------------------------------------------------------


def _xw_kernel(s_ref, x_ref, w_ref, vh_ref, xo_ref, wo_ref):
    t1 = s_ref[0]
    t2 = s_ref[1]
    inv_a = s_ref[2]
    w = w_ref[...]
    xo_ref[...] = x_ref[...] + t1 * w
    wo_ref[...] = inv_a * vh_ref[...] + t2 * w


def _xw_tile(shape, itemsize):
    """Largest leading-dim tile with 5 live blocks double-buffered within
    ~12 MB of VMEM (measured: (8,256,256) f32 blocks OOM at the 16 MB
    scoped limit; budget conservatively)."""
    rest = math.prod(shape[1:]) if len(shape) > 1 else 1
    budget = (12 * 2**20) // (10 * itemsize * max(rest, 1))
    for t in (16, 8, 4, 2, 1):
        if shape[0] % t == 0 and t <= budget:
            return t
    return None


def fits_xw_pallas(x) -> bool:
    """True if the Pallas x/w update applies: plain f32 array, lane-aligned
    minor dim, tileable leading dim, HBM regime."""
    if not isinstance(x, jax.Array) and not hasattr(x, "shape"):
        return False
    if x.dtype != jnp.float32 or x.ndim < 2:
        return False
    if x.shape[-1] % 128 != 0:
        return False
    if x.size * x.dtype.itemsize < HBM_REGIME_BYTES:
        return False
    return _xw_tile(x.shape, 4) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def xw_update(x, w, vh, t1, t2, inv_a, *, interpret: bool = False):
    """``(x + t1*w, inv_a*vh + t2*w)`` in one two-output pass with the
    ``x``/``w`` buffers aliased in place (5 HBM touches total)."""
    shape = x.shape
    T = _xw_tile(shape, x.dtype.itemsize)
    grid = (shape[0] // T,)
    blk = (T,) + shape[1:]
    idx = lambda i: (i,) + (0,) * (len(shape) - 1)  # noqa: E731
    scal = jnp.stack([
        jnp.asarray(t1, x.dtype), jnp.asarray(t2, x.dtype),
        jnp.asarray(inv_a, x.dtype),
    ])
    return pl.pallas_call(
        _xw_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        ],
        out_shape=[jax.ShapeDtypeStruct(shape, x.dtype)] * 2,
        # in-place aliasing of the x/w buffers — skipped in interpret mode,
        # where the eager aliasing clobbers blocks the kernel still reads
        input_output_aliases={} if interpret else {1: 0, 2: 1},
        interpret=interpret,
    )(scal, x, w, vh)


# ---------------------------------------------------------------------------
# LSMR update: h/hbar/x in one aliased three-output pass
# ---------------------------------------------------------------------------


def _lsmr_kernel(s_ref, vh_ref, h_ref, hbar_ref, x_ref, ho_ref, hbo_ref,
                 xo_ref):
    c_hb = s_ref[0]
    c_x = s_ref[1]
    c_h = s_ref[2]
    inv_a = s_ref[3]
    h = h_ref[...]
    hbar_n = h + c_hb * hbar_ref[...]
    xo_ref[...] = x_ref[...] + c_x * hbar_n
    hbo_ref[...] = hbar_n
    ho_ref[...] = inv_a * vh_ref[...] + c_h * h


def _update_tile(shape, itemsize, live_blocks):
    """Largest leading-dim tile keeping ``live_blocks`` double-buffered
    blocks within ~12 MB of VMEM."""
    rest = math.prod(shape[1:]) if len(shape) > 1 else 1
    budget = (12 * 2**20) // (2 * live_blocks * itemsize * max(rest, 1))
    for t in (16, 8, 4, 2, 1):
        if shape[0] % t == 0 and t <= budget:
            return t
    return None


def fits_lsmr_pallas(x) -> bool:
    if not hasattr(x, "shape") or x.dtype != jnp.float32 or x.ndim < 2:
        return False
    if x.shape[-1] % 128 != 0:
        return False
    if x.size * x.dtype.itemsize < HBM_REGIME_BYTES:
        return False
    return _update_tile(x.shape, 4, 7) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def lsmr_update(v_hat, h, hbar, x, c_hb, c_x, c_h, inv_a, *,
                interpret: bool = False):
    """The LSMR model-space tail in ONE aliased three-output pass
    (7 HBM touches — the minimum for its dependency structure)::

        hbar' = h + c_hb·hbar
        x'    = x + c_x·hbar'
        h'    = inv_a·v_hat + c_h·h

    (``v_hat`` is the UNNORMALIZED Golub-Kahan vector; the ``1/alpha``
    folds in here, eliminating the separate normalization pass — the same
    deferred-normalization trick LSQR uses.) Returns ``(h', hbar', x')``.
    """
    shape = x.shape
    T = _update_tile(shape, x.dtype.itemsize, 7)
    grid = (shape[0] // T,)
    blk = (T,) + shape[1:]
    idx = lambda i: (i,) + (0,) * (len(shape) - 1)  # noqa: E731
    scal = jnp.stack([
        jnp.asarray(c_hb, x.dtype), jnp.asarray(c_x, x.dtype),
        jnp.asarray(c_h, x.dtype), jnp.asarray(inv_a, x.dtype),
    ])
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _lsmr_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 4,
        out_specs=[vspec] * 3,
        out_shape=[jax.ShapeDtypeStruct(shape, x.dtype)] * 3,
        input_output_aliases={} if interpret else {2: 0, 3: 1, 4: 2},
        interpret=interpret,
    )(scal, v_hat, h, hbar, x)


# ---------------------------------------------------------------------------
# CG update: x/r in one aliased pass with the new rho accumulated in-pass
# ---------------------------------------------------------------------------


def _cg_kernel(s_ref, x_ref, r_ref, p_ref, q_ref, xo_ref, ro_ref, acc_ref):
    i = pl.program_id(0)
    alpha = s_ref[0]
    xo_ref[...] = x_ref[...] + alpha * p_ref[...]
    rn = r_ref[...] - alpha * q_ref[...]
    ro_ref[...] = rn

    @pl.when(i == 0)
    def _():
        acc_ref[...] = jnp.zeros((1, 1), acc_ref.dtype)

    acc_ref[...] += jnp.sum(rn * rn).reshape(1, 1)


def fits_cg_pallas(x) -> bool:
    if not hasattr(x, "shape") or x.dtype != jnp.float32 or x.ndim < 2:
        return False
    if x.shape[-1] % 128 != 0:
        return False
    if x.size * x.dtype.itemsize < HBM_REGIME_BYTES:
        return False
    return _update_tile(x.shape, 4, 6) is not None


@functools.partial(jax.jit, static_argnames=("interpret",))
def cg_update(x, r, p, q, alpha, *, interpret: bool = False):
    """CG's solution/residual update ``x' = x + α·p, r' = r − α·q`` with
    ``rho' = ‖r'‖²`` accumulated in the same pass — 6 HBM touches; returns
    ``(x', r', rho')``. (The un-preconditioned CG's rho IS the squared
    residual norm, so the stopping-test reduction disappears too.)"""
    shape = x.shape
    T = _update_tile(shape, x.dtype.itemsize, 6)
    grid = (shape[0] // T,)
    blk = (T,) + shape[1:]
    idx = lambda i: (i,) + (0,) * (len(shape) - 1)  # noqa: E731
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    scal = jnp.asarray(alpha, x.dtype)[None]
    xo, ro, acc = pl.pallas_call(
        _cg_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [vspec] * 4,
        out_specs=[vspec, vspec,
                   pl.BlockSpec((1, 1), lambda i: (0, 0),
                                memory_space=pltpu.VMEM)],
        out_shape=[jax.ShapeDtypeStruct(shape, x.dtype)] * 2
        + [jax.ShapeDtypeStruct((1, 1), x.dtype)],
        input_output_aliases={} if interpret else {1: 0, 2: 1},
        interpret=interpret,
    )(scal, x, r, p, q)
    return xo, ro, acc[0, 0]


def _p_kernel(s_ref, r_ref, p_ref, po_ref):
    po_ref[...] = r_ref[...] + s_ref[0] * p_ref[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def p_update(r, p, beta, *, interpret: bool = False):
    """CG's search-direction update ``p' = r + β·p`` as one aliased pass
    (3 HBM touches)."""
    shape = r.shape
    T = _update_tile(shape, r.dtype.itemsize, 3)
    grid = (shape[0] // T,)
    blk = (T,) + shape[1:]
    idx = lambda i: (i,) + (0,) * (len(shape) - 1)  # noqa: E731
    vspec = pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM)
    scal = jnp.asarray(beta, r.dtype)[None]
    return pl.pallas_call(
        _p_kernel,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), vspec, vspec],
        out_specs=vspec,
        out_shape=jax.ShapeDtypeStruct(shape, r.dtype),
        input_output_aliases={} if interpret else {2: 0},
        interpret=interpret,
    )(scal, r, p)


# ---------------------------------------------------------------------------
# 3-D Laplacian slab pipeline (+ optional axpy/norm epilogue)
# ---------------------------------------------------------------------------


def _lap3d_kernel(s_ref, z_hbm, *rest, T, D, H, W, with_axpy):
    if with_axpy:
        v_blk, out_blk, acc_ref, scratch, sems = rest
    else:
        out_blk, scratch, sems = rest
    i = pl.program_id(0)
    nsl = D // T
    two = jnp.asarray(2, i.dtype)  # x64 sessions: match program_id's int32
    slot = lax.rem(i, two)
    nslot = lax.rem(i + 1, two)
    P = T + 2  # slab slices incl. one halo slice per side

    def center_dma(j, sl):
        return pltpu.make_async_copy(
            z_hbm.at[pl.ds(j * T, T)],
            scratch.at[pl.ds(sl * P + 1, T)],
            sems.at[sl, 0],
        )

    def front_dma(j, sl):
        return pltpu.make_async_copy(
            z_hbm.at[pl.ds(j * T - 1, 1)],
            scratch.at[pl.ds(sl * P, 1)],
            sems.at[sl, 1],
        )

    def back_dma(j, sl):
        return pltpu.make_async_copy(
            z_hbm.at[pl.ds(j * T + T, 1)],
            scratch.at[pl.ds(sl * P + 1 + T, 1)],
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
            scratch[pl.ds(sl * P, 1)] = jnp.zeros((1, H, W), scratch.dtype)

        @pl.when(j < nsl - 1)
        def _():
            back_dma(j, sl).wait()

        @pl.when(j == nsl - 1)
        def _():
            scratch[pl.ds(sl * P + 1 + T, 1)] = jnp.zeros(
                (1, H, W), scratch.dtype
            )

    @pl.when(i == 0)
    def _():
        start_slab(0, 0)

    @pl.when(i + 1 < nsl)
    def _():
        start_slab(i + 1, nslot)  # one slab of prefetch

    wait_slab(i, slot)

    base = slot * P
    c = scratch[pl.ds(base + 1, T)]
    zlo = scratch[pl.ds(base, T)]
    zhi = scratch[pl.ds(base + 2, T)]
    ylo = jnp.pad(c[:, :-1, :], ((0, 0), (1, 0), (0, 0)))
    yhi = jnp.pad(c[:, 1:, :], ((0, 0), (0, 1), (0, 0)))
    xlo = jnp.pad(c[:, :, :-1], ((0, 0), (0, 0), (1, 0)))
    xhi = jnp.pad(c[:, :, 1:], ((0, 0), (0, 0), (0, 1)))
    # EXACT add order of ops/stencil.laplacian_nd (bit-exactness contract):
    # ((((((-2nd·c) + zlo) + zhi) + ylo) + yhi) + xlo) + xhi
    lap = (((((-6.0 * c + zlo) + zhi) + ylo) + yhi) + xlo) + xhi
    if with_axpy:
        vh = lap + s_ref[0] * v_blk[...]
        out_blk[...] = vh

        @pl.when(i == 0)
        def _():
            acc_ref[...] = jnp.zeros((1, 1), acc_ref.dtype)

        acc_ref[...] += jnp.sum(vh * vh).reshape(1, 1)
    else:
        out_blk[...] = lap


def _lap3d_tile(D, H, W, itemsize):
    # scratch ring 2*(T+2) slices + (v,out) blocks double-buffered
    for t in (8, 4, 2, 1):
        if D % t:
            continue
        vmem = (2 * (t + 2) + 4 * t) * H * W * itemsize
        if vmem <= 12 * 2**20:
            return t
    return None


@functools.partial(jax.jit, static_argnames=("interpret",))
def lap3d_axpy_norm2(z, v, s, *, interpret: bool = False):
    """Fused ``vh = laplacian_nd(z) + s*v`` and ``n2 = sum(vh**2)`` in a
    single slab-pipelined HBM pass (3 touches). Returns ``(vh, n2)``."""
    D, H, W = z.shape
    T = _lap3d_tile(D, H, W, z.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {z.shape}")
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    scal = jnp.asarray(s, z.dtype)[None]
    vh, acc = pl.pallas_call(
        functools.partial(_lap3d_kernel, T=T, D=D, H=H, W=W, with_axpy=True),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((D, H, W), z.dtype),
            jax.ShapeDtypeStruct((1, 1), z.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2), H, W), z.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(scal, z, v)
    return vh, acc[0, 0]


@functools.partial(jax.jit, static_argnames=("interpret",))
def laplacian3d(z, *, interpret: bool = False):
    """7-point Laplacian, zero boundary, bit-exact vs ``laplacian_nd`` —
    the 3-D slab-pipelined extension of ``laplacian2d_pallas``."""
    D, H, W = z.shape
    T = _lap3d_tile(D, H, W, z.dtype.itemsize)
    if T is None:
        raise ValueError(f"no VMEM-feasible slab tile for shape {z.shape}")
    blk = (T, H, W)
    idx = lambda i: (i, 0, 0)  # noqa: E731
    dummy = jnp.zeros((1,), z.dtype)  # keep arg structure (s unused)
    return pl.pallas_call(
        functools.partial(_lap3d_kernel, T=T, D=D, H=H, W=W,
                          with_axpy=False),
        grid=(D // T,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(blk, idx, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, H, W), z.dtype),
        scratch_shapes=[
            pltpu.VMEM((2 * (T + 2), H, W), z.dtype),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
        interpret=interpret,
    )(dummy, z)
