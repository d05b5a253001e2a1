"""Pallas TPU kernels for the 2-D Laplacian stencil.

Two generations, both validated bit-exactly against the XLA shift-and-add
stencil (``stencil._laplacian_df``) by the test suite:

* :func:`laplacian2d_pallas` (v2, default when the lane dim is 128-aligned)
  — **zero-copy**: the input stays in ANY/HBM unpadded; each grid step
  issues three predicated DMAs (center panel + 8-row top/bottom halos,
  everything sublane-8-aligned), zero-fills the halo rows at the grid
  boundary, and produces the column neighbors by in-register lane shifts
  (``jnp.pad`` of a VMEM value). No O(grid) pre-padding pass — this is what
  lets it match/beat the fused XLA stencil.
* the padded v1 path (kept as the fallback for unaligned widths) pre-pads
  the array on the host side — one extra full HBM round trip, measured ~2x
  the XLA time; retained because it handles any shape.

Design notes (guide: /opt/skills/guides/pallas_guide.md):

* overlapping row windows (a stencil needs one halo row each side) cannot
  be expressed with blocked BlockSpecs, so the input stays in ``ANY``/HBM
  and each grid step DMAs its panel into VMEM scratch manually;
* Mosaic requires DMA row slices aligned to the float32 sublane tile (8):
  halos are 8 rows even though only 1 is consumed;
* a ``wait()`` on a never-started DMA hangs — every halo DMA's start *and*
  wait sit under the same ``@pl.when`` predicate.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian2d_pallas"]

_TOP = 8  # sublane-aligned halo rows (only the row adjacent to the panel is used)


def _pick_tile(h, tile):
    # tile must divide h AND be sublane-aligned (multiple of 8): the v2
    # kernel's pl.multiple_of hints assert 8-alignment of i*tile, so an
    # unaligned tile would be a FALSE hint (silent miscompile risk on HW)
    if h % tile == 0 and tile % _TOP == 0:
        return tile
    for t in (256, 128, 64, 32, 16, 8):
        if h % t == 0:
            return t
    raise ValueError(f"grid height {h} has no supported tile size")


# ---------------------------------------------------------------------------
# v2 — zero-copy: unpadded HBM input, predicated halo DMAs, lane shifts
# ---------------------------------------------------------------------------


def _stencil_kernel_v2(x_hbm, out_ref, scratch, sems, *, tile, h, w):
    i = pl.program_id(0)
    npanels = h // tile

    dma_c = pltpu.make_async_copy(
        x_hbm.at[pl.ds(pl.multiple_of(i * tile, _TOP), tile), :],
        scratch.at[pl.ds(_TOP, tile), :],
        sems.at[0],
    )
    dma_c.start()

    def top_dma():
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of(i * tile - _TOP, _TOP), _TOP), :],
            scratch.at[pl.ds(0, _TOP), :],
            sems.at[1],
        )

    def bot_dma():
        return pltpu.make_async_copy(
            x_hbm.at[pl.ds(pl.multiple_of((i + 1) * tile, _TOP), _TOP), :],
            scratch.at[pl.ds(_TOP + tile, _TOP), :],
            sems.at[2],
        )

    @pl.when(i > 0)
    def _():
        top_dma().start()

    @pl.when(i == 0)
    def _():
        scratch[0:_TOP, :] = jnp.zeros((_TOP, w), scratch.dtype)

    @pl.when(i < npanels - 1)
    def _():
        bot_dma().start()

    @pl.when(i == npanels - 1)
    def _():
        scratch[_TOP + tile:, :] = jnp.zeros((_TOP, w), scratch.dtype)

    dma_c.wait()

    @pl.when(i > 0)
    def _():
        top_dma().wait()

    @pl.when(i < npanels - 1)
    def _():
        bot_dma().wait()

    c = scratch[_TOP:_TOP + tile, :]
    up = scratch[_TOP - 1:_TOP + tile - 1, :]
    dn = scratch[_TOP + 1:_TOP + tile + 1, :]
    lf = jnp.pad(c[:, :-1], ((0, 0), (1, 0)))  # zero boundary at col 0
    rt = jnp.pad(c[:, 1:], ((0, 0), (0, 1)))  # zero boundary at col w-1
    out_ref[:, :] = -4.0 * c + up + dn + lf + rt


def _laplacian2d_v2(x, tile, interpret):
    h, w = x.shape
    grid = (h // tile,)
    return pl.pallas_call(
        functools.partial(_stencil_kernel_v2, tile=tile, h=h, w=w),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile, w), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, w), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _TOP, w), x.dtype),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(x)


# ---------------------------------------------------------------------------
# v1 — padded fallback for lane-unaligned widths
# ---------------------------------------------------------------------------


def _stencil_kernel_v1(x_hbm, out_ref, scratch, sem, *, tile):
    i = pl.program_id(0)
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile, tile + 2 * _TOP), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    c = scratch[_TOP:_TOP + tile, 1:-1]
    up = scratch[_TOP - 1:_TOP + tile - 1, 1:-1]
    dn = scratch[_TOP + 1:_TOP + tile + 1, 1:-1]
    lf = scratch[_TOP:_TOP + tile, :-2]
    rt = scratch[_TOP:_TOP + tile, 2:]
    out_ref[:, :] = -4.0 * c + up + dn + lf + rt


def _laplacian2d_v1(x, tile, interpret):
    h, w = x.shape
    wp = ((w + 2 + 127) // 128) * 128
    xp = jnp.zeros((h + 3 * _TOP, wp), x.dtype)
    xp = xp.at[_TOP:_TOP + h, 1:w + 1].set(x)
    grid = (h // tile,)
    out = pl.pallas_call(
        functools.partial(_stencil_kernel_v1, tile=tile),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(
            (tile, wp - 2), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((h, wp - 2), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((tile + 2 * _TOP, wp), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(xp)
    return out[:, :w]


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def laplacian2d_pallas(x, *, tile: int = 256, interpret: bool = False):
    """5-point Laplacian with zero boundary on a 2-D float32 grid."""
    h, w = x.shape
    tile = _pick_tile(h, tile)
    if w % 128 == 0:
        return _laplacian2d_v2(x, tile, interpret)
    return _laplacian2d_v1(x, tile, interpret)
