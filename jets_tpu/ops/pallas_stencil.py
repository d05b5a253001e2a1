"""Pallas TPU kernel for the 2-D Laplacian stencil.

The XLA shift-and-add stencil (``stencil._laplacian_df``) is already close
to the HBM bandwidth bound; this kernel exists to (a) pin the framework's
Pallas kernel path end-to-end (custom VMEM pipelines slot into the same
operator/gate machinery as XLA ops) and (b) serve as the template for fused
stencil epilogues (stencil + axpy in one HBM pass). Validated against the
XLA implementation by the test suite.

Design (guide: /opt/skills/guides/pallas_guide.md):

* overlapping row windows (a stencil needs one halo row each side) cannot be
  expressed with blocked BlockSpecs, so the input stays in ``ANY``/HBM and
  each grid step DMAs its panel into VMEM scratch manually;
* Mosaic requires DMA row slices aligned to the float32 sublane tile (8), so
  the input is pre-padded with EIGHT top rows (halo lives at scratch row
  7/8/9) and the per-panel window is ``tile + 16`` rows starting at the
  8-aligned offset ``i*tile``;
* lane dim is zero-padded to a multiple of 128 with a one-column halo offset;
  the three column shifts are in-VMEM vector slices.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["laplacian2d_pallas"]

_TOP = 8  # top padding rows: keeps every DMA offset/size 8-aligned


def _stencil_kernel(x_hbm, out_ref, scratch, sem, *, tile):
    i = pl.program_id(0)
    # aligned window [i*tile, i*tile + tile + 16) of the top-padded input;
    # logical output row j maps to scratch row j - i*tile + _TOP
    dma = pltpu.make_async_copy(
        x_hbm.at[pl.ds(i * tile, tile + 2 * _TOP), :],
        scratch,
        sem,
    )
    dma.start()
    dma.wait()
    c = scratch[_TOP : _TOP + tile, 1:-1]
    up = scratch[_TOP - 1 : _TOP + tile - 1, 1:-1]
    dn = scratch[_TOP + 1 : _TOP + tile + 1, 1:-1]
    lf = scratch[_TOP : _TOP + tile, :-2]
    rt = scratch[_TOP : _TOP + tile, 2:]
    out_ref[:, :] = -4.0 * c + up + dn + lf + rt


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def laplacian2d_pallas(x, *, tile: int = 256, interpret: bool = False):
    """5-point Laplacian with zero boundary on a 2-D float32 grid."""
    h, w = x.shape
    if h % tile:
        for t in (128, 64, 32, 16, 8):
            if h % t == 0:
                tile = t
                break
        else:
            raise ValueError(f"grid height {h} has no supported tile size")
    # row pad: _TOP zero rows on top, _TOP+tile slack on the bottom so the
    # last panel's full window stays in bounds; lane pad to a multiple of 128
    wp = ((w + 2 + 127) // 128) * 128
    xp = jnp.zeros((h + 3 * _TOP, wp), x.dtype)
    xp = xp.at[_TOP : _TOP + h, 1 : w + 1].set(x)

    grid = (h // tile,)
    out = pl.pallas_call(
        functools.partial(_stencil_kernel, tile=tile),
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
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
