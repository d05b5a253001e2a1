"""Example 08 — Reverse-time migration with production acquisition geometry.

Puts the deepened wave pack together the way a seismic imaging shop would:

* CPML absorbing boundaries (clean gathers — no sponge reflections
  contaminating the image),
* 8th-order spatial stencil (coarser grid per wavelength),
* an OFF-GRID receiver cable at fractional depth (Kaiser-windowed-sinc
  extraction — Hicks interpolation running as banded MXU matmuls inside
  the time loop),
* Born modeling for synthetic data, LSQR for the linearized image
  (RTM = the first adjoint application; least-squares migration = the
  full solve).

Run: ``python examples/08_rtm_imaging.py`` (CPU-friendly sizes).
"""
import os

import jax

# honor JAX_PLATFORMS even when a platform plugin overrides it
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

import jets_tpu as jt
from jets_tpu.ops.wave import (
    born_operator,
    cpml_wave_propagator,
    offgrid_wave_propagator,
    wave_propagator,
)
from jets_tpu.solvers import lsqr

n = 48
grid = (n, n)

# -- background model and a reflectivity anomaly -------------------------
c0 = jnp.full(grid, 2000.0, jnp.float32)
dc_true = jnp.zeros(grid, jnp.float32).at[28:32, 12:36].set(40.0)

# -- modeling operator: off-grid cable at depth 4.5 cells ------------------
F = offgrid_wave_propagator(
    grid,
    src_pos=(2.0, n / 2 - 0.5),                 # near-surface source
    rcv_depth=4.5,                              # fractional cable depth
    rcv_coords=jnp.linspace(4.0, n - 5.0, 24),  # fractional offsets
    nt=300, dt=0.0012, dx=10.0, freq=12.0,
    sponge_width=8, space_order=8, dtype=jnp.float32,
)
J = born_operator(F, c0)

# synthetic linearized data
d_obs = J(dc_true)
print(f"data energy: {float(J.rng.norm(d_obs)):.4e}")

# -- RTM image: one adjoint application ----------------------------------
image = J.T(d_obs)
peak = jnp.unravel_index(jnp.argmax(jnp.abs(image)), grid)
print(f"RTM peak at {tuple(int(i) for i in peak)} (true rows 28:32)")

# -- least-squares migration: a few LSQR iterations ----------------------
res = lsqr(J, d_obs, maxiter=6, tol=1e-7)
rel = float(J.rng.norm(J(res.x) - d_obs)) / float(J.rng.norm(d_obs))
print(f"LSM relative residual after 6 iterations: {rel:.3f}")

# -- CPML vs sponge boundary quality check --------------------------------
# record the FULL final wavefield snapshot: everything still in the domain
# after the wavefront has left is boundary reflection
kw = dict(nt=260, dt=0.0012, dx=10.0, freq=12.0,
          src_idx=n * (n // 2) + n // 2,
          rcv_idx=jnp.arange(n * n, dtype=jnp.int32),
          dtype=jnp.float32)
d_cpml = cpml_wave_propagator(grid, pml_width=8, cmax=2200.0, **kw)(c0)
d_spng = wave_propagator(grid, sponge_width=8, **kw)(c0)


def _reflected(tr):
    peak = float(jnp.max(jnp.abs(tr)))
    inner = tr[-1].reshape(grid)[12:-12, 12:-12]
    return float(jnp.max(jnp.abs(inner))) / peak


print(f"boundary reflection amplitude  cpml: {_reflected(d_cpml):.2e}   "
      f"sponge: {_reflected(d_spng):.2e}")
print("done")
