"""Headline benchmark: LSQR iterations/s on the multi-shot seismic-style
linearized inversion (BASELINE.json north star), single chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

The reference publishes no numbers (BASELINE.md), so ``vs_baseline`` is
measured against the round-1 recorded value (NOMINAL_BASELINE) to track
regression/progress across rounds.
"""
import json
import time

import jax
import jax.numpy as jnp

from jets_tpu.models.seismic import make_seismic_problem
from jets_tpu.solvers import lsqr

# round-1 nominal: lsqr iterations/s on (512,512) grid, 32 shots, 1024 recv,
# float32, single TPU v5e chip. Updated only when the benchmark config changes.
NOMINAL_BASELINE = 421.6  # round-1 measured value on TPU v5e

GRID = (512, 512)
NSHOTS = 32
NRECV = 1024
MAXITER = 50


def main():
    A, m_true, d_obs = make_seismic_problem(
        GRID, NSHOTS, NRECV, seed=0, dtype=jnp.float32
    )

    # ---- LSQR iterations/s ----
    res = lsqr(A, d_obs, maxiter=MAXITER, tol=0.0)  # compile + warmup
    jax.block_until_ready(res.x)
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        res = lsqr(A, d_obs, maxiter=MAXITER, tol=0.0)
        jax.block_until_ready(res.x)
        times.append(time.perf_counter() - t0)
    dt = min(times)
    iters_per_s = MAXITER / dt

    # ---- matvecs/s (forward applies) ----
    fwd = jax.jit(lambda op, m: op(m))
    d = fwd(A, m_true)
    jax.block_until_ready(d)
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        d = fwd(A, m_true)
    jax.block_until_ready(d)
    matvecs_per_s = n / (time.perf_counter() - t0)

    resid_rel = float(res.resnorm) / float(A.rng.norm(d_obs))

    print(
        json.dumps(
            {
                "metric": "lsqr_iterations_per_s",
                "value": round(iters_per_s, 3),
                "unit": "iter/s",
                "vs_baseline": round(iters_per_s / NOMINAL_BASELINE, 3),
                "matvecs_per_s": round(matvecs_per_s, 3),
                "relative_residual_after_50_iters": round(resid_rel, 6),
                "config": f"grid={GRID}, nshots={NSHOTS}, nrecv={NRECV}, f32",
                "device": str(jax.devices()[0]),
            }
        )
    )


if __name__ == "__main__":
    main()
