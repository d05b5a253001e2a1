"""Scaling-efficiency harness — iterations/s at 1, 2, 4, ... devices
(the BASELINE target: ≥80% iterations/s scaling efficiency at N≥2 hosts).

The contract is WEAK scaling, which is what block (shot) parallelism
promises: each device carries a FIXED number of shots (``--shots`` is the
per-device count), so an N-device run solves an N×-larger multi-shot
problem, and efficiency is simply ``iters_per_s(N) / iters_per_s(1)`` —
it measures exactly the per-iteration cost added by the collectives (the
two psum/all-reduce rounds of the LSQR body). Strong scaling of a
fixed-size Krylov solve is NOT the target: an iteration is a sequential
critical path, and the per-iteration work here is HBM-bound model sweeps
that do not shrink with more shots' devices.

On real multi-chip hardware this measures ICI scaling of the distributed
LSQR (block-sharded shots, psum adjoint). On a single-chip session run it
with the virtual CPU backend to validate the harness and the collective
paths — NOTE the virtual devices share one host's cores, so N× the work
on the same silicon cannot hold iters/s constant; the virtual-CPU curve
validates correctness/structure, not ICI bandwidth:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --grid 256 --shots 4

Timing uses the same cache/async-proof methodology as bench.py: marginal
cost between two iteration budgets, distinct inputs per repetition, scalar
host reads to force completion.
"""
import argparse
import json
import os
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jets_tpu_jax_cache")
# The session's TPU plugin can override JAX_PLATFORMS programmatically;
# honor an explicit env request through the config API (as tests do).
if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp

from jets_tpu.models.seismic import make_seismic_problem
from jets_tpu.parallel.sharded import make_block_mesh, shard_blocks
from jets_tpu.solvers import lsqr


def _marginal_iters_per_s(A, d_obs, lo, hi, mesh=None):
    bs = [d_obs * (1.0 + 1e-5 * i) for i in range(4)]
    if mesh is not None:
        bs = [shard_blocks(b, mesh) for b in bs]
    jax.block_until_ready(bs)

    def timed(maxiter):
        r = lsqr(A, bs[0], maxiter=maxiter, tol=0.0)
        float(r.resnorm)
        ts = []
        for b in bs[1:]:
            t0 = time.perf_counter()
            r = lsqr(A, b, maxiter=maxiter, tol=0.0)
            float(r.resnorm)  # scalar read forces completion
            ts.append(time.perf_counter() - t0)
        return min(ts)

    t_lo = timed(lo)
    t_hi = timed(hi)
    return (hi - lo) / max(t_hi - t_lo, 1e-9)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--grid", type=int, default=512)
    ap.add_argument("--shots", type=int, default=8,
                    help="shots PER DEVICE (weak scaling)")
    ap.add_argument("--nrecv", type=int, default=1024)
    ap.add_argument("--lo", type=int, default=50)
    ap.add_argument("--hi", type=int, default=550)
    ap.add_argument("--counts", type=str, default="",
                    help="comma-separated device counts (default: powers of 2)")
    args = ap.parse_args()

    n_avail = len(jax.devices())
    if args.counts:
        counts = [int(c) for c in args.counts.split(",")]
    else:
        counts = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    rows = []
    base = None
    for n in counts:
        mesh = make_block_mesh(n) if n > 1 else None
        nshots = args.shots * n  # weak scaling: fixed per-device shot count
        A, m_true, d_obs = make_seismic_problem(
            (args.grid, args.grid), nshots, args.nrecv, seed=0,
            mesh=mesh, noise=0.05, dtype=jnp.float32,
        )
        ips = _marginal_iters_per_s(A, d_obs, args.lo, args.hi, mesh=mesh)
        if base is None:
            base = ips
        eff = ips / base  # weak-scaling efficiency: iters/s vs 1 device
        rows.append({"devices": n, "shots": nshots,
                     "iters_per_s": round(ips, 2),
                     "scaling_efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({
        "metric": "lsqr_weak_scaling_iters_per_s",
        "shots_per_device": args.shots,
        "grid": args.grid,
        "device": str(jax.devices()[0].platform),
        "note": ("virtual-CPU devices share one host's cores: the curve "
                 "validates the collective structure, not ICI bandwidth"
                 if jax.devices()[0].platform == "cpu" else
                 "real-hardware ICI scaling"),
        "rows": rows,
    }))


if __name__ == "__main__":
    main()
