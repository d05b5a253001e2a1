"""Worker process for ``test_multiprocess.py`` — one JAX process of a
local multi-process "pod" (CPU backend, N virtual devices per process).

This is the genuinely multi-process path of the distribution layer
(DistributedJets.jl equivalent: per-worker block rows,
``/root/reference/docs/src/index.md:15``, adjoint reduction structure
``src/Jets.jl:1034-1057``): ``jax.distributed.initialize`` against a local
coordinator, a global mesh spanning devices this process can NOT address,
host-local data creation for only its own block range, global-array
assembly from per-process slabs, and a distributed LSQR solve.

Invoked as::

    python _mp_worker.py <port> <nprocs> <pid> <nlocal_devices> <outfile>

Process 0 writes the solve result to ``outfile`` (npz). Every process
asserts the structural facts (partial local range, non-addressable global
arrays) so a silent fallback to single-process semantics fails loudly.
"""
import os
import sys


def main():
    port, nprocs, pid, nlocal, out = sys.argv[1:6]
    nprocs, pid, nlocal = int(nprocs), int(pid), int(nlocal)

    # env BEFORE importing jax: CPU backend with nlocal virtual devices
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={nlocal}"
    ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    import jax.numpy as jnp
    import numpy as np

    from jets_tpu.parallel import runner
    from jets_tpu.parallel.sharded import make_block_mesh

    my_pid = runner.init_distributed(f"127.0.0.1:{port}", nprocs, pid)
    assert my_pid == pid, (my_pid, pid)
    assert jax.process_count() == nprocs
    assert len(jax.devices()) == nprocs * nlocal
    assert len(jax.local_devices()) == nlocal

    mesh = make_block_mesh()  # all devices of the "pod", axis "block"

    NSHOTS, NRECV, GRID = 16, 64, (12, 12)
    lo, hi = runner.local_block_range(NSHOTS, mesh)
    # the local range must be genuinely PARTIAL — the whole point
    assert hi - lo == NSHOTS // nprocs, (lo, hi)
    assert lo == pid * (NSHOTS // nprocs)

    from jets_tpu.models.seismic import make_seismic_operator
    from jets_tpu.solvers import lsqr

    A = make_seismic_operator(
        GRID, NSHOTS, NRECV, jax.random.PRNGKey(3), mesh=mesh,
        dtype=jnp.float64,
    )
    # the operator's stacked per-shot state must be a GLOBAL array whose
    # remote shards this process cannot address
    wr = A.jet.state["bstate"]["wr"]
    assert not wr.is_fully_addressable

    # host-local data creation: deterministic per-shot gathers, this
    # process materializes ONLY its own [lo, hi) slab...
    d_local = np.stack(
        [
            np.random.default_rng(1000 + s).standard_normal(NRECV)
            for s in range(lo, hi)
        ]
    )
    # ...then the global sharded data array is assembled with no cross-host
    # data movement
    d = runner.assemble_global(d_local, (NSHOTS, NRECV), mesh)
    assert not d.is_fully_addressable

    res = lsqr(A, d, maxiter=40, tol=0.0)
    # the model is replicated (adjoint psum out_specs P()) — every device
    # holds the full solution
    x = np.asarray(res.x.addressable_data(0))
    resnorm = float(res.resnorm)
    iters = int(res.iterations)
    assert iters == 40

    if pid == 0:
        np.savez(out, x=x, resnorm=resnorm, lo=lo, hi=hi)

    jax.distributed.shutdown()


if __name__ == "__main__":
    main()
