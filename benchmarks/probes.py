"""Kernel decomposition probes — the measurement tools behind the docs §7
round-5 analyses (run on the real TPU; each prints µs/step, marginal
between two trip counts per CLAUDE.md's timing rules).

    python benchmarks/probes.py vti-reverse    # isolated VTI reverse loop
    python benchmarks/probes.py tti-reverse    # isolated TTI reverse loop
    python benchmarks/probes.py iso-reverse    # isolated iso reverse loop

The structural-floor variants (same rings/blocks/tile, trivial compute)
and the rejected two-step time-skewed kernel live in the docs narrative;
these isolated-loop probes are the reusable halves: they separate the
KERNEL's in-loop cost from the scan plumbing (history slicing, receiver
injection, carry management) that the whole-gradient bench stages
include. Measured r5 at 256³ int8: iso 532 (≈ its 510 bound), VTI 1484
(= its 1490 structure floor), TTI 3586 (1.8× its 2008 raw-touch bound —
compute/granularity-bound at T=1).
"""
import sys
import time

import jax

jax.config.update("jax_compilation_cache_dir", "/tmp/jets_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import jax.numpy as jnp
from jax import lax

SH = (256, 256, 256)
D, H, W = SH
KEY = jax.random.PRNGKey(0)
SZ = jnp.linspace(0.9, 1.0, D, dtype=jnp.float32)
SY = jnp.linspace(0.8, 1.0, H, dtype=jnp.float32).reshape(H, 1)
SX = jnp.linspace(0.7, 1.0, W, dtype=jnp.float32).reshape(1, W)


def _timed(fn, n, args, reps=3):
    f = jax.jit(fn)
    float(f(n, jnp.float32(0.0), args))
    ts = []
    for r in range(1, reps + 1):
        t0 = time.perf_counter()
        float(f(n, jnp.float32(1e-6 * r), args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def _marginal(fn, args, lo=5, hi=55):
    # each loop iteration runs a PAIR of steps
    return (_timed(fn, hi, args) - _timed(fn, lo, args)) \
        / (2 * (hi - lo)) * 1e6


def _rand(k, dtype=jnp.float32, lo=None, hi=None):
    kk = jax.random.fold_in(KEY, k)
    if dtype == jnp.int8:
        return jax.random.randint(kk, SH, -127, 127, jnp.int8)
    if lo is not None:
        return jax.random.uniform(kk, SH, jnp.float32) * (hi - lo) + lo
    return jax.random.normal(kk, SH, jnp.float32)


def iso_reverse():
    from jets_tpu.ops.pallas_wave import fused_adjoint_step

    fields = jax.block_until_ready(jax.jit(lambda: (
        _rand(1, lo=0.5, hi=1.5), _rand(2, jnp.int8)))())

    def loop(n, seed, fields):
        c2, u8 = fields
        z = jnp.zeros(SH, jnp.float32)
        carry = (z + seed, z, z)

        def body(i, carry):
            a1, a2, g = carry
            hi_, g = fused_adjoint_step(a1, a2, g, c2, u8,
                                        jnp.float32(1 / 127), SZ, SY, SX,
                                        order=2)
            lo_, g = fused_adjoint_step(hi_, a1, g, c2, u8,
                                        jnp.float32(1 / 127), SZ, SY, SX,
                                        order=2)
            return (lo_, hi_, g)

        out = lax.fori_loop(0, n, body, carry)
        return sum(jnp.sum(x) for x in out)

    us = _marginal(loop, fields)
    print(f"iso reverse isolated: {us:.0f} us/step "
          f"(raw 6.25-touch bound ~{6.25*D*H*W*4/819e9*1e6:.0f})")


def vti_reverse():
    from jets_tpu.ops.pallas_wave import fused_vti_adjoint_step

    fields = jax.block_until_ready(jax.jit(lambda: (
        _rand(1, lo=0.5, hi=1.5), _rand(2, lo=1.0, hi=2.0),
        _rand(3, lo=1.0, hi=2.0), _rand(4, jnp.int8),
        _rand(5, jnp.int8)))())

    def loop(n, seed, fields):
        C, av, ah, p8, q8 = fields
        z = jnp.zeros(SH, jnp.float32)
        carry = (z + seed, z, z, z, z, z, z)

        def body(i, carry):
            ap1, aq1, ap2, aq2, gC, gah, gav = carry
            hi_ = fused_vti_adjoint_step(
                ap1, aq1, ap2, aq2, gC, gah, gav, C, av, ah, p8, q8,
                1 / 127.0, 1 / 127.0, 0.01, SZ, SY, SX, order=2)
            lo_ = fused_vti_adjoint_step(
                hi_[0], hi_[1], ap1, aq1, *hi_[2:], C, av, ah, p8, q8,
                1 / 127.0, 1 / 127.0, 0.01, SZ, SY, SX, order=2)
            return (lo_[0], lo_[1], hi_[0], hi_[1]) + tuple(lo_[2:])

        out = lax.fori_loop(0, n, body, carry)
        return sum(jnp.sum(x) for x in out)

    us = _marginal(loop, fields)
    print(f"vti reverse isolated: {us:.0f} us/step "
          f"(raw 15.5-touch bound ~{15.5*D*H*W*4/819e9*1e6:.0f}; "
          f"r5 structure floor measured 1490)")


def tti_reverse():
    from jets_tpu.ops.pallas_wave import fused_tti_adjoint_step

    def build():
        C = _rand(1, lo=0.5, hi=1.5)
        ah = _rand(2, lo=1.0, hi=2.0)
        av = _rand(3, lo=1.0, hi=2.0)
        th = 0.3 * _rand(4)
        phf = _rand(5)
        return (C, ah, av, jnp.cos(th),
                jnp.sin(th) * jnp.cos(phf), jnp.sin(th) * jnp.sin(phf),
                _rand(6, jnp.int8), _rand(7, jnp.int8))

    fields = jax.block_until_ready(jax.jit(build)())

    def loop(n, seed, fields):
        C, ah, av, nz, ny, nx, p8, q8 = fields
        z = jnp.zeros(SH, jnp.float32)
        carry = (z + seed, z, z, z) + (z,) * 6

        def body(i, carry):
            ap1, aq1, ap2, aq2 = carry[:4]
            accs = carry[4:]
            hi_ = fused_tti_adjoint_step(
                ap1, aq1, ap2, aq2, *accs, C, ah, av, nz, ny, nx, p8, q8,
                1 / 127.0, 1 / 127.0, 0.01, 0.1, SZ, SY, SX, order=2)
            lo_ = fused_tti_adjoint_step(
                hi_[0], hi_[1], ap1, aq1, *hi_[2:], C, ah, av, nz, ny, nx,
                p8, q8, 1 / 127.0, 1 / 127.0, 0.01, 0.1, SZ, SY, SX,
                order=2)
            return (lo_[0], lo_[1], hi_[0], hi_[1]) + tuple(lo_[2:])

        out = lax.fori_loop(0, n, body, carry)
        return sum(jnp.sum(x) for x in out)

    us = _marginal(loop, fields, lo=5, hi=30)
    print(f"tti reverse isolated: {us:.0f} us/step "
          f"(raw 24.5-touch bound ~{24.5*D*H*W*4/819e9*1e6:.0f})")


if __name__ == "__main__":
    {"iso-reverse": iso_reverse, "vti-reverse": vti_reverse,
     "tti-reverse": tti_reverse}[sys.argv[1]]()
