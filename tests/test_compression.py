"""Gates for the block-float wavefield codec (``utils/compression.py``)."""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from jets_tpu.utils import compression as C


@pytest.mark.parametrize("bits,min_snr_db", [(4, 8.0), (8, 34.0),
                                             (12, 58.0), (16, 80.0)])
def test_roundtrip_snr(bits, min_snr_db):
    rng = np.random.default_rng(0)
    x = rng.standard_normal(10_000).astype(np.float32)
    # smooth wavefield-like signal: strong spatial correlation per block
    x = np.cumsum(x) / 50.0
    buf = C.compress_array(x, bits)
    y = C.decompress_array(buf, x.shape, bits)
    err = x - y
    snr = 10 * np.log10(np.sum(x**2) / max(np.sum(err**2), 1e-30))
    assert snr > min_snr_db, (bits, snr)
    assert len(buf) == int(4 * x.size / C.compression_ratio(x.size, bits))


@pytest.mark.parametrize("bits", [4, 8, 12, 16])
@pytest.mark.parametrize("n", [1, 7, 255, 256, 257, 1000])
def test_odd_sizes_and_zero_blocks(bits, n):
    rng = np.random.default_rng(n)
    x = rng.standard_normal(n).astype(np.float32)
    x[: n // 3] = 0.0  # leading zeros; whole block zero when n >= 768
    y = C.decompress_array(C.compress_array(x, bits), (n,), bits)
    assert y.shape == (n,)
    qmax = (1 << (bits - 1)) - 1
    np.testing.assert_allclose(y, x, atol=float(np.abs(x).max()) / qmax)
    z = np.zeros(n, np.float32)
    np.testing.assert_array_equal(
        C.decompress_array(C.compress_array(z, bits), (n,), bits), z)


@pytest.mark.parametrize("bits", [4, 8, 12, 16])
def test_native_matches_numpy_bytes(bits):
    """The C++ codec and the numpy fallback produce IDENTICAL bytes (and
    therefore identical reconstructions) — the format is one format."""
    if C._get_lib() is None:
        pytest.skip("no native toolchain")
    rng = np.random.default_rng(3)
    x = (np.cumsum(rng.standard_normal(5000)) / 10).astype(np.float32)
    native = C.compress_array(x, bits)
    fallback = C._compress_np(x.ravel(), bits)
    assert native == fallback
    y_native = C.decompress_array(native, x.shape, bits)
    y_np = C._decompress_np(np.frombuffer(fallback, np.uint8), x.size,
                            bits).reshape(x.shape)
    np.testing.assert_array_equal(y_native, y_np)


def test_bad_bits_raises():
    with pytest.raises(ValueError, match="bits"):
        C.compress_array(np.zeros(4, np.float32), 7)


def test_snapshot_store_memory_and_disk(tmp_path):
    shape = (24, 32)
    rng = np.random.default_rng(5)
    snaps = [np.cumsum(rng.standard_normal(np.prod(shape)))
             .astype(np.float32).reshape(shape) / 30 for _ in range(6)]

    mem = C.SnapshotStore(shape, bits=12)
    for s in snaps:
        mem.append(s)
    assert len(mem) == 6 and mem.ratio > 2.5
    for i, s in enumerate(snaps):
        r = mem.read(i)
        assert np.max(np.abs(r - s)) < 2e-3 * np.max(np.abs(s))

    path = str(tmp_path / "snaps.bin")
    disk = C.SnapshotStore(shape, bits=12, path=path)
    for s in snaps:
        disk.append(s)
    disk.close()
    ro = C.SnapshotStore.open(path)
    np.testing.assert_array_equal(ro.read(3), mem.read(3))
    with pytest.raises(ValueError, match="shape"):
        mem.append(np.zeros((2, 2), np.float32))
    with pytest.raises(IndexError):
        mem.read(6)


def test_wavefield_snapshot_fidelity():
    """Compress an actual propagated wavefield: bits=12 keeps the field to
    ~1e-3 relative max error — the imaging-grade regime."""
    from jets_tpu.ops.wave import wave_propagator

    F = wave_propagator((48, 48), nt=120, dt=6e-4, dx=10.0, freq=15.0,
                        src_idx=48 * 24 + 24, sponge_width=6,
                        dtype=jnp.float32)
    # grab an interior snapshot by differentiating nothing — just run the
    # public forward and rebuild the final field from traces? Simpler: use
    # the propagator's own machinery via a full-grid receiver set.
    n = 48 * 48
    F = wave_propagator((48, 48), nt=120, dt=6e-4, dx=10.0, freq=15.0,
                        src_idx=48 * 24 + 24, sponge_width=6,
                        rcv_idx=jnp.arange(n), dtype=jnp.float32)
    traces = np.asarray(F(jnp.full((48, 48), 1800.0, jnp.float32)))
    u_t = traces[90].reshape(48, 48)  # a late-time full-grid snapshot
    buf = C.compress_array(u_t, 12)
    rec = C.decompress_array(buf, u_t.shape, 12)
    assert np.max(np.abs(rec - u_t)) < 2e-3 * np.max(np.abs(u_t))
    assert C.compression_ratio(u_t.size, 12) > 2.6


def test_jax_array_input():
    x = jax.random.normal(jax.random.PRNGKey(0), (512,), jnp.float32)
    y = C.decompress_array(C.compress_array(x, 16), (512,), 16)
    np.testing.assert_allclose(y, np.asarray(x), atol=1e-4)
