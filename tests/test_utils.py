"""Hashing (native CRC32C) and checkpoint/resume round-trips."""
import os

import pytest

import jax
import jax.numpy as jnp
import numpy as np

import jets_tpu as jt
from jets_tpu.ops.matrix import matrix_operator
from jets_tpu.solvers import cg
from jets_tpu.utils.hashing import crc32c, tree_hash, _py_table, _get_lib
from jets_tpu.utils.checkpoint import save_checkpoint, load_checkpoint


def test_crc32c_known_vector():
    # RFC 3720 test vector: crc32c of 32 zero bytes
    assert crc32c(b"\x00" * 32) == 0x8A9136AA
    assert crc32c(b"123456789") == 0xE3069283


def test_native_lib_matches_python():
    lib = _get_lib()
    assert lib is not None, "native crc32c failed to build (g++ present?)"
    data = bytes(range(256)) * 7 + b"tail"
    # force python path by calling table routine directly
    tbl = _py_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    assert crc32c(data) == (~crc) & 0xFFFFFFFF


def test_tree_hash_sensitivity():
    x = {"a": jnp.arange(10.0), "b": jnp.ones((3, 3))}
    h1 = tree_hash(x)
    assert tree_hash(x) == h1  # deterministic
    y = {"a": jnp.arange(10.0).at[3].set(5.0), "b": jnp.ones((3, 3))}
    assert tree_hash(y) != h1  # value change
    z = {"a": jnp.arange(10.0), "c": jnp.ones((3, 3))}
    assert tree_hash(z) != h1  # structure change


def test_checkpoint_solver_resume(tmp_path):
    n = 32
    M = jax.random.normal(jax.random.PRNGKey(0), (n, n), jnp.float64)
    A = matrix_operator(M @ M.T + n * jnp.eye(n))
    b = jax.random.normal(jax.random.PRNGKey(1), (n,), jnp.float64)

    half = cg(A, b, maxiter=10, tol=0.0)
    p = os.path.join(tmp_path, "cg_state.npz")
    h = save_checkpoint(p, half.state, meta={"iteration": int(half.iterations)})
    state, meta = load_checkpoint(p, like=half.state)
    assert meta["crc32c"] == h and meta["iteration"] == 10

    resumed = cg(A, b, maxiter=20, tol=0.0, state=state)
    full = cg(A, b, maxiter=20, tol=0.0)
    np.testing.assert_allclose(np.asarray(resumed.x), np.asarray(full.x),
                               rtol=1e-12)


def test_checkpoint_detects_corruption(tmp_path):
    x = {"m": jnp.arange(64.0)}
    p = os.path.join(tmp_path, "m.npz")
    save_checkpoint(p, x)
    # corrupt a leaf in place
    import numpy as _np
    with _np.load(p) as z:
        data = dict(z)
    data["leaf_0"] = data["leaf_0"].copy()
    data["leaf_0"][0] = 999.0
    with open(p, "wb") as f:
        _np.savez(f, **data)
    try:
        load_checkpoint(p, like=x)
        assert False, "corruption not detected"
    except ValueError as e:
        assert "hash mismatch" in str(e)


def test_instrument_perfstat():
    from jets_tpu.ops.diagonal import diagonal_operator
    from jets_tpu.utils.profiling import instrument, op_cost

    D = diagonal_operator(jnp.arange(1.0, 9.0))
    Di = instrument(D)
    stat = jt.perfstat(Di)
    assert stat["bytes_in"] == 8 * 8 and stat["bytes_out"] == 8 * 8
    # surfaces through combinators like the reference perfstat
    C = D @ Di
    assert jt.perfstat(C) == stat


def test_guards_detect_nonfinite():
    from jax.experimental import checkify
    from jets_tpu.utils.guards import checked, assert_finite
    from jets_tpu.ops.diagonal import diagonal_operator

    bad = diagonal_operator(jnp.array([1.0, jnp.inf, 3.0]))
    ok = diagonal_operator(jnp.array([1.0, 2.0, 3.0]))
    m = jnp.ones(3)

    err, out = checkify.checkify(lambda: checked(bad, "bad")(m))()
    try:
        err.throw()
        assert False, "expected checkify error"
    except Exception as e:
        assert "non-finite output of bad" in str(e)

    err, out = checkify.checkify(lambda: checked(ok, "ok")(m))()
    err.throw()  # no error
    np.testing.assert_allclose(out, jnp.array([1.0, 2.0, 3.0]))

    try:
        assert_finite({"x": jnp.array([1.0, jnp.nan])}, "state")
        assert False
    except FloatingPointError as e:
        assert "NaN" in str(e)


def test_shot_gather_loader_roundtrip(tmp_path):
    from jets_tpu.utils.dataloader import ShotGatherStore, ShotGatherLoader

    data = np.arange(16 * 5 * 7, dtype=np.float32).reshape(16, 5, 7)
    p = os.path.join(tmp_path, "shots.bin")
    store = ShotGatherStore.create(p, data)
    loader = ShotGatherLoader(store, batch_shots=4, queue_depth=2)
    assert loader.native, "native loader failed to build"
    got = {}
    for idx, block in loader:
        assert block.shape == (4, 5, 7)
        got[idx] = block
    assert sorted(got) == [0, 1, 2, 3]
    np.testing.assert_array_equal(
        np.concatenate([got[i] for i in range(4)]), data)
    # second pass works (fresh handle), bad batch size raises
    assert sum(1 for _ in loader) == 4
    import pytest
    with pytest.raises(ValueError):
        ShotGatherLoader(store, batch_shots=3)


def test_loader_short_read_raises(tmp_path):
    # a truncated/corrupt store must surface an error, never yield
    # zero-filled data as if it were real observations
    import numpy as np
    from jets_tpu.utils.dataloader import ShotGatherLoader, ShotGatherStore

    data = np.arange(4 * 8, dtype=np.float32).reshape(4, 8)
    path = str(tmp_path / "shots.bin")
    store = ShotGatherStore.create(path, data)
    # truncate to 2.5 blocks
    with open(path, "r+b") as f:
        f.truncate(int(2.5 * 8 * 4))
    loader = ShotGatherLoader(store, batch_shots=1)
    seen = []
    with pytest.raises((IOError, ValueError)):
        for idx, block in loader:
            seen.append(idx)
            np.testing.assert_array_equal(block[0], data[idx])
    assert len(seen) <= 2  # only the intact blocks were delivered
