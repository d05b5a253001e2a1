"""Model-content hashing — CRC32C over array bytes.

Reference: the ``CRC32c.crc32c`` overload for Float32/64/Complex model arrays
("for hashing models", ``src/Jets.jl:1284-1286``), used to cache/validate
model vectors across runs. Here the hash walks any pytree (arrays,
BlockVectors, solver states) deterministically.

Backend: a native C++ CRC32C (``_crc32c.cpp``) compiled once per machine
with g++ (SSE4.2 hardware CRC when available) and loaded via ctypes; falls
back to a pure-Python implementation if no compiler is present.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import jax
import numpy as np

__all__ = ["crc32c", "tree_hash"]

_LIB: Optional[ctypes.CDLL] = None
_TRIED = False


def _build_lib() -> Optional[ctypes.CDLL]:
    from .native import build_and_load

    src = os.path.join(os.path.dirname(__file__), "_crc32c.cpp")
    lib = build_and_load(
        src, "libjets_crc32c", optional_flags=("-msse4.2",), timeout=120
    )
    if lib is None:
        return None
    lib.jets_crc32c.restype = ctypes.c_uint32
    lib.jets_crc32c.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.c_uint32,
    ]
    return lib


def _get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _TRIED
    if not _TRIED:
        _LIB = _build_lib()
        _TRIED = True
    return _LIB


# pure-python fallback (slice-by-1 table CRC32C)
_PY_TABLE = None


def _py_table():
    global _PY_TABLE
    if _PY_TABLE is None:
        poly = 0x82F63B78
        tbl = []
        for i in range(256):
            crc = i
            for _ in range(8):
                crc = (crc >> 1) ^ (poly if crc & 1 else 0)
            tbl.append(crc)
        _PY_TABLE = tbl
    return _PY_TABLE


def crc32c(data: bytes, seed: int = 0) -> int:
    """CRC32C of a byte string."""
    lib = _get_lib()
    if lib is not None:
        return int(lib.jets_crc32c(data, len(data), seed & 0xFFFFFFFF))
    tbl = _py_table()
    crc = ~seed & 0xFFFFFFFF
    for b in data:
        crc = (crc >> 8) ^ tbl[(crc ^ b) & 0xFF]
    return (~crc) & 0xFFFFFFFF


def _array_bytes(x) -> bytes:
    a = np.asarray(jax.device_get(x))
    return np.ascontiguousarray(a).tobytes()


def tree_hash(tree) -> int:
    """Deterministic CRC32C content hash of any pytree of arrays (models,
    BlockVectors, solver states). Chains per-leaf hashes in flattening order
    so structure changes also change the hash."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    h = crc32c(repr(treedef).encode())
    for leaf in leaves:
        h = crc32c(_array_bytes(leaf), seed=h)
    return h
