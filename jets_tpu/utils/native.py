"""Shared build-and-load scaffolding for the native (C++) runtime pieces.

One implementation of the compile-cache-ctypes dance used by every native
component (CRC32C hashing, the async dataloader): compile the source into a
per-user cache directory (rebuilding when the source is newer), retry
without optional ISA flags on non-x86 hosts, load with ctypes. A unique
temp name per build avoids the concurrent-build race on a shared ``.tmp``.

Returns ``None`` when no toolchain is available — callers fall back to
their pure-Python/numpy paths.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import uuid
from typing import Optional, Sequence


def build_and_load(
    src_path: str,
    lib_name: str,
    *,
    extra_flags: Sequence[str] = (),
    optional_flags: Sequence[str] = (),
    timeout: int = 180,
) -> Optional[ctypes.CDLL]:
    """Compile ``src_path`` to ``<cache>/<lib_name>.so`` (if stale) and load
    it. ``optional_flags`` (e.g. ``-msse4.2``) are dropped and the compile
    retried if the first attempt fails."""
    cache_dir = os.path.join(
        tempfile.gettempdir(), f"jets_tpu_native_{os.getuid()}"
    )
    os.makedirs(cache_dir, exist_ok=True)
    so_path = os.path.join(cache_dir, f"{lib_name}.so")
    if (
        not os.path.exists(so_path)
        or os.path.getmtime(so_path) < os.path.getmtime(src_path)
    ):
        tmp = f"{so_path}.{uuid.uuid4().hex[:8]}.tmp"
        base = ["g++", "-O3", "-shared", "-fPIC", "-pthread", "-o", tmp,
                src_path]
        try:
            try:
                subprocess.run(
                    base + list(extra_flags) + list(optional_flags),
                    check=True, capture_output=True, timeout=timeout,
                )
            except (OSError, subprocess.SubprocessError):
                if not optional_flags:
                    return None
                subprocess.run(
                    base + list(extra_flags),
                    check=True, capture_output=True, timeout=timeout,
                )
            os.replace(tmp, so_path)
        except (OSError, subprocess.SubprocessError):
            return None
        finally:
            if os.path.exists(tmp):
                try:
                    os.remove(tmp)
                except OSError:
                    pass
    try:
        return ctypes.CDLL(so_path)
    except OSError:
        return None
