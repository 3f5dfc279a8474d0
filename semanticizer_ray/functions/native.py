"""Loader for the optional native edit-distance kernels (``_native.c``).

Compiles once per machine with the system C compiler into a content-hashed
shared object under the user cache dir, loads it with ctypes, and exposes
``get_lib()``. Everything is best-effort: any failure (no compiler, RO
filesystem, load error) returns None and callers fall back to the numpy
batch kernels in ``strings.py`` — which are the parity REFERENCE for these
kernels, not just a fallback (tests assert bit-identical output).

Multi-node note: on a real cluster each node compiles independently at
first import (the cache path is node-local); the source ships inside the
package wheel. Concurrent first-imports on one node are safe: compilation
writes to a per-process temp name and ``os.rename``s into place atomically.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import stat
import subprocess
import sys

_LIB = None
_TRIED = False

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")


def _default_cache_dir() -> str:
    # Per-user cache, NOT the world-shared tempdir: a predictable path in
    # /tmp would let another local user pre-plant a .so at the content-hashed
    # name and gain code execution in every process that imports us.
    base = os.environ.get("XDG_CACHE_HOME") or os.path.join(
        os.path.expanduser("~"), ".cache"
    )
    return os.path.join(base, "semanticizer_ray", "native")


def _dir_is_trusted(d: str) -> bool:
    """Only load .so files from a directory owned by us and not group/world
    writable — refuses caches another uid could have planted binaries in."""
    try:
        st = os.stat(d)
    except OSError:
        return False
    if st.st_uid != os.getuid():
        return False
    return not (st.st_mode & (stat.S_IWGRP | stat.S_IWOTH))


def _cache_path(src_text: str) -> str | None:
    h = hashlib.sha256(src_text.encode()).hexdigest()[:16]
    d = os.environ.get("SEMANTICIZER_NATIVE_CACHE") or _default_cache_dir()
    try:
        os.makedirs(d, mode=0o700, exist_ok=True)
    except OSError:
        return None
    if not _dir_is_trusted(d):
        return None
    return os.path.join(d, f"kernels_{h}_{sys.implementation.cache_tag}.so")


def _compile(src_text: str, out_path: str) -> bool:
    cc = os.environ.get("CC", "cc")
    tmp = f"{out_path}.{os.getpid()}.tmp"
    cmd = [cc, "-O3", "-fPIC", "-shared", "-o", tmp, _SRC]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            return False
        os.rename(tmp, out_path)  # atomic on one filesystem
        return True
    except (OSError, subprocess.SubprocessError):
        return False
    finally:
        if os.path.exists(tmp):
            try:
                os.unlink(tmp)
            except OSError:
                pass


def get_lib():
    """ctypes handle to the native kernels, or None (numpy fallback)."""
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("SEMANTICIZER_NO_NATIVE") == "1":
        return None
    try:
        with open(_SRC) as f:
            src_text = f.read()
        path = _cache_path(src_text)
        if path is None:
            return None
        if not os.path.exists(path) and not _compile(src_text, path):
            return None
        lib = ctypes.CDLL(path)
        i64 = ctypes.c_int64
        p_u8 = ctypes.POINTER(ctypes.c_uint8)
        p_u32 = ctypes.POINTER(ctypes.c_uint32)
        p_i64 = ctypes.POINTER(ctypes.c_int64)
        p_f64 = ctypes.POINTER(ctypes.c_double)
        lib.batch_lev_ratio.argtypes = [p_u8, p_i64, p_u8, p_i64, i64, i64, p_f64]
        lib.batch_lev_ratio.restype = None
        lib.batch_jaro_winkler.argtypes = [
            p_u32, p_i64, p_u32, p_i64, i64, i64, ctypes.c_double, p_f64,
        ]
        lib.batch_jaro_winkler.restype = None
        p_u64 = ctypes.POINTER(ctypes.c_uint64)
        lib.batch_minhash.argtypes = [
            p_u64, p_i64, p_i64, i64, p_u64, p_u64, i64, p_u64,
        ]
        lib.batch_minhash.restype = None
        _LIB = lib
    except (OSError, ValueError, AttributeError):
        _LIB = None
    return _LIB
