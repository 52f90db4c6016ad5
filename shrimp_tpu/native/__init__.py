"""Native (C) runtime components, loaded via ctypes.

The compute path is JAX/XLA; the host runtime around it mirrors the
reference's C layer where it matters — here the bulk FASTQ/FASTA record
indexer (common/fasta.c's role).  The shared object is built on first use
with the system compiler and cached next to the source; everything falls
back to the pure-Python implementations when no compiler is available.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys

_HERE = os.path.dirname(__file__)
_SRC = os.path.join(_HERE, "fastx_native.c")
_LIB: ctypes.CDLL | None = None
_TRIED = False


def _build() -> str | None:
    so_path = os.path.join(_HERE, "_fastx_native.so")
    if os.path.exists(so_path) and \
       os.path.getmtime(so_path) >= os.path.getmtime(_SRC):
        return so_path
    for cc in ("cc", "gcc", "clang"):
        try:
            r = subprocess.run(
                [cc, "-O3", "-fPIC", "-shared", "-o", so_path, _SRC],
                capture_output=True, timeout=120)
            if r.returncode == 0:
                return so_path
        except (OSError, subprocess.TimeoutExpired):
            continue
    return None


def load() -> ctypes.CDLL | None:
    """Return the native library, building it on first use (None if no
    toolchain is available)."""
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _build()
    if so is None:
        return None
    try:
        lib = ctypes.CDLL(so)
    except OSError:
        return None
    c_ll = ctypes.c_longlong
    lib.fastx_count_records.restype = c_ll
    lib.fastx_count_records.argtypes = [ctypes.c_char_p, c_ll, ctypes.c_int]
    lib.fastx_index_fastq.restype = c_ll
    lib.fastx_index_fastq.argtypes = [
        ctypes.c_char_p, c_ll, ctypes.POINTER(c_ll), c_ll]
    lib.fastx_index_fasta.restype = c_ll
    lib.fastx_index_fasta.argtypes = [
        ctypes.c_char_p, c_ll, ctypes.POINTER(c_ll), c_ll]
    lib.fastx_translate.restype = c_ll
    lib.fastx_translate.argtypes = [
        ctypes.c_char_p, c_ll, ctypes.c_char_p, ctypes.c_char_p]
    _LIB = lib
    return lib


def available() -> bool:
    return load() is not None
