"""Native (C) runtime components, loaded via ctypes.

The only native code the reference touches is NumPy's BLAS (SURVEY.md S3:
zero C/C++/CUDA components of its own), so the TPU build owes no ports —
but the framework's own runtime hot spots outside the XLA compute path are
implemented natively where it pays. Today that is the text data loader:
`np.loadtxt` tokenizes in Python and takes tens of seconds on the 1M-row
prediction designs BASELINE config 5 serves, while the C parser
(`fastload.c`) does one strtod pass over an in-memory buffer.

The shared library is compiled lazily on first use with the system
compiler and cached next to the source; every entry point falls back to
the NumPy implementation when no compiler is available, so the package
stays importable in minimal environments.
"""
from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "fastload.c"
_SO = _HERE / "_fastload.so"

_lib = None
_lib_failed = False

_ERRORS = {
    -1: "cannot open or read file",
    -2: "inconsistent number of columns",
    -3: "non-numeric token",
    -4: "out of memory",
}


def _compile() -> Optional[Path]:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        return None
    # build into a temp file then atomically rename: concurrent test
    # processes (pytest-xdist, the bench's stage subprocesses) may race
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=str(_HERE))
    os.close(fd)
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        os.replace(tmp, _SO)
        return _SO
    except (subprocess.SubprocessError, OSError):
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return None


def _get_lib():
    global _lib, _lib_failed
    if _lib is not None or _lib_failed:
        return _lib
    so = _SO
    try:
        if not so.exists() or so.stat().st_mtime < _SRC.stat().st_mtime:
            so = _compile()
        if so is None:
            _lib_failed = True
            return None
        lib = ctypes.CDLL(str(so))
    except OSError:
        _lib_failed = True
        return None
    lib.fastload.restype = ctypes.c_longlong
    lib.fastload.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_double)),
        ctypes.POINTER(ctypes.c_longlong),
        ctypes.POINTER(ctypes.c_longlong),
    ]
    lib.fastload_free.restype = None
    lib.fastload_free.argtypes = [ctypes.POINTER(ctypes.c_double)]
    _lib = lib
    return _lib


def available() -> bool:
    """True when the native loader compiled and loaded on this host."""
    return _get_lib() is not None


def load_matrix_native(path) -> Optional[np.ndarray]:
    """Parse a whitespace-separated numeric matrix with the C loader.

    Returns a (rows, cols) float64 array, or None when the native library
    is unavailable (caller falls back to np.loadtxt). Raises ValueError on
    malformed files — same failure class as np.loadtxt.
    """
    lib = _get_lib()
    if lib is None:
        return None
    data = ctypes.POINTER(ctypes.c_double)()
    rows = ctypes.c_longlong()
    cols = ctypes.c_longlong()
    rc = lib.fastload(
        str(path).encode(), ctypes.byref(data),
        ctypes.byref(rows), ctypes.byref(cols),
    )
    if rc == -1:
        raise FileNotFoundError(f"{path}: {_ERRORS[-1]}")
    if rc != 0:
        raise ValueError(
            f"{path}: {_ERRORS.get(int(rc), f'error {rc}')}")
    n = rows.value * cols.value
    try:
        if n == 0:
            return np.empty((rows.value, max(cols.value, 0)), np.float64)
        # copy out of the C allocation so numpy owns its memory
        arr = np.ctypeslib.as_array(data, shape=(rows.value, cols.value))
        return arr.copy()
    finally:
        if data:
            lib.fastload_free(data)
