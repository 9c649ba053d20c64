"""ctypes loader for the native .dat table parser (_fastparse.c).

The shared object is built on demand with the system C compiler (cc -O2
-shared -fPIC — no pybind11/pip step) and cached next to the source,
keyed by the source file's content hash so edits rebuild automatically.
If no compiler is available or the build fails, callers fall back to the
pure-NumPy splitter (io/dat._parse_numeric_table) — same results, more
transient memory.

Measured on the 116-bf eri.dat (481 MB, ~23M lines): the NumPy path
peaks at ~6 GB of transient Python-string heap and takes minutes on a
fresh-page-fault-bound microVM; this path is a single pass at ~300 MB/s
with zero transient allocation beyond the output array.
"""

from __future__ import annotations

import ctypes
import hashlib
import mmap
import os
import subprocess
from pathlib import Path

import numpy as np

_SRC = Path(__file__).with_name("_fastparse.c")
_LIB = None  # ctypes.CDLL once loaded; False if unavailable


def _build_so() -> Path | None:
    src = _SRC.read_bytes()
    tag = hashlib.sha256(src).hexdigest()[:16]
    so = _SRC.with_name(f"_fastparse-{tag}.so")
    if so.exists():
        return so
    cc = os.environ.get("CC", "cc")
    tmp = so.with_suffix(".so.tmp")
    try:
        subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
            check=True,
            capture_output=True,
            timeout=120,
        )
        os.replace(tmp, so)  # atomic vs concurrent builders
    except Exception:
        tmp.unlink(missing_ok=True)
        return None
    return so


def _load():
    global _LIB
    if _LIB is None:
        if os.environ.get("AFESP_NO_FASTPARSE"):
            _LIB = False
            return _LIB
        so = _build_so()
        if so is None:
            _LIB = False
        else:
            lib = ctypes.CDLL(str(so))
            lib.afesp_parse_doubles.restype = ctypes.c_long
            lib.afesp_parse_doubles.argtypes = [
                ctypes.c_void_p,
                ctypes.c_long,
                ctypes.POINTER(ctypes.c_double),
                ctypes.c_long,
            ]
            lib.afesp_count_tokens.restype = ctypes.c_long
            lib.afesp_count_tokens.argtypes = [ctypes.c_void_p, ctypes.c_long]
            _LIB = lib
    return _LIB


def available() -> bool:
    return bool(_load())


def parse_doubles_file(path: Path, ncols: int) -> np.ndarray | None:
    """Parse a whitespace-separated numeric table; None if the native
    parser is unavailable (caller falls back to NumPy)."""
    lib = _load()
    if not lib:
        return None
    size = path.stat().st_size
    if size == 0:
        return np.zeros((0, ncols))
    with open(path, "rb") as f, mmap.mmap(
        f.fileno(), 0, access=mmap.ACCESS_READ
    ) as mm:
        # zero-copy: a uint8 view of the mmap carries the buffer address
        view = np.frombuffer(mm, dtype=np.uint8)
        # exact-size the output (a read-only counting pass runs at memory
        # bandwidth; over-allocating costs seconds of fresh-page faults
        # on this microVM) — it also pre-faults the file pages for the
        # parse pass
        max_out = lib.afesp_count_tokens(ctypes.c_void_p(view.ctypes.data), size)
        out = np.empty(max_out, dtype=np.float64)
        n = lib.afesp_parse_doubles(
            ctypes.c_void_p(view.ctypes.data),
            size,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            max_out,
        )
        del view
    if n < 0:
        raise ValueError(
            f"{path}: malformed numeric token at byte {-(n + 1)}"
        )
    if n % ncols != 0:
        raise ValueError(f"{path}: expected {ncols} columns, got {n} values")
    return out[:n].reshape(-1, ncols).copy()
