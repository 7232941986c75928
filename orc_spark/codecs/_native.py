"""Lazy ctypes loader for the optional C fast path (_native.c).

Compiles with the system C compiler on first use (atomic rename so
concurrent Python workers race safely) and degrades to ``None`` when no
compiler is available — callers must keep a pure-numpy fallback.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile

_SRC = os.path.join(os.path.dirname(__file__), "_native.c")
_SO = os.path.join(os.path.dirname(__file__), "_native_build", "orcspark_native.so")

_lib = None
_tried = False


def _compile() -> bool:
    os.makedirs(os.path.dirname(_SO), exist_ok=True)
    if os.path.exists(_SO):
        return True
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(_SO))
    os.close(fd)
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
            check=True,
            capture_output=True,
            timeout=60,
        )
        os.rename(tmp, _SO)  # atomic: concurrent compilers race safely
        return True
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return os.path.exists(_SO)


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        if not _compile():
            return None
        lib = ctypes.CDLL(_SO)
        lib.fsst_tokenize.restype = ctypes.c_long
        lib.fsst_tokenize.argtypes = [
            ctypes.c_void_p,  # buf
            ctypes.c_long,  # n
            ctypes.c_void_p,  # ht_key
            ctypes.c_void_p,  # ht_code
            ctypes.c_uint,  # len_mask
            ctypes.c_void_p,  # out_codes
            ctypes.c_void_p,  # out_lits
            ctypes.c_void_p,  # n_lits_out
            ctypes.c_void_p,  # out_starts (nullable)
        ]
        lib.fsst_decode.restype = ctypes.c_long
        lib.fsst_decode.argtypes = [
            ctypes.c_void_p,  # codes
            ctypes.c_long,  # n_codes
            ctypes.c_void_p,  # lits
            ctypes.c_void_p,  # sym_flat
            ctypes.c_void_p,  # sym_len
            ctypes.c_void_p,  # out
        ]
        _lib = lib
    except Exception:
        _lib = None
    return _lib
