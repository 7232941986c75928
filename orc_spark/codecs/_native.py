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
_BUILD_DIR = os.path.join(os.path.dirname(__file__), "_native_build")

_lib = None
_tried = False


def _read_src() -> bytes | None:
    """Source bytes — via the loader so a --py-files zip import works."""
    try:
        with open(_SRC, "rb") as f:
            return f.read()
    except OSError:
        pass
    try:
        import importlib.resources as res

        return (res.files("orc_spark.codecs") / "_native.c").read_bytes()
    except Exception:
        return None


def _so_path() -> str:
    """Writable .so location, ALWAYS keyed by the source hash so any
    _native.c change (e.g. a table-ABI bump) forces recompilation — a
    path-keyed cache would silently dlopen a stale binary built for the
    old ABI. Package dir when writable; else a per-user 0700 temp dir
    (zip imports / read-only installs, e.g. spark-submit --py-files —
    one compile per host+user, shared by that user's workers; a
    world-shared predictable path would let another local user plant a
    library that every Spark worker then executes)."""
    import hashlib

    src = _read_src() or b""
    tag = hashlib.sha256(src).hexdigest()[:16]
    name = f"orcspark_native_{tag}.so"
    try:
        os.makedirs(_BUILD_DIR, exist_ok=True)
        if os.access(_BUILD_DIR, os.W_OK):
            return os.path.join(_BUILD_DIR, name)
    except OSError:
        pass
    uid = os.getuid() if hasattr(os, "getuid") else 0
    user_dir = os.path.join(tempfile.gettempdir(), f"orcspark-{uid}")
    os.makedirs(user_dir, mode=0o700, exist_ok=True)
    st = os.stat(user_dir)
    if st.st_uid != uid or (st.st_mode & 0o077):
        # Pre-existing dir owned by someone else / group-writable:
        # refuse to share it, fall back to a fresh private dir.
        user_dir = tempfile.mkdtemp(prefix=f"orcspark-{uid}-")
    return os.path.join(user_dir, name)


def _compile() -> str | None:
    so = _so_path()
    if os.path.exists(so):
        return so
    src = _read_src()
    if src is None:
        return None
    os.makedirs(os.path.dirname(so), exist_ok=True)
    # csrc shares the .so's content tag: a path-keyed _native.c could be
    # stale and would get compiled into the freshly-tagged .so.
    csrc = so[: -len(".so")] + ".c"
    if not os.path.exists(csrc):
        with open(csrc + f".tmp{os.getpid()}", "wb") as f:
            f.write(src)
        os.rename(csrc + f".tmp{os.getpid()}", csrc)
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=os.path.dirname(so))
    os.close(fd)
    try:
        subprocess.run(
            ["cc", "-O3", "-shared", "-fPIC", "-o", tmp, csrc],
            check=True,
            capture_output=True,
            timeout=60,
        )
        os.rename(tmp, so)  # atomic: concurrent compilers race safely
        return so
    except Exception:
        try:
            os.unlink(tmp)
        except OSError:
            pass
        return so if os.path.exists(so) else None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    _tried = True
    try:
        so = _compile()
        if not so:
            return None
        lib = ctypes.CDLL(so)
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
