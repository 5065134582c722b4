"""Build-on-first-import ctypes loader for the native DoD decoder.

No pip, no Python headers: ``dod.c`` is plain C compiled once with the
system compiler into a shared library cached next to the source (atomic
rename, so concurrent Ray workers race safely).  Every caller must handle
``decoder() is None`` — machines without a C compiler fall back to the
pure-numpy wavefront in ``oracle.py``, which is the semantic reference
(a property test pins C == Python bit-for-bit).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dod.c")
_LIB = os.path.join(_DIR, "libdod.so")

_lib = None
_tried = False


def _compile() -> str | None:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return None
    if os.path.isfile(_LIB) and os.path.getmtime(_LIB) >= os.path.getmtime(_SRC):
        return _LIB
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        r = subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            return None
        os.replace(tmp, _LIB)  # atomic: concurrent builders all win
        return _LIB
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


def decoder():
    """ctypes handle of ``dod_decode_streams_c`` or None (no compiler)."""
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    path = _compile()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
        fn = lib.dod_decode_streams_c
        fn.restype = None
        fn.argtypes = [
            ctypes.c_void_p,  # words
            ctypes.c_void_p,  # gbase
            ctypes.c_void_p,  # counts
            ctypes.c_void_p,  # out_off
            ctypes.c_int64,   # n_streams
            ctypes.c_void_p,  # out
        ]
        _lib = fn
    except OSError:
        _lib = None
    return _lib
