"""Build-on-first-import ctypes loader for the native DoD codec.

No pip, no Python headers: ``dod.c`` is plain C compiled once with the
system compiler into a shared library cached next to the source (atomic
rename, so concurrent Ray workers race safely).  Every caller must handle
``decoder()/encoder()/gather() is None`` — machines without a C compiler
fall back to the pure-numpy paths in ``oracle.py``, which are the semantic
reference (property tests pin C == Python bit-for-bit).
"""

from __future__ import annotations

import ctypes
import os
import shutil
import subprocess
import tempfile

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "dod.c")

_fns: dict | None = None
_tried = False


def _lib_path() -> str:
    """Cache key = content hash of dod.c (ADVICE r3: mtime comparison let a
    checkout/copy with an older mtime silently load a stale library whose
    symbols existed but whose semantics changed)."""
    import hashlib

    with open(_SRC, "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()[:12]
    return os.path.join(_DIR, f"libdod-{digest}.so")


def _compile() -> str | None:
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("clang")
    if cc is None:
        return None
    lib = _lib_path()
    if os.path.isfile(lib):
        return lib
    fd, tmp = tempfile.mkstemp(suffix=".so", dir=_DIR)
    os.close(fd)
    try:
        r = subprocess.run(
            [cc, "-O2", "-shared", "-fPIC", "-o", tmp, _SRC],
            capture_output=True, timeout=120,
        )
        if r.returncode != 0:
            return None
        os.replace(tmp, lib)  # atomic: concurrent builders all win
        # best-effort sweep of superseded caches (old content hashes and
        # the legacy mtime-keyed libdod.so) so dod.c edits don't accrete
        # stale .so files in the source tree
        for f in os.listdir(_DIR):
            if (f.endswith(".so") and f.startswith("libdod")
                    and os.path.join(_DIR, f) != lib):
                try:
                    os.remove(os.path.join(_DIR, f))
                except OSError:
                    pass
        return lib
    except (OSError, subprocess.SubprocessError):
        return None
    finally:
        if os.path.exists(tmp):
            try:
                os.remove(tmp)
            except OSError:
                pass


_SIGS = {
    # base, byte_off, counts, out_off, n_streams, out
    "dod_decode_streams_c": [ctypes.c_void_p] * 4 + [ctypes.c_int64, ctypes.c_void_p],
    # vals, val_off, n_streams, out, cap_off, nbytes
    "dod_encode_streams_c": [ctypes.c_void_p] * 2 + [ctypes.c_int64] + [ctypes.c_void_p] * 3,
    # src, src_off, lens, dst, dst_off, n
    "gather_segments_c": [ctypes.c_void_p] * 5 + [ctypes.c_int64],
}


def _load() -> dict:
    global _fns, _tried
    if _tried:
        return _fns or {}
    _tried = True
    _fns = {}
    path = _compile()
    if path is None:
        return _fns
    try:
        lib = ctypes.CDLL(path)
        for name, argtypes in _SIGS.items():
            fn = getattr(lib, name)
            fn.restype = None
            fn.argtypes = argtypes
            _fns[name] = fn
    except (OSError, AttributeError):
        # stale .so missing a newer symbol, or load failure: all-or-nothing
        _fns = {}
    return _fns


def decoder():
    """ctypes handle of ``dod_decode_streams_c`` or None (no compiler)."""
    return _load().get("dod_decode_streams_c")


def encoder():
    """ctypes handle of ``dod_encode_streams_c`` or None (no compiler)."""
    return _load().get("dod_encode_streams_c")


def gather():
    """ctypes handle of ``gather_segments_c`` or None (no compiler)."""
    return _load().get("gather_segments_c")
