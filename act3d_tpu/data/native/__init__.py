"""Native (C++) data-path components, built on demand with g++.

The portable blosc codec is the framework's host-side native component
(see bloscdec.cpp).  ``decompress`` prefers the hand-written C++ decoder
and falls back to the system libblosc (if present) for codecs it does not
implement.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path
from typing import Optional

_HERE = Path(__file__).parent
_LIB: Optional[ctypes.CDLL] = None
_SYSTEM_BLOSC: Optional[ctypes.CDLL] = None


def _build_lib() -> Path:
    src = _HERE / "bloscdec.cpp"
    tag = hashlib.sha1(src.read_bytes()).hexdigest()[:12]
    out = _HERE / f"_bloscdec_{tag}.so"
    if out.exists():
        return out
    # clean stale builds
    for old in _HERE.glob("_bloscdec_*.so"):
        try:
            old.unlink()
        except OSError:
            pass
    tmp = out.with_suffix(".so.tmp")
    subprocess.run(
        ["g++", "-O3", "-shared", "-fPIC", "-o", str(tmp), str(src)],
        check=True,
        capture_output=True,
    )
    os.replace(tmp, out)
    return out


def _lib() -> ctypes.CDLL:
    global _LIB
    if _LIB is None:
        lib = ctypes.CDLL(str(_build_lib()))
        lib.blosc_portable_info.restype = ctypes.c_int
        lib.blosc_portable_decompress.restype = ctypes.c_int
        lib.blosc_portable_pack_memcpy.restype = ctypes.c_int64
        _LIB = lib
    return _LIB


def _system_blosc() -> Optional[ctypes.CDLL]:
    global _SYSTEM_BLOSC
    if _SYSTEM_BLOSC is None:
        for name in ("libblosc.so.1", "libblosc.so"):
            try:
                _SYSTEM_BLOSC = ctypes.CDLL(name)
                break
            except OSError:
                continue
    return _SYSTEM_BLOSC


def container_info(data: bytes):
    """(nbytes, cbytes, flags, typesize, blocksize) of a blosc1 container."""
    lib = _lib()
    nbytes = ctypes.c_int64()
    cbytes = ctypes.c_int64()
    flags = ctypes.c_int()
    typesize = ctypes.c_int()
    blocksize = ctypes.c_int64()
    rc = lib.blosc_portable_info(
        data, len(data),
        ctypes.byref(nbytes), ctypes.byref(cbytes), ctypes.byref(flags),
        ctypes.byref(typesize), ctypes.byref(blocksize),
    )
    if rc != 0:
        raise ValueError(f"invalid blosc container (rc={rc})")
    return nbytes.value, cbytes.value, flags.value, typesize.value, blocksize.value


def decompress(data: bytes) -> bytes:
    """Decompress a blosc1 container (drop-in for blosc.decompress)."""
    nbytes, _, _, _, _ = container_info(data)
    out = ctypes.create_string_buffer(max(nbytes, 1))
    rc = _lib().blosc_portable_decompress(data, len(data), out, nbytes)
    if rc == 0:
        return out.raw[:nbytes]
    # fall back to the system libblosc for codecs we don't implement
    sysb = _system_blosc()
    if sysb is not None:
        n = sysb.blosc_decompress_ctx(
            data, out, ctypes.c_size_t(nbytes), ctypes.c_int(1)
        )
        if n == nbytes:
            return out.raw[:nbytes]
    raise ValueError(f"blosc decompression failed (rc={rc})")


def pack_memcpy(data: bytes, typesize: int = 8) -> bytes:
    """Wrap raw bytes in a memcpy-mode blosc1 container (python-blosc
    readable) — used by the episode packager."""
    out = ctypes.create_string_buffer(16 + len(data))
    n = _lib().blosc_portable_pack_memcpy(data, len(data), typesize, out)
    return out.raw[:n]


def compress(data: bytes, typesize: int = 8, clevel: int = 9) -> bytes:
    """Compress into a blosc1 container.

    Prefers the system libblosc (blosclz + shuffle, matching the
    reference's python-blosc output, data_gen.py:136); falls back to the
    portable memcpy container when libblosc is absent.  Either output is
    readable by both this loader and python-blosc.
    """
    sysb = _system_blosc()
    if sysb is not None and len(data) > 0:
        dest = ctypes.create_string_buffer(len(data) + 1024)
        n = sysb.blosc_compress_ctx(
            ctypes.c_int(clevel), ctypes.c_int(1), ctypes.c_size_t(typesize),
            ctypes.c_size_t(len(data)), data, dest,
            ctypes.c_size_t(len(dest)), b"blosclz",
            ctypes.c_size_t(0), ctypes.c_int(1),
        )
        if n > 0:
            return dest.raw[:n]
    return pack_memcpy(data, typesize)
