"""ctypes bindings for the native runtime (libporla_rt.so).

Builds lazily with g++ on first use and caches the shared object next to
the source. Every entry point has a pure-Python fallback so the framework
works without a toolchain; the native paths accelerate host-side bulk
crypto (AES PRF/PRG) and batched file IO (the reference's 8-thread audit
reads, Server.hpp:742-776).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "native", "porla_rt.cc")
_SO = os.path.join(_HERE, "native", "libporla_rt.so")

_lock = threading.Lock()
_lib = None
_build_failed = False


def _build() -> str | None:
    flags = ["-O3", "-shared", "-fPIC", "-std=c++17", "-pthread"]
    for extra in (["-maes", "-mssse3"], []):
        try:
            subprocess.run(["g++", *flags, *extra, _SRC, "-o", _SO],
                           check=True, capture_output=True, timeout=120)
            return _SO
        except (subprocess.CalledProcessError, FileNotFoundError,
                subprocess.TimeoutExpired):
            continue
    return None


def get_lib():
    """The loaded native library, or None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None or _build_failed:
            return _lib
        so = _SO if os.path.exists(_SO) and os.path.getmtime(_SO) >= \
            os.path.getmtime(_SRC) else _build()
        if so is None:
            _build_failed = True
            return None
        lib = ctypes.CDLL(so)
        lib.porla_aes128_ecb.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.porla_prg_expand.argtypes = [
            ctypes.c_char_p, ctypes.c_uint64, ctypes.c_void_p, ctypes.c_int64]
        lib.porla_mac_prf.argtypes = [
            ctypes.c_char_p, ctypes.c_char_p, ctypes.c_void_p, ctypes.c_int64]
        lib.porla_read_files.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_int32]
        lib.porla_read_files.restype = ctypes.c_int64
        lib.porla_write_files.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_char_p,
            ctypes.c_int32]
        lib.porla_write_files.restype = ctypes.c_int64
        _lib = lib
        return _lib


def aes128_ecb(key: bytes, plaintext: bytes) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    n = len(plaintext) // 16
    out = ctypes.create_string_buffer(len(plaintext))
    lib.porla_aes128_ecb(key, plaintext, out, n)
    return out.raw


def prg_expand(key: bytes, counter: int, nblocks: int) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    out = ctypes.create_string_buffer(nblocks * 16)
    lib.porla_prg_expand(key, counter, out, nblocks)
    return out.raw


def read_files(paths: list[str], record_size: int,
               threads: int = 8) -> bytes | None:
    lib = get_lib()
    if lib is None:
        return None
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    out = ctypes.create_string_buffer(len(paths) * record_size)
    ok = lib.porla_read_files(blob, len(paths), record_size, out, threads)
    if ok != len(paths):
        raise IOError(f"read_files: {ok}/{len(paths)} files read")
    return out.raw


def write_files(paths: list[str], record_size: int, data: bytes,
                threads: int = 8) -> bool:
    lib = get_lib()
    if lib is None:
        return False
    blob = b"".join(p.encode() + b"\x00" for p in paths)
    ok = lib.porla_write_files(blob, len(paths), record_size, data, threads)
    if ok != len(paths):
        raise IOError(f"write_files: {ok}/{len(paths)} files written")
    return True
