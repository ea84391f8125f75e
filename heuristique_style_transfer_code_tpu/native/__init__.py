"""Native (C++) host-pipeline components, built on demand with g++.

The JPEG decode + Pillow-exact resample + crop lives in ``decoder.cpp``; it
is compiled lazily into a cached shared library and driven through ctypes
(which releases the GIL, unlike Pillow's decode path — so the threaded
HostLoader actually scales across cores). Everything here degrades
gracefully: if the toolchain or libjpeg is missing, ``get_decoder()``
returns None and callers keep using PIL.

Set ``HST_NATIVE_DECODE=0`` to disable, ``=1`` to require (raises on
build failure — used by tests).
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from typing import Optional, Tuple

import numpy as np

from ..core.geometry import staging_geometry

_ABI = 3  # keep in sync with hst_abi_version() in decoder.cpp
_SRC = os.path.join(os.path.dirname(os.path.abspath(__file__)), "decoder.cpp")

_lock = threading.Lock()
_decoder: Optional["NativeJpegDecoder"] = None
_failed: Optional[str] = None


def _build_dirs():
    pkg_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), "_build")
    cache = os.environ.get("XDG_CACHE_HOME") or os.path.expanduser("~/.cache")
    return [pkg_dir, os.path.join(cache, "heuristique_style_transfer_code_tpu")]


def _compile() -> str:
    """Compile decoder.cpp into a cached .so; return its path."""
    src_mtime = os.stat(_SRC).st_mtime_ns
    name = f"libhstdec_abi{_ABI}.so"
    last_err = None
    for d in _build_dirs():
        so = os.path.join(d, name)
        stamp = so + ".src_mtime"
        try:
            if os.path.exists(so) and os.path.exists(stamp):
                with open(stamp) as f:
                    if f.read().strip() == str(src_mtime):
                        return so
            os.makedirs(d, exist_ok=True)
            fd, tmp = tempfile.mkstemp(suffix=".so", dir=d)
            os.close(fd)
            try:
                cmd = [
                    "g++", "-O2", "-fPIC", "-shared", "-std=c++17",
                    "-o", tmp, _SRC, "-ljpeg",
                ]
                proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
                if proc.returncode != 0:
                    raise RuntimeError(f"g++ failed: {proc.stderr.strip()[:500]}")
                os.replace(tmp, so)  # atomic: concurrent builders race benignly
            except BaseException:
                # also covers TimeoutExpired — never leave the temp .so behind
                if os.path.exists(tmp):
                    os.unlink(tmp)
                raise
            # per-process temp for the stamp too (a fixed shared '.tmp' path
            # could be truncated by a concurrent builder mid-write)
            sfd, stmp = tempfile.mkstemp(suffix=".stamp", dir=d)
            with os.fdopen(sfd, "w") as f:
                f.write(str(src_mtime))
            os.replace(stmp, stamp)
            return so
        except Exception as e:  # try the next candidate dir
            last_err = e
    raise RuntimeError(f"native decoder build failed: {last_err}")


class NativeJpegDecoder:
    """ctypes facade over decoder.cpp. Thread-safe (no shared state in C)."""

    def __init__(self, so_path: str):
        lib = ctypes.CDLL(so_path)
        lib.hst_jpeg_dims.restype = ctypes.c_int
        lib.hst_jpeg_dims.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong,
            ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
        ]
        lib.hst_decode_resize_crop.restype = ctypes.c_int
        lib.hst_decode_resize_crop.argtypes = [
            ctypes.c_char_p, ctypes.c_ulong,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_void_p,
        ]
        lib.hst_abi_version.restype = ctypes.c_int
        if lib.hst_abi_version() != _ABI:
            raise RuntimeError("native decoder ABI mismatch")
        self._lib = lib
        self.so_path = so_path

    def jpeg_dims(self, data: bytes) -> Optional[Tuple[int, int]]:
        w = ctypes.c_int()
        h = ctypes.c_int()
        rc = self._lib.hst_jpeg_dims(data, len(data), ctypes.byref(w), ctypes.byref(h))
        if rc != 0:
            return None
        return w.value, h.value

    def decode_staged(
        self, data: bytes, staging: int = 256, fast: bool = False
    ) -> Optional[np.ndarray]:
        """JPEG bytes -> (staging, staging, 3) uint8, bit-identical to
        data/loader.py::load_image_staged. None => caller falls back to PIL
        (corrupt file, CMYK, etc.).

        ``fast``: decode at the coarsest 1/2^k DCT scaling whose shorter side
        still covers ``staging`` (libjpeg scale_denom), then resample. Much
        cheaper for large photos, but NOT bit-identical to PIL — strictly
        opt-in (HST_NATIVE_DECODE_FAST=1 at the loader level)."""
        dims = self.jpeg_dims(data)
        if dims is None:
            return None
        w, h = dims
        if w <= 0 or h <= 0:
            return None
        # the one shared definition of the staged-decode arithmetic
        tw, th, left, top = staging_geometry(w, h, staging)
        ch = min(staging, th)
        cw = min(staging, tw)
        denom = 1
        if fast:
            while denom < 8 and min(-(-h // (denom * 2)), -(-w // (denom * 2))) >= staging:
                denom *= 2
        out = np.empty((ch, cw, 3), dtype=np.uint8)
        rc = self._lib.hst_decode_resize_crop(
            data, len(data), tw, th, left, top, cw, ch, denom,
            out.ctypes.data_as(ctypes.c_void_p),
        )
        if rc != 0:
            return None
        if (ch, cw) != (staging, staging):
            # upscale path where PIL's crop would pad — loader slices, so
            # mirror exactly: arr[top:top+staging, left:left+staging] can be
            # short only if th/tw < staging, which resize_target prevents;
            # keep the guard for robustness.
            return None
        return out


def get_decoder() -> Optional[NativeJpegDecoder]:
    """Build (once) and return the native decoder, or None if disabled or
    the build failed. HST_NATIVE_DECODE: '0' off, '1' required, unset auto."""
    global _decoder, _failed
    mode = os.environ.get("HST_NATIVE_DECODE", "").strip()
    if mode == "0":
        return None
    with _lock:
        if _decoder is not None:
            return _decoder
        if _failed is not None and mode != "1":
            return None
        try:
            _decoder = NativeJpegDecoder(_compile())
            return _decoder
        except Exception as e:
            _failed = str(e)
            if mode == "1":
                raise
            return None


def is_jpeg(data: bytes) -> bool:
    return len(data) > 3 and data[:2] == b"\xff\xd8"
