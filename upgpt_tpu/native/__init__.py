"""Native (C++) host-runtime components.

The TPU compute path is jax/XLA/Pallas; the host runtime around it is
native where it pays. First component: a libjpeg decode core
(`jpeg_core.cpp`) whose ctypes entry points release the GIL for the whole
decode, so the thread-pool `PrefetchDataLoader` parallelizes across real
cores without the worker-process loader's spawn/pickle transport
(reference analog: torch DataLoader's C-side decode workers,
reference main.py:208-250).

Build model: compiled lazily on first use with g++ into the package dir
(one small TU, <1 s); any failure (no compiler, no libjpeg, exotic
platform) degrades silently to `available() == False` and callers fall
back to PIL. Decode output is bit-exact with PIL's (same libjpeg, same
default JDCT_ISLOW IDCT) — asserted in tests/test_native_decode.py.

Env:
  UPGPT_NATIVE_DECODE=0  disable the native path (PIL everywhere).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
import threading
from pathlib import Path
from typing import Optional

import numpy as np

_HERE = Path(__file__).resolve().parent
_SO = _HERE / "_libupgpt_jpeg.so"
_SRC = _HERE / "jpeg_core.cpp"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_state = "unbuilt"  # unbuilt | ok | failed


def _build() -> bool:
    """Compile jpeg_core.cpp -> _libupgpt_jpeg.so (atomic rename)."""
    try:
        with tempfile.NamedTemporaryFile(
            suffix=".so", dir=str(_HERE), delete=False
        ) as tmp:
            tmp_path = tmp.name
        proc = subprocess.run(
            ["g++", "-O3", "-fPIC", "-shared", str(_SRC), "-o", tmp_path,
             "-ljpeg"],
            capture_output=True,
            timeout=120,
        )
        if proc.returncode != 0:
            os.unlink(tmp_path)
            return False
        os.replace(tmp_path, _SO)
        return True
    except (OSError, subprocess.SubprocessError):
        return False


def _probe_matches_pil(lib: ctypes.CDLL) -> bool:
    """Decode one in-memory probe JPEG through the native core and PIL.

    Bit-exactness with PIL holds only when both link the SAME libjpeg
    (same IDCT tables); on a host where PIL bundles a different
    libjpeg(-turbo) than the system one the .so found, output would
    silently diverge. This first-load probe disables the native path on
    any mismatch instead of trusting the build-host test.
    """
    try:
        import io

        from PIL import Image

        rng = np.random.default_rng(0)
        # low-frequency content so every libjpeg agrees it is decodable
        img = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
        img = np.kron(img, np.ones((16, 16, 1), np.uint8))
        buf = io.BytesIO()
        Image.fromarray(img).save(buf, format="JPEG", quality=88)
        data = buf.getvalue()

        pil = np.asarray(Image.open(io.BytesIO(data)).convert("RGB"))
        h = ctypes.c_int()
        w = ctypes.c_int()
        if lib.upgpt_jpeg_header(data, len(data), ctypes.byref(h),
                                 ctypes.byref(w)):
            return False
        out = np.empty((h.value, w.value, 3), np.uint8)
        if lib.upgpt_decode_jpeg(data, len(data), out.ctypes.data,
                                 h.value, w.value):
            return False
        return out.shape == pil.shape and np.array_equal(out, pil)
    except Exception:  # noqa: BLE001 — any probe hiccup -> PIL fallback
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _state
    if _state != "unbuilt":
        return _lib
    with _lock:
        if _state != "unbuilt":
            return _lib
        try:
            fresh = _SO.exists() and _SO.stat().st_mtime >= _SRC.stat().st_mtime
            if not fresh and not _build():
                _state = "failed"
                return None
            lib = ctypes.CDLL(str(_SO))
            lib.upgpt_jpeg_header.restype = ctypes.c_int
            lib.upgpt_jpeg_header.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t,
                ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
            ]
            lib.upgpt_decode_jpeg.restype = ctypes.c_int
            lib.upgpt_decode_jpeg.argtypes = [
                ctypes.c_char_p, ctypes.c_size_t, ctypes.c_void_p,
                ctypes.c_int, ctypes.c_int,
            ]
            if not _probe_matches_pil(lib):
                _state = "failed"
                return None
            _lib = lib
            _state = "ok"
        except OSError:
            _state = "failed"
    return _lib


def available() -> bool:
    """True iff the native decoder is built (or buildable) and enabled."""
    if os.environ.get("UPGPT_NATIVE_DECODE", "1") == "0":
        return False
    return _load() is not None


def decode_jpeg(data: bytes) -> Optional[np.ndarray]:
    """Decode a JPEG byte string to an HWC uint8 RGB array.

    Returns None on any decode problem (caller falls back to PIL). The
    foreign call releases the GIL, so concurrent callers on a thread pool
    decode truly in parallel.
    """
    lib = _load()
    if lib is None:
        return None
    h = ctypes.c_int()
    w = ctypes.c_int()
    if lib.upgpt_jpeg_header(data, len(data), ctypes.byref(h), ctypes.byref(w)):
        return None
    out = np.empty((h.value, w.value, 3), np.uint8)
    if lib.upgpt_decode_jpeg(data, len(data), out.ctypes.data,
                             h.value, w.value):
        return None
    return out


def decode_jpeg_file(path) -> Optional[np.ndarray]:
    """Read + decode a JPEG file; None on failure."""
    try:
        with open(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    return decode_jpeg(data)
