"""ctypes loader for the native TIFF-LZW decoder (``lzw.c``).

The pure-Python decoder in :mod:`tiffio` runs at a few MB/s — fine for
tests, but on real compressed Sen2Venus tiles (the reference reads them
with tifffile/libtiff, ``dataset.py:151-152``) strip decode would become
the data-pipeline bottleneck. This module compiles ``lzw.c`` on first use
with the system C compiler (``cc -O3 -shared -fPIC``), caches the shared
object keyed by the source hash, and exposes :func:`lzw_decode_native`.

Everything degrades gracefully: no compiler, an unwritable cache dir, or a
stream the C decoder rejects (-1) all return ``None`` and the caller falls
back to the Python decoder, which remains the semantic reference
(tests/test_data.py pins native == Python on random and libtiff streams).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import tempfile
from pathlib import Path
from typing import Optional

_SRC = Path(__file__).with_name("lzw.c")
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> Optional[ctypes.CDLL]:
    try:
        src = _SRC.read_bytes()
    except OSError:
        return None
    tag = hashlib.sha256(src).hexdigest()[:16]
    candidates = (
        Path(__file__).parent / "_native",
        Path(tempfile.gettempdir()) / "svrs_native",
    )
    cc = os.environ.get("CC", "cc")
    for base in candidates:
        so = base / f"lzw_{tag}.so"
        try:
            if not so.exists():
                base.mkdir(parents=True, exist_ok=True)
                # compile to a pid-unique temp name, then atomically rename,
                # so concurrent workers never load a half-written .so
                tmp = base / f"lzw_{tag}.{os.getpid()}.tmp.so"
                subprocess.run(
                    [cc, "-O3", "-shared", "-fPIC", "-o", str(tmp), str(_SRC)],
                    check=True,
                    capture_output=True,
                )
                os.replace(tmp, so)
            return ctypes.CDLL(str(so))
        except (OSError, subprocess.CalledProcessError):
            continue
    return None


def get_lib() -> Optional[ctypes.CDLL]:
    """Build+load the shared object once; ``None`` if unavailable."""
    global _lib, _tried
    if not _tried:
        _tried = True
        lib = _build()
        if lib is not None:
            for name in ("svrs_lzw_decode", "svrs_lzw_encode"):
                fn = getattr(lib, name)
                fn.restype = ctypes.c_long
                fn.argtypes = [
                    ctypes.c_char_p,
                    ctypes.c_long,
                    ctypes.POINTER(ctypes.c_char),
                    ctypes.c_long,
                ]
            _lib = lib
    return _lib


def lzw_decode_native(data: bytes, size_hint: int = 0) -> Optional[bytes]:
    """Decode a TIFF-LZW stream natively; ``None`` → caller must fall back.

    ``size_hint`` is the expected decoded size (e.g. the strip's sample
    bytes); the buffer starts there and doubles on -2 (too small). A -1
    (corrupt stream) also returns ``None`` so the Python decoder defines
    the error behavior.
    """
    lib = get_lib()
    if lib is None:
        return None
    cap = max(int(size_hint), 4 * len(data) + 1024)
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.svrs_lzw_decode(data, len(data), buf, cap)
        if n == -2:
            cap *= 2
            continue
        if n < 0:
            return None
        return buf.raw[:n]


def lzw_encode_native(data: bytes) -> Optional[bytes]:
    """Encode to TIFF-LZW natively; ``None`` → caller must fall back.

    Output is byte-identical to ``tiffio._lzw_encode`` (pinned by tests),
    so the two encoders are interchangeable; the native one runs at
    memory speed, which is what makes LZW-compressed whole-scene SR
    products practical (``raster --stream --compression lzw``).
    """
    lib = get_lib()
    if lib is None:
        return None
    # worst case the 12-bit codes expand 8-bit literals 1.5x, plus CLEAR
    # resets every ~3836 codes and the header/EOI — 2x + slack is safe
    cap = 2 * len(data) + 1024
    while True:
        buf = ctypes.create_string_buffer(cap)
        n = lib.svrs_lzw_encode(data, len(data), buf, cap)
        if n == -2:  # only reachable if the bound above is ever wrong
            cap *= 2
            continue
        if n < 0:  # allocation failure: Python encoder takes over
            return None
        return buf.raw[:n]
