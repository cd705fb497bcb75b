"""Minimal pure-numpy TIFF reader/writer for satellite tiles.

The reference reads Sen2Venus GeoTIFF tiles with ``tifffile``
(``dataset.py:151-152``); that package isn't a baked-in dependency here, so
this module implements the small subset needed: uncompressed striped
baseline TIFF, single-image, uint8/16/32, int16/32 and float32 samples,
both planar configurations (band-interleaved ``(H, W, C)`` and
band-sequential ``(C, H, W)``), little- and big-endian. If ``tifffile`` is
importable it is preferred (it handles compressed variants).
"""

from __future__ import annotations

import struct
from typing import Dict, List

import numpy as np

try:  # pragma: no cover - exercised only when the package is installed
    import tifffile as _tifffile
except ImportError:
    _tifffile = None

# tag ids
_IMAGE_WIDTH = 256
_IMAGE_LENGTH = 257
_BITS_PER_SAMPLE = 258
_COMPRESSION = 259
_PHOTOMETRIC = 262
_STRIP_OFFSETS = 273
_SAMPLES_PER_PIXEL = 277
_ROWS_PER_STRIP = 278
_STRIP_BYTE_COUNTS = 279
_PLANAR_CONFIG = 284
_SAMPLE_FORMAT = 339

_TYPE_SIZES = {1: 1, 2: 1, 3: 2, 4: 4, 5: 8, 6: 1, 7: 1, 8: 2, 9: 4, 10: 8, 11: 4, 12: 8}
_TYPE_FMT = {1: "B", 3: "H", 4: "I", 6: "b", 8: "h", 9: "i", 11: "f", 12: "d"}


def _read_ifd_entries(data: bytes, offset: int, bo: str) -> Dict[int, List]:
    (count,) = struct.unpack_from(bo + "H", data, offset)
    entries: Dict[int, List] = {}
    for i in range(count):
        base = offset + 2 + i * 12
        tag, typ, n = struct.unpack_from(bo + "HHI", data, base)
        size = _TYPE_SIZES.get(typ, 1) * n
        if size <= 4:
            raw = data[base + 8 : base + 8 + size]
        else:
            (ptr,) = struct.unpack_from(bo + "I", data, base + 8)
            raw = data[ptr : ptr + size]
        fmt = _TYPE_FMT.get(typ)
        if fmt is None:
            continue
        entries[tag] = list(struct.unpack(bo + fmt * n, raw))
    return entries


def read_tiff(path: str) -> np.ndarray:
    """Read the first image of a TIFF file.

    Returns ``(H, W)`` for single-band, ``(H, W, C)`` for interleaved, or
    ``(C, H, W)`` for band-sequential planar files — mirroring tifffile's
    behavior so datasets treat both readers identically.
    """
    if _tifffile is not None:
        return _tifffile.imread(path)
    with open(path, "rb") as fh:
        data = fh.read()
    if data[:2] == b"II":
        bo = "<"
    elif data[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError(f"{path}: not a TIFF file")
    (magic,) = struct.unpack_from(bo + "H", data, 2)
    if magic != 42:
        raise ValueError(f"{path}: unsupported TIFF magic {magic} (bigtiff?)")
    (ifd_off,) = struct.unpack_from(bo + "I", data, 4)
    tags = _read_ifd_entries(data, ifd_off, bo)

    width = tags[_IMAGE_WIDTH][0]
    height = tags[_IMAGE_LENGTH][0]
    spp = tags.get(_SAMPLES_PER_PIXEL, [1])[0]
    bits = tags.get(_BITS_PER_SAMPLE, [8])[0]
    comp = tags.get(_COMPRESSION, [1])[0]
    planar = tags.get(_PLANAR_CONFIG, [1])[0]
    sfmt = tags.get(_SAMPLE_FORMAT, [1])[0]
    if comp != 1:
        raise ValueError(f"{path}: compressed TIFF (compression={comp}) unsupported "
                         "without tifffile")

    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt, "u")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    raw = b"".join(data[o : o + c] for o, c in zip(offsets, counts))
    arr = np.frombuffer(raw, dtype=dtype)

    if spp == 1:
        return arr.reshape(height, width).astype(dtype.newbyteorder("="))
    if planar == 2:
        return arr.reshape(spp, height, width).astype(dtype.newbyteorder("="))
    return arr.reshape(height, width, spp).astype(dtype.newbyteorder("="))


def write_tiff(path: str, array: np.ndarray, planar_channels_first: bool = False) -> None:
    """Write an uncompressed striped TIFF.

    ``array``: (H, W), (H, W, C) interleaved, or (C, H, W) when
    ``planar_channels_first`` — matching what ``read_tiff`` returns.
    """
    arr = np.ascontiguousarray(array)
    if arr.ndim == 2:
        h, w, c, planar = arr.shape[0], arr.shape[1], 1, 1
    elif planar_channels_first:
        c, h, w = arr.shape
        planar = 2
    else:
        h, w, c = arr.shape
        planar = 1

    kind_map = {"u": 1, "i": 2, "f": 3}
    sfmt = kind_map[arr.dtype.kind]
    bits = arr.dtype.itemsize * 8
    payload = arr.astype(arr.dtype.newbyteorder("<")).tobytes()

    tags = [
        (_IMAGE_WIDTH, 3, 1, w),
        (_IMAGE_LENGTH, 3, 1, h),
        (_BITS_PER_SAMPLE, 3, c, [bits] * c),
        (_COMPRESSION, 3, 1, 1),
        (_PHOTOMETRIC, 3, 1, 1),
        (_STRIP_OFFSETS, 4, 1, None),  # patched below
        (_SAMPLES_PER_PIXEL, 3, 1, c),
        (_ROWS_PER_STRIP, 3, 1, h if planar == 1 else h * c),
        (_STRIP_BYTE_COUNTS, 4, 1, len(payload)),
        (_PLANAR_CONFIG, 3, 1, planar),
        (_SAMPLE_FORMAT, 3, c, [sfmt] * c),
    ]

    header = struct.pack("<2sHI", b"II", 42, 8)
    n = len(tags)
    ifd_size = 2 + n * 12 + 4
    extra_off = 8 + ifd_size
    extra = b""
    entries = b""
    # first pass to place out-of-line values
    encoded = []
    for tag, typ, cnt, val in tags:
        fmt = _TYPE_FMT[typ]
        vals = val if isinstance(val, list) else [val]
        size = _TYPE_SIZES[typ] * cnt
        encoded.append((tag, typ, cnt, vals, fmt, size))
    data_off = extra_off
    for tag, typ, cnt, vals, fmt, size in encoded:
        if size > 4:
            data_off += size
    strip_offset = data_off
    extra_cursor = extra_off
    for tag, typ, cnt, vals, fmt, size in encoded:
        if tag == _STRIP_OFFSETS:
            vals = [strip_offset]
        packed = struct.pack("<" + fmt * cnt, *vals)
        if size <= 4:
            inline = packed + b"\x00" * (4 - size)
            entries += struct.pack("<HHI", tag, typ, cnt) + inline
        else:
            entries += struct.pack("<HHII", tag, typ, cnt, extra_cursor)
            extra += packed
            extra_cursor += size
    ifd = struct.pack("<H", n) + entries + struct.pack("<I", 0)
    with open(path, "wb") as fh:
        fh.write(header + ifd + extra + payload)
