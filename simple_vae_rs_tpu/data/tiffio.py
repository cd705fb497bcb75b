"""Minimal pure-numpy TIFF reader/writer for satellite tiles.

The reference reads Sen2Venus GeoTIFF tiles with ``tifffile``
(``dataset.py:151-152``); that package isn't a baked-in dependency here, so
this module implements the subset real GeoTIFF tiles need: striped baseline
TIFF, single-image, uint8/16/32, int16/32 and float32 samples, both planar
configurations (band-interleaved ``(H, W, C)`` and band-sequential
``(C, H, W)``), little- and big-endian, and the compressions GDAL commonly
writes — **Deflate/zlib (8 and legacy 32946) and LZW (5)**, each with or
without the horizontal-differencing predictor (tag 317 = 2). If
``tifffile`` is importable it is preferred.
"""

from __future__ import annotations

import struct
import zlib
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
_PREDICTOR = 317
_SAMPLE_FORMAT = 339

# compression codes
_COMP_NONE = 1
_COMP_LZW = 5
_COMP_DEFLATE = 8
_COMP_DEFLATE_OLD = 32946

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


# --------------------------------------------------------------- LZW codec
# TIFF-variant LZW (TIFF 6.0 §13): MSB-first bit packing, 9-bit initial
# codes, ClearCode=256, EOI=257, and the "early change" quirk — the code
# width bumps one entry *before* the table fills (at 510/1022/2046).
_LZW_CLEAR = 256
_LZW_EOI = 257


def _lzw_decode(data: bytes) -> bytes:
    out = bytearray()
    table: List[bytes] = []

    def reset():
        nonlocal table, width
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9

    width = 9
    reset()
    bitbuf = 0
    nbits = 0
    prev: bytes | None = None
    pos = 0
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)  # missing EOI: tolerate truncated strips
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == _LZW_EOI:
            return bytes(out)
        if code == _LZW_CLEAR:
            reset()
            prev = None
            continue
        if prev is None:
            if code >= len(table):
                raise ValueError(f"corrupt LZW stream: code {code}")
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        elif code == len(table):  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        else:
            raise ValueError(f"corrupt LZW stream: code {code}")
        out += entry
        prev = entry
        # early change: width grows when the NEXT entry would not fit
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1


def _lzw_encode(data: bytes) -> bytes:
    out = bytearray()
    bitbuf = 0
    nbits = 0

    def emit(code: int, width: int):
        nonlocal bitbuf, nbits
        bitbuf = (bitbuf << width) | code
        nbits += width
        while nbits >= 8:
            out.append((bitbuf >> (nbits - 8)) & 0xFF)
            nbits -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(_LZW_CLEAR, width)
    w = b""
    for byte in data:
        wk = w + bytes([byte])
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        table[wk] = next_code
        next_code += 1
        # width-bump mirror of the decoder: the decoder grows its width
        # once its table reaches 511/1023/2047 entries (= next_code - 1
        # here), verified against libtiff-written streams in the tests
        if next_code >= (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # table nearly full: reset
            emit(_LZW_CLEAR, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        w = bytes([byte])
    if w:
        emit(table[w], width)
        # the decoder appends a table entry for this final code too, and
        # may bump its width before reading EOI — mirror that bump here or
        # the EOI (and the stream end) desync when the final entry lands
        # exactly on a 511/1023/2047 boundary
        if next_code + 1 >= (1 << width) and width < 12:
            width += 1
    emit(_LZW_EOI, width)
    if nbits:
        out.append((bitbuf << (8 - nbits)) & 0xFF)
    return bytes(out)


def _decompress_strip(raw: bytes, comp: int, path: str, size_hint: int = 0) -> bytes:
    if comp == _COMP_NONE:
        return raw
    if comp in (_COMP_DEFLATE, _COMP_DEFLATE_OLD):
        return zlib.decompress(raw)
    if comp == _COMP_LZW:
        # prefer the native decoder (data/lzw.c, ~memory speed); the Python
        # loop below stays the semantic reference and the fallback
        from .lzw_native import lzw_decode_native

        out = lzw_decode_native(raw, size_hint)
        if out is not None:
            return out
        return _lzw_decode(raw)
    raise ValueError(
        f"{path}: compression={comp} unsupported without tifffile"
    )


def _undo_predictor(strip: np.ndarray, rows: int, width: int, chans: int):
    """Invert horizontal differencing (predictor 2) in place-ish.

    ``strip`` is the decoded 1-D sample array of one strip; differencing is
    per row, per channel, with wraparound in the sample dtype.
    """
    arr = strip.reshape(rows, width, chans)
    # cumsum in a wide int then wrap back to the storage dtype
    wide = np.cumsum(arr.astype(np.int64), axis=1)
    info_bits = arr.dtype.itemsize * 8
    wide &= (1 << info_bits) - 1
    return wide.astype(arr.dtype).reshape(-1)


def _apply_predictor(plane: np.ndarray) -> np.ndarray:
    """Horizontal differencing for the writer: (rows, width, chans) ints."""
    diffed = plane.copy()
    diffed[:, 1:, :] = plane[:, 1:, :] - plane[:, :-1, :]
    return diffed


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
    pred = tags.get(_PREDICTOR, [1])[0]

    kind = {1: "u", 2: "i", 3: "f"}.get(sfmt, "u")
    dtype = np.dtype(f"{bo}{kind}{bits // 8}")

    offsets = tags[_STRIP_OFFSETS]
    counts = tags[_STRIP_BYTE_COUNTS]
    rps = tags.get(_ROWS_PER_STRIP, [height])[0]
    strip_chans = spp if planar == 1 else 1
    strip_hint = min(rps, height * (spp if planar == 2 else 1)) * width * strip_chans * (bits // 8)
    strips = [
        _decompress_strip(data[o : o + c], comp, path, strip_hint)
        for o, c in zip(offsets, counts)
    ]
    if pred == 2:
        if kind == "f":
            raise ValueError(f"{path}: predictor 2 on float samples")
        chans = spp if planar == 1 else 1
        row_samples = width * chans
        parts = []
        for sdata in strips:
            s_arr = np.frombuffer(sdata, dtype=dtype)
            rows = s_arr.size // row_samples
            parts.append(_undo_predictor(s_arr, rows, width, chans))
        arr = np.concatenate(parts)
    elif pred != 1:
        raise ValueError(f"{path}: predictor {pred} unsupported")
    else:
        arr = np.frombuffer(b"".join(strips), dtype=dtype)

    if spp == 1:
        return arr.reshape(height, width).astype(dtype.newbyteorder("="))
    if planar == 2:
        return arr.reshape(spp, height, width).astype(dtype.newbyteorder("="))
    return arr.reshape(height, width, spp).astype(dtype.newbyteorder("="))


_WRITE_COMP = {"none": _COMP_NONE, "deflate": _COMP_DEFLATE, "lzw": _COMP_LZW}


def write_tiff(
    path: str,
    array: np.ndarray,
    planar_channels_first: bool = False,
    compression: str = "none",
    predictor: bool = False,
) -> None:
    """Write a striped TIFF (one strip).

    ``array``: (H, W), (H, W, C) interleaved, or (C, H, W) when
    ``planar_channels_first`` — matching what ``read_tiff`` returns.
    ``compression``: "none" | "deflate" | "lzw"; ``predictor`` applies
    horizontal differencing (integer samples only) before compression —
    the combination GDAL typically writes for satellite tiles.
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
    le = arr.astype(arr.dtype.newbyteorder("<"))
    if predictor:
        if arr.dtype.kind == "f":
            raise ValueError("predictor requires integer samples")
        chans = c if planar == 1 else 1
        rows = h if planar == 1 else h * c
        le = _apply_predictor(le.reshape(rows, w, chans)).reshape(le.shape)
    payload = le.tobytes()
    comp = _WRITE_COMP[compression]
    if comp == _COMP_DEFLATE:
        payload = zlib.compress(payload, 6)
    elif comp == _COMP_LZW:
        payload = _lzw_encode(payload)

    tags = [
        (_IMAGE_WIDTH, 3, 1, w),
        (_IMAGE_LENGTH, 3, 1, h),
        (_BITS_PER_SAMPLE, 3, c, [bits] * c),
        (_COMPRESSION, 3, 1, comp),
        (_PHOTOMETRIC, 3, 1, 1),
        (_STRIP_OFFSETS, 4, 1, None),  # patched below
        (_SAMPLES_PER_PIXEL, 3, 1, c),
        (_ROWS_PER_STRIP, 3, 1, h if planar == 1 else h * c),
        (_STRIP_BYTE_COUNTS, 4, 1, len(payload)),
        (_PLANAR_CONFIG, 3, 1, planar),
        (_PREDICTOR, 3, 1, 2 if predictor else 1),
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
