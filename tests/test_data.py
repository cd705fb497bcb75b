"""Data layer: TIFF codec roundtrip, datasets, on-device patchify, loader."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.data.datasets import (
    FloodDataset,
    Sen2VenusDataset,
    SyntheticSRDataset,
)
from simple_vae_rs_tpu.data.loader import DeviceLoader, init_dataloader
from simple_vae_rs_tpu.data.tiffio import read_tiff, write_tiff
from simple_vae_rs_tpu.ops.patchify import (
    grid_patchify,
    grid_sr_batch,
    grid_unpatchify,
    random_sr_crop_batch,
)


# ------------------------------------------------------------------ tiffio
@pytest.mark.parametrize("dtype", [np.uint8, np.uint16, np.int16, np.float32])
def test_tiff_roundtrip_interleaved(tmp_path, dtype):
    rng = np.random.default_rng(0)
    arr = (rng.random((17, 13, 4)) * 100).astype(dtype)
    path = str(tmp_path / "t.tif")
    write_tiff(path, arr)
    out = read_tiff(path)
    np.testing.assert_array_equal(out, arr)


def test_tiff_roundtrip_planar_channels_first(tmp_path):
    rng = np.random.default_rng(1)
    arr = (rng.random((4, 32, 32)) * 10000).astype(np.uint16)
    path = str(tmp_path / "p.tif")
    write_tiff(path, arr, planar_channels_first=True)
    out = read_tiff(path)
    assert out.shape == (4, 32, 32)
    np.testing.assert_array_equal(out, arr)


def test_tiff_single_band(tmp_path):
    arr = np.arange(64, dtype=np.uint16).reshape(8, 8)
    path = str(tmp_path / "s.tif")
    write_tiff(path, arr)
    np.testing.assert_array_equal(read_tiff(path), arr)


@pytest.mark.parametrize("compression", ["deflate", "lzw"])
@pytest.mark.parametrize("predictor", [False, True])
def test_tiff_compressed_roundtrip(tmp_path, compression, predictor):
    """Deflate/LZW (+ horizontal-differencing predictor) — the GDAL
    combinations real Sen2Venus tiles ship with."""
    rng = np.random.default_rng(2)
    # smooth-ish int16 data like satellite radiances (predictor-friendly)
    base = (rng.random((33, 29, 4)) * 50).cumsum(axis=1)
    arr = base.astype(np.int16)
    path = str(tmp_path / f"c_{compression}_{predictor}.tif")
    write_tiff(path, arr, compression=compression, predictor=predictor)
    out = read_tiff(path)
    np.testing.assert_array_equal(out, arr)
    # the payload really is transformed (not a silently-uncompressed file)
    with open(path, "rb") as fh:
        blob = fh.read()
    assert arr.astype("<i2").tobytes() not in blob


def test_tiff_compressed_planar_uint16(tmp_path):
    rng = np.random.default_rng(3)
    arr = (rng.random((4, 16, 16)) * 10000).astype(np.uint16)
    path = str(tmp_path / "cp.tif")
    write_tiff(path, arr, planar_channels_first=True, compression="lzw",
               predictor=True)
    out = read_tiff(path)
    assert out.shape == (4, 16, 16)
    np.testing.assert_array_equal(out, arr)


def test_tiff_lzw_codec_exercises_width_growth_and_reset():
    """Raw LZW codec roundtrip on >100 KB of mixed data: drives the code
    width through 9->12 bits, the early-change boundaries, and at least
    one table reset."""
    from simple_vae_rs_tpu.data.tiffio import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(4)
    smooth = np.repeat(rng.integers(0, 255, 30_000), 3).astype(np.uint8)
    noisy = rng.integers(0, 255, 60_000).astype(np.uint8)
    data = smooth.tobytes() + noisy.tobytes()
    enc = _lzw_encode(data)
    assert _lzw_decode(enc) == data
    assert len(enc) < len(data)  # the smooth half must compress


def test_tiff_lzw_final_code_on_width_boundary(tmp_path):
    """Regression: the encoder must mirror the decoder's width bump for
    the FINAL flushed code (the decoder appends a table entry for it and
    may widen before reading EOI) — desync corrupted streams whose last
    entry landed exactly on a 511/1023/2047 table-size boundary."""
    from simple_vae_rs_tpu.data.tiffio import _lzw_decode, _lzw_encode

    rng = np.random.default_rng(7)
    # incompressible payload sweep across the 511 and 1023 boundaries:
    # every length must round-trip exactly (the bug truncated/extended)
    for n in list(range(240, 280)) + list(range(740, 790)):
        data = rng.integers(0, 256, n).astype(np.uint8).tobytes()
        enc = _lzw_encode(data)
        assert _lzw_decode(enc) == data, f"len={n}"
    # the originally-reproduced end-to-end failure shape
    arr = rng.integers(0, 256, (59, 13)).astype(np.uint8)
    path = str(tmp_path / "boundary.tif")
    write_tiff(path, arr, compression="lzw")
    np.testing.assert_array_equal(read_tiff(path), arr)


def test_native_lzw_matches_python_decoder():
    """The C decoder (data/lzw.c) is pinned byte-for-byte to the Python
    reference decoder across compressible, incompressible, and
    table-reset-sized streams (plus the regrow path via a tiny hint)."""
    from simple_vae_rs_tpu.data.lzw_native import get_lib, lzw_decode_native
    from simple_vae_rs_tpu.data.tiffio import _lzw_decode, _lzw_encode

    if get_lib() is None:
        pytest.skip("no C toolchain available")
    rng = np.random.default_rng(11)
    payloads = [
        b"",
        b"a",
        b"abcabcabcabd" * 40,
        rng.integers(0, 256, 5_000).astype(np.uint8).tobytes(),
        np.repeat(rng.integers(0, 255, 20_000), 3).astype(np.uint8).tobytes()
        + rng.integers(0, 256, 40_000).astype(np.uint8).tobytes(),
    ]
    for data in payloads:
        enc = _lzw_encode(data)
        assert lzw_decode_native(enc, len(data)) == _lzw_decode(enc) == data
        # size_hint=1 forces the -2 regrow-and-retry path
        assert lzw_decode_native(enc, 1) == data
    # corrupt stream: native refuses (None) so Python defines the behavior
    assert lzw_decode_native(b"\xff\xff\xff\xff\xff\xff", 16) is None


def test_native_lzw_decodes_truncated_strip():
    """Streams that end without an EOI decode to their intact prefix in
    both decoders (GDAL occasionally writes such strips)."""
    from simple_vae_rs_tpu.data.lzw_native import get_lib, lzw_decode_native
    from simple_vae_rs_tpu.data.tiffio import _lzw_decode, _lzw_encode

    if get_lib() is None:
        pytest.skip("no C toolchain available")
    data = b"the quick brown fox " * 64
    enc = _lzw_encode(data)
    cut = enc[: len(enc) - 4]
    assert lzw_decode_native(cut, len(data)) == _lzw_decode(cut)


def _write_monolithic_planar(path, chw, compression=1, predictor=False):
    """Legacy pre-streaming layout: band-sequential data in ONE strip
    (rows-per-strip = H*C, a single offset). Files written by earlier
    releases look like this; the reader must keep accepting them."""
    import struct
    import zlib

    from simple_vae_rs_tpu.data import tiffio as t

    c, h, w = chw.shape
    le = np.ascontiguousarray(chw).astype(chw.dtype.newbyteorder("<"))
    if predictor:
        le = t._apply_predictor(le.reshape(h * c, w, 1)).reshape(le.shape)
    payload = le.tobytes()
    if compression == 8:
        payload = zlib.compress(payload, 6)
    elif compression == 5:
        payload = t._lzw_encode(payload)
    bits = chw.dtype.itemsize * 8
    sfmt = {"u": 1, "i": 2, "f": 3}[chw.dtype.kind]
    tags = [
        (256, 3, 1, [w]), (257, 3, 1, [h]), (258, 3, c, [bits] * c),
        (259, 3, 1, [compression]), (262, 3, 1, [1]),
        (273, 4, 1, [0]),  # strip offset patched below
        (277, 3, 1, [c]), (278, 3, 1, [h * c]),
        (279, 4, 1, [len(payload)]), (284, 3, 1, [2]),
        (317, 3, 1, [2 if predictor else 1]), (339, 3, c, [sfmt] * c),
    ]
    n = len(tags)
    extra_off = 8 + 2 + n * 12 + 4
    extra = b""
    entries = b""
    data_off = extra_off + sum(
        t._TYPE_SIZES[typ] * cnt
        for _, typ, cnt, _v in tags
        if t._TYPE_SIZES[typ] * cnt > 4
    )
    cursor = extra_off
    for tag, typ, cnt, vals in tags:
        if tag == 273:
            vals = [data_off]
        fmt = t._TYPE_FMT[typ]
        size = t._TYPE_SIZES[typ] * cnt
        packed = struct.pack("<" + fmt * cnt, *vals)
        if size <= 4:
            entries += struct.pack("<HHI", tag, typ, cnt) + packed + \
                b"\x00" * (4 - size)
        else:
            entries += struct.pack("<HHII", tag, typ, cnt, cursor)
            extra += packed
            cursor += size
    with open(path, "wb") as fh:
        fh.write(struct.pack("<2sHI", b"II", 42, 8))
        fh.write(struct.pack("<H", n) + entries + struct.pack("<I", 0))
        fh.write(extra + payload)


@pytest.mark.parametrize("compression,predictor",
                         [(1, False), (8, True), (5, False)])
def test_tiff_reads_legacy_monolithic_planar(tmp_path, compression, predictor):
    from simple_vae_rs_tpu.data.tiffio import TiffReader, read_tiff

    rng = np.random.default_rng(13)
    chw = (rng.random((4, 14, 9)) * 60000).astype(np.uint16)
    path = str(tmp_path / "legacy.tif")
    _write_monolithic_planar(path, chw, compression, predictor)
    assert np.array_equal(read_tiff(path), chw)
    with TiffReader(path) as r:
        assert r.layout == "chw"
        assert np.array_equal(r.read_rows(3, 11), chw[:, 3:11])


def test_monolithic_planar_decodes_payload_once(tmp_path, monkeypatch):
    """A single-strip band-sequential file can only be decoded
    front-to-back, so the reader decodes it ONCE and serves plane views
    — the old path re-decompressed the entire payload per plane per
    window (4x the full-file LZW decode on a 4-band scene sweep) and
    pinned duplicate plane copies in the strip cache."""
    from simple_vae_rs_tpu.data import tiffio

    rng = np.random.default_rng(14)
    chw = (rng.random((4, 14, 9)) * 60000).astype(np.uint16)
    path = str(tmp_path / "legacy.tif")
    _write_monolithic_planar(path, chw, compression=5)

    calls = {"n": 0}
    real = tiffio._decompress_strip

    def counting(*a, **k):
        calls["n"] += 1
        return real(*a, **k)

    monkeypatch.setattr(tiffio, "_decompress_strip", counting)
    with tiffio.TiffReader(path) as r:
        # several windows over all four planes: still one decode
        assert np.array_equal(r.read_rows(0, 5), chw[:, 0:5])
        assert np.array_equal(r.read_rows(3, 11), chw[:, 3:11])
        assert np.array_equal(r.read_rows(10, 14), chw[:, 10:14])
    assert calls["n"] == 1


def test_native_lzw_encoder_matches_python():
    """The C encoder's output is byte-identical to the Python reference
    (same greedy table, width-bump schedule, 4094 reset, final-code bump),
    so the two are interchangeable and every decoder accepts both."""
    from simple_vae_rs_tpu.data.lzw_native import get_lib, lzw_encode_native
    from simple_vae_rs_tpu.data.tiffio import _lzw_decode, _lzw_encode

    if get_lib() is None:
        pytest.skip("no C toolchain available")
    rng = np.random.default_rng(9)
    cases = [
        b"",
        b"a",
        b"ab" * 5,
        bytes(rng.integers(0, 256, 70000, dtype=np.uint8)),  # ~18 resets
        bytes(rng.integers(0, 4, 50000, dtype=np.uint8)),  # deep strings
        (np.arange(30000, dtype=np.uint8) % 7).tobytes(),
        b"\x00" * 20000,  # KwKwK run
    ]
    for data in cases:
        enc = lzw_encode_native(data)
        assert enc == _lzw_encode(data)
        assert _lzw_decode(enc) == data


def test_tiff_lzw_decodes_libtiff_streams(tmp_path):
    """Conformance against a real libtiff encoder: Pillow writes a
    multi-strip LZW TIFF; our reader must reproduce the pixels (this is
    what pins the decoder's early-change width schedule to the spec)."""
    PIL = pytest.importorskip("PIL")
    from PIL import Image

    assert PIL.features.check("libtiff") if hasattr(PIL, "features") else True
    rng = np.random.default_rng(5)
    smooth = np.repeat(rng.integers(0, 255, 30_000), 3).astype(np.uint8)
    noisy = rng.integers(0, 255, 60_000).astype(np.uint8)
    data = np.concatenate([smooth, noisy])
    h = 300
    w = data.size // h
    arr = data[: h * w].reshape(h, w)
    path = str(tmp_path / "libtiff_lzw.tif")
    Image.fromarray(arr).save(path, compression="tiff_lzw")
    np.testing.assert_array_equal(read_tiff(path), arr)


def test_tiff_deflate_decodes_libtiff_streams(tmp_path):
    pytest.importorskip("PIL")
    from PIL import Image

    rng = np.random.default_rng(6)
    arr = (rng.random((64, 48)) * 255).astype(np.uint8)
    path = str(tmp_path / "libtiff_zip.tif")
    Image.fromarray(arr).save(path, compression="tiff_adobe_deflate")
    np.testing.assert_array_equal(read_tiff(path), arr)


def test_tiff_unknown_compression_raises(tmp_path):
    arr = np.zeros((4, 4), np.uint8)
    path = str(tmp_path / "x.tif")
    write_tiff(path, arr)
    # patch the compression tag to an unsupported codec (JPEG=7)
    import struct

    with open(path, "rb") as fh:
        blob = bytearray(fh.read())
    idx = blob.find(struct.pack("<HHI", 259, 3, 1))
    assert idx > 0
    struct.pack_into("<H", blob, idx + 8, 7)
    with open(path, "wb") as fh:
        fh.write(blob)
    with pytest.raises(ValueError, match="compression=7"):
        read_tiff(path)


# ---------------------------------------------------------------- patchify
def test_grid_patchify_row_major_order():
    # tile whose value encodes (row, col) of the 2x2 patch grid
    tile = np.zeros((1, 4, 4, 1), np.float32)
    tile[0, :2, 2:] = 1  # (row0, col1)
    tile[0, 2:, :2] = 2  # (row1, col0)
    tile[0, 2:, 2:] = 3
    patches = np.asarray(grid_patchify(jnp.array(tile), 2))
    assert patches.shape == (4, 2, 2, 1)
    # row-major: 0, 1, 2, 3 — matches reference select_crop (dataset.py:220-228)
    np.testing.assert_array_equal(patches[:, 0, 0, 0], [0, 1, 2, 3])


def test_grid_unpatchify_roundtrip():
    rng = np.random.default_rng(2)
    tiles = rng.random((2, 8, 8, 3)).astype(np.float32)
    patches = grid_patchify(jnp.array(tiles), 4)
    back = np.asarray(grid_unpatchify(patches, 2))
    np.testing.assert_array_equal(back, tiles)


def test_grid_sr_batch_alignment_and_normalization():
    from simple_vae_rs_tpu.utils.image import normalize_image

    rng = np.random.default_rng(3)
    hr = rng.random((2, 32, 32, 4)).astype(np.float32) * 500
    lr = hr.reshape(2, 16, 2, 16, 2, 4).mean(axis=(2, 4))
    lr_p, hr_p = grid_sr_batch(jnp.array(lr), jnp.array(hr), 16)
    assert lr_p.shape == (8, 8, 8, 4)  # 2 tiles x 4 patches, LR = patch/2
    assert hr_p.shape == (8, 16, 16, 4)
    assert float(jnp.min(lr_p)) >= 0.0 and float(jnp.max(lr_p)) <= 1.0
    # patch i covers the same footprint in both resolutions: patch 1 of
    # tile 0 is the top-right corner (row-major), normalized after cropping
    want_lr = np.asarray(normalize_image(jnp.array(lr[0, :8, 8:16])))
    np.testing.assert_allclose(np.asarray(lr_p[1]), want_lr, rtol=1e-5)
    want_hr = np.asarray(normalize_image(jnp.array(hr[0, :16, 16:32])))
    np.testing.assert_allclose(np.asarray(hr_p[1]), want_hr, rtol=1e-5)


def test_random_sr_crop_alignment():
    rng_np = np.random.default_rng(4)
    hr = rng_np.random((3, 64, 64, 4)).astype(np.float32)
    lr = hr.reshape(3, 32, 2, 32, 2, 4).mean(axis=(2, 4))
    lr_c, hr_c = random_sr_crop_batch(jax.random.PRNGKey(0), jnp.array(lr), jnp.array(hr), 32)
    assert lr_c.shape == (3, 16, 16, 4)
    assert hr_c.shape == (3, 32, 32, 4)
    # HR crop downsampled must equal the LR crop (both normalized the same
    # way only if min/max match; compare on correlation instead)
    hr_down = np.asarray(hr_c).reshape(3, 16, 2, 16, 2, 4).mean(axis=(2, 4))
    corr = np.corrcoef(hr_down.ravel(), np.asarray(lr_c).ravel())[0, 1]
    assert corr > 0.95


# ---------------------------------------------------------------- datasets
def test_synthetic_dataset_deterministic():
    ds = SyntheticSRDataset(length=4, hr_size=64, seed=5)
    lr, hr = ds[0]
    lr2, hr2 = ds[0]
    assert lr.shape == (32, 32, 4) and hr.shape == (64, 64, 4)
    np.testing.assert_array_equal(lr, lr2)
    # LR really is the 2x2 downsample of HR
    np.testing.assert_allclose(
        lr, hr.reshape(32, 2, 32, 2, 4).mean(axis=(1, 3)), rtol=1e-5
    )


def test_sen2venus_dataset_from_index(tmp_path):
    root = tmp_path / "ARM"
    os.makedirs(root)
    rng = np.random.default_rng(6)
    rows = ["b2b3b4b8_10m\tb2b3b4b8_05m"]
    from simple_vae_rs_tpu.data.tiffio import write_tiff

    for i in range(3):
        lr = (rng.random((4, 16, 16)) * 10000).astype(np.int16)
        hr = (rng.random((4, 32, 32)) * 10000).astype(np.int16)
        write_tiff(str(root / f"lr_{i}.tif"), lr, planar_channels_first=True)
        write_tiff(str(root / f"hr_{i}.tif"), hr, planar_channels_first=True)
        rows.append(f"lr_{i}.tif\thr_{i}.tif")
    (root / "index.csv").write_text("\n".join(rows))

    ds = Sen2VenusDataset(root=str(root))
    assert len(ds) == 3
    lr, hr = ds[1]
    assert lr.shape == (16, 16, 4) and hr.shape == (32, 32, 4)
    # integer tiles ship as int16 (half the host->device bytes); the
    # f32 cast happens on device in the patchify jit
    assert lr.dtype == np.int16


def test_make_index_builds_a_loadable_dataset(tmp_path, capsys):
    """scripts/make_index.py walks a tile tree, pairs *_10m*/*_05m*
    GeoTIFFs, skips dangling LR tiles, and writes the tab-separated
    index.csv Sen2VenusDataset consumes; --validate rejects pairs whose
    geometry is not 2x."""
    import importlib

    mi = importlib.import_module("scripts.make_index")
    from simple_vae_rs_tpu.data import Sen2VenusDataset

    rng = np.random.default_rng(21)
    root = tmp_path / "ARM"
    (root / "siteA").mkdir(parents=True)
    for site, stem in [("siteA", "T31_b2b3b4b8"), (".", "T32_b2b3b4b8")]:
        lr = (rng.random((10, 12, 4)) * 3000).astype(np.int16)
        hr = (rng.random((20, 24, 4)) * 3000).astype(np.int16)
        base = root / site
        write_tiff(str(base / f"{stem}_10m.tif"), lr, compression="deflate",
                   predictor=True)
        write_tiff(str(base / f"{stem}_05m.tif"), hr, compression="deflate",
                   predictor=True)
    # dangling LR with no HR sibling: skipped with a note
    write_tiff(str(root / "orphan_10m.tif"),
               np.zeros((10, 12, 4), np.int16))
    assert mi.main([str(root), "--validate"]) == 0
    assert "skipping orphan_10m.tif" in capsys.readouterr().err
    ds = Sen2VenusDataset(root=str(root))
    assert len(ds) == 2
    lr0, hr0 = ds[0]
    assert lr0.shape == (10, 12, 4) and hr0.shape == (20, 24, 4)

    # a broken pair (HR not 2x) fails --validate and writes nothing
    bad = tmp_path / "bad"
    bad.mkdir()
    write_tiff(str(bad / "x_10m.tif"), np.zeros((10, 12, 4), np.int16))
    write_tiff(str(bad / "x_05m.tif"), np.zeros((15, 24, 4), np.int16))
    assert mi.main([str(bad), "--validate"]) == 1
    assert not (bad / "index.csv").exists()
    assert mi.main([str(bad)]) == 0  # without --validate it indexes anyway


def test_flood_dataset(tmp_path):
    from simple_vae_rs_tpu.data.tiffio import write_tiff

    site = tmp_path / "site1" / "S2"
    os.makedirs(site)
    rng = np.random.default_rng(7)
    img = (rng.random((4, 128, 96)) * 5000).astype(np.uint16)
    write_tiff(str(site / "a.tif"), img, planar_channels_first=True)
    ds = FloodDataset(root=str(tmp_path), patch_size=64)
    assert len(ds) == 2  # 2x1 patches of 64 in 128x96
    a, b = ds[0]
    assert a.shape == (64, 64, 4)
    assert a.min() >= 0.0 and a.max() <= 1.0
    np.testing.assert_array_equal(a, b)


# ------------------------------------------------------------------ loader
def test_device_loader_grid_mode_batch_shape():
    ds = SyntheticSRDataset(length=6, hr_size=64, seed=8)
    loader = DeviceLoader(ds, batch_size=2, patch_size=32, crop="grid", prefetch=0)
    assert len(loader) == 3
    lr, hr = next(iter(loader))
    # 2 tiles x (64/32)^2 = 8 patches: grid mode batch = 4 x batch_size
    assert hr.shape == (8, 32, 32, 4)
    assert lr.shape == (8, 16, 16, 4)


def test_device_loader_random_mode_and_epochs_differ():
    ds = SyntheticSRDataset(length=4, hr_size=64, seed=9)
    loader = DeviceLoader(
        ds, batch_size=2, patch_size=32, crop="random", shuffle=True, prefetch=2
    )
    e1 = [np.asarray(hr) for _, hr in loader]
    e2 = [np.asarray(hr) for _, hr in loader]
    assert e1[0].shape == (2, 32, 32, 4)
    assert not all(np.array_equal(a, b) for a, b in zip(e1, e2))


def test_loader_workers_produce_identical_batches():
    """Multi-threaded item decode (workers=N) preserves order — batches
    are bit-identical to the serial loader (pool.map keeps index order;
    the RNG path depends only on epoch/step, not timing)."""
    from simple_vae_rs_tpu.data import SyntheticSRDataset
    from simple_vae_rs_tpu.data.loader import DeviceLoader

    ds = SyntheticSRDataset(seed=0)
    a = DeviceLoader(ds, 4, 32, crop="random", shuffle=True, seed=3)
    b = DeviceLoader(ds, 4, 32, crop="random", shuffle=True, seed=3,
                     workers=4)
    for (lr1, hr1), (lr2, hr2) in zip(a, b):
        np.testing.assert_array_equal(np.asarray(lr1), np.asarray(lr2))
        np.testing.assert_array_equal(np.asarray(hr1), np.asarray(hr2))
    with pytest.raises(ValueError, match="workers"):
        DeviceLoader(ds, 4, 32, workers=0)


def test_loader_close_shuts_down_decode_pool():
    """Loaders are built repeatedly in one process (sweeps, parity
    harnesses): close() must release the decode threads — and a closed
    loader still iterates through the serial path."""
    import threading

    from simple_vae_rs_tpu.data import SyntheticSRDataset
    from simple_vae_rs_tpu.data.loader import DeviceLoader

    ds = SyntheticSRDataset(seed=0)
    loader = DeviceLoader(ds, 4, 32, crop="random", workers=4)
    first = next(iter(loader))  # spin the pool up
    assert first[0].shape[0] == 4
    before = threading.active_count()
    loader.close()
    loader.close()  # idempotent
    assert loader._pool is None
    # pool threads exit promptly once released (shutdown(wait=False) —
    # they are idle, so give them a beat)
    deadline = 50
    while threading.active_count() >= before and deadline:
        import time

        time.sleep(0.05)
        deadline -= 1
    assert threading.active_count() < before
    nxt = next(iter(loader))  # serial fallback still works
    assert nxt[0].shape == first[0].shape


def test_loader_workers_propagate_item_errors():
    """A dataset error inside the thread pool surfaces to the consumer
    (same contract as the serial prefetch path)."""
    from simple_vae_rs_tpu.data.loader import DeviceLoader

    class Boom:
        def __len__(self):
            return 8

        def __getitem__(self, i):
            if i == 5:
                raise OSError("corrupt tile")
            a = np.zeros((4, 16, 16), np.float32)
            return a, np.zeros((4, 32, 32), np.float32)

    loader = DeviceLoader(Boom(), 8, 16, crop="random", workers=3)
    with pytest.raises(OSError, match="corrupt tile"):
        list(loader)


def test_loader_propagates_worker_errors():
    """An IO error in the prefetch thread must surface, not truncate the
    epoch silently."""

    class Broken:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            if i == 2:
                raise OSError("corrupt tile")
            a = np.zeros((8, 8, 4), np.float32)
            return a, np.zeros((16, 16, 4), np.float32)

    loader = DeviceLoader(Broken(), batch_size=1, patch_size=16, crop="grid",
                          prefetch=2)
    with pytest.raises(OSError, match="corrupt tile"):
        for _ in loader:
            pass


def test_loader_abandoned_iteration_stops_worker():
    """Taking one batch and dropping the iterator must not leave the
    prefetch thread blocked forever."""
    import threading

    ds = SyntheticSRDataset(length=12, hr_size=64, seed=10)
    before = threading.active_count()
    for _ in range(5):
        it = iter(DeviceLoader(ds, batch_size=2, patch_size=32, crop="grid",
                               prefetch=1))
        next(it)
        it.close()  # generator finalization sets the stop event
    import time

    time.sleep(1.0)  # workers notice stop within their put timeout
    assert threading.active_count() <= before + 1


def test_init_dataloader_split_and_synthetic():
    train, val = init_dataloader("synthetic", batch_size=4, patch_size=64)
    assert len(train.dataset) == 51  # 80% of 64
    assert len(val.dataset) == 13
    with pytest.raises(ValueError):
        init_dataloader("nope", 1, 64)


def test_init_dataloader_rejects_zero_batch_split():
    """A split smaller than one (static-shape, drop_last) batch must fail
    loudly at construction — silently yielding zero val batches crashed
    the epoch averages deep inside the engine (found live on TPU)."""
    with pytest.raises(ValueError, match="val split has 13 tiles"):
        init_dataloader("synthetic", batch_size=16, patch_size=64)


def test_strip_writer_checkpoint_resume_roundtrip(tmp_path):
    """checkpoint() + resume_state reopen: interrupt a striped write
    mid-scene (torn rows past the checkpoint), resume, and the file is
    byte-identical to a one-shot write — including a mid-strip buffered
    row tail, planar layout and compression."""
    import numpy as np

    from simple_vae_rs_tpu.data.tiffio import TiffStripWriter, read_tiff

    rng = np.random.default_rng(0)
    img = (rng.random((37, 21, 3)) * 60000).astype(np.uint16)
    kw = dict(planar_channels_first=True, compression="deflate",
              predictor=True, rows_per_strip=8)

    one = str(tmp_path / "one.tif")
    w = TiffStripWriter(one, 37, 21, 3, np.uint16, **kw)
    w.write_rows(np.moveaxis(img, -1, 0))
    w.close()

    two = str(tmp_path / "two.tif")
    w = TiffStripWriter(two, 37, 21, 3, np.uint16, **kw)
    w.write_rows(np.moveaxis(img[:19], -1, 0))  # 2 full strips + 3 pending
    state = w.checkpoint()
    w.write_rows(np.moveaxis(img[19:30], -1, 0))  # torn: past the checkpoint
    w._fh.close()  # simulated crash: no close(), no IFD

    w = TiffStripWriter(two, 37, 21, 3, np.uint16, resume_state=state, **kw)
    w.write_rows(np.moveaxis(img[19:], -1, 0))  # resume from the checkpoint
    w.close()

    np.testing.assert_array_equal(read_tiff(two), read_tiff(one))
    with open(one, "rb") as a, open(two, "rb") as b:
        assert a.read() == b.read()

    # geometry drift is refused
    import pytest

    with pytest.raises(ValueError, match="resume state"):
        TiffStripWriter(str(tmp_path / "x.tif"), 50, 21, 3, np.uint16,
                        resume_state=state, **kw)


def test_synthetic_hf_dataset_properties():
    """The high-frequency arm: deterministic pairs, LR = PSF + box-down
    of the sharp HR (so LR is blurrier than an ideal decimation — the
    cross-sensor degradation bicubic cannot undo), band correlation
    present, instance cache returns the identical objects."""
    from simple_vae_rs_tpu.data.datasets import SyntheticHFDataset

    ds = SyntheticHFDataset(length=4, hr_size=64, seed=5)
    lr, hr = ds[1]
    assert lr.shape == (32, 32, 4) and hr.shape == (64, 64, 4)
    assert lr.dtype == np.float32 and hr.dtype == np.float32
    # determinism across instances
    lr2, hr2 = SyntheticHFDataset(length=4, hr_size=64, seed=5)[1]
    np.testing.assert_array_equal(lr, lr2)
    np.testing.assert_array_equal(hr, hr2)
    # cache: same object back
    assert ds[1][0] is lr
    # the HR target keeps more high-frequency energy than the PSF'd LR
    # stream: compare total variation per pixel of HR vs its own ideal
    # 2x2 decimation upsampled — and LR must be SMOOTHER than that ideal
    # decimation (the PSF really applied)
    ideal = hr.reshape(32, 2, 32, 2, 4).mean((1, 3))

    def tv(a):
        return float(
            np.abs(np.diff(a, axis=0)).mean() + np.abs(np.diff(a, axis=1)).mean()
        )

    assert tv(lr) < tv(ideal), "LR should be blurrier than ideal decimation"
    # band correlation: flatten spatially, average |corr| over band pairs
    flat = hr.reshape(-1, 4)
    c = np.corrcoef(flat.T)
    off = c[np.triu_indices(4, 1)]
    assert np.abs(off).mean() > 0.5, f"bands should correlate, got {off}"


def test_synthetic_hf_in_loader_registry():
    from simple_vae_rs_tpu.data.loader import init_dataloader

    tr, va = init_dataloader("synthetic_hf", batch_size=2, patch_size=32)
    batch = next(iter(tr))
    assert batch[0].shape[1:] == (16, 16, 4)
    assert batch[1].shape[1:] == (32, 32, 4)
