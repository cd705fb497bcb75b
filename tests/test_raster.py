"""Whole-raster CLI: TIFF in -> SR (+std) TIFF out, radiometry preserved."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu import raster
from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
from simple_vae_rs_tpu.data.tiffio import read_tiff, write_tiff
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.train.checkpoint import save_checkpoint
from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    state = create_train_state(variables, make_optimizer(TrainConfig()),
                               jax.random.PRNGKey(2))
    path = str(tmp_path_factory.mktemp("ck") / "model")
    save_checkpoint(path, state, epoch=1)
    return path


def _model_flags(ckpt):
    return ["--model_ckpt", ckpt, "-cr", "2.0", "--patch_size", "16"]


def test_sr_roundtrip_input_scale(ckpt, tmp_path):
    rng = np.random.default_rng(0)
    lr = (rng.random((20, 27, 4)) * 3000 + 500).astype(np.uint16)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr, compression="deflate", predictor=True)
    raster.main([src, dst, *_model_flags(ckpt)])
    out = read_tiff(dst)
    assert out.shape == (40, 54, 4)
    assert out.dtype == np.uint16
    # radiometry preserved: output lives in the input's per-channel range
    # (model emits [0,1]; inverse normalization maps it back)
    for c in range(4):
        assert out[..., c].min() >= lr[..., c].min() - 1
        assert out[..., c].max() <= lr[..., c].max() + 1


def test_sr_unit_scale_float(ckpt, tmp_path):
    lr = np.random.default_rng(1).random((10, 10, 4)).astype(np.float32)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr)
    raster.main([src, dst, *_model_flags(ckpt), "--scale", "unit",
                 "--compression", "none"])
    out = read_tiff(dst)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_uncertainty_writes_std_map(ckpt, tmp_path):
    lr = (np.random.default_rng(2).random((12, 12, 4)) * 900).astype(np.uint16)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr)
    raster.main([src, dst, *_model_flags(ckpt), "--uncertainty",
                 "--samples", "4"])
    std_path = str(tmp_path / "sr_std.tif")
    assert os.path.exists(std_path)
    std = read_tiff(std_path)
    assert std.shape == (24, 24, 4)
    assert std.dtype == np.float32
    assert (std >= 0).all() and np.isfinite(std).all()


def test_planar_layout_preserved(ckpt, tmp_path):
    lr = (np.random.default_rng(3).random((4, 18, 22)) * 100).astype(np.uint16)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr, planar_channels_first=True)
    raster.main([src, dst, *_model_flags(ckpt)])
    out = read_tiff(dst)
    assert out.shape == (4, 36, 44)  # band-sequential in, band-sequential out


def test_band_count_mismatch_is_clean(ckpt, tmp_path):
    lr = np.random.default_rng(4).random((12, 12, 3)).astype(np.float32)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr)
    with pytest.raises(SystemExit, match="3 band"):
        raster.main([src, dst, *_model_flags(ckpt)])


def test_layout_helpers():
    hwc, layout = raster._to_hwc(np.zeros((4, 30, 40), np.float32), 4)
    assert layout == "chw" and hwc.shape == (30, 40, 4)
    hwc, layout = raster._to_hwc(np.zeros((30, 40, 4), np.float32), 4)
    assert layout == "hwc" and hwc.shape == (30, 40, 4)
    hwc, layout = raster._to_hwc(np.zeros((30, 40), np.float32), 1)
    assert layout == "hw" and hwc.shape == (30, 40, 1)
    # ambiguous (both axes == channels) falls back to interleaved
    hwc, layout = raster._to_hwc(np.zeros((4, 40, 4), np.float32), 4)
    assert layout == "hwc"
    back = raster._from_hwc(hwc, layout)
    assert back.shape == (4, 40, 4)


def test_cast_like_clips_and_rounds():
    arr = np.array([-5.4, 10.6, 70000.2])
    out = raster._cast_like(arr, np.dtype(np.uint16))
    assert out.dtype == np.uint16
    assert list(out) == [0, 11, 65535]
    f = raster._cast_like(arr, np.dtype(np.float32))
    assert f.dtype == np.float32


def test_nan_nodata_pixels_are_filled(ckpt, tmp_path, capsys):
    """Non-finite nodata samples (routine in real satellite tiles) must
    not poison the normalize or the model — they are filled with the
    per-channel finite minimum, with a warning."""
    lr = np.random.default_rng(5).random((12, 12, 4)).astype(np.float32)
    lr[0, 0, 0] = np.nan
    lr[3, 4, 2] = np.inf
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr)
    raster.main([src, dst, *_model_flags(ckpt), "--scale", "unit",
                 "--compression", "none"])
    out = read_tiff(dst)
    assert np.isfinite(out).all()
    assert "non-finite" in capsys.readouterr().out


# ------------------------------------------------------- resumable streaming
def test_stream_resume_reproduces_uninterrupted_product(ckpt, tmp_path,
                                                        monkeypatch):
    """Crash a seeded --stream --resume sweep mid-scene, re-run with
    --resume: already-written bands are not recomputed and the finished
    SR + std products equal an uninterrupted run's exactly (the request
    seed pins every window draw, so the seam band recomputes to the same
    values)."""
    rng = np.random.default_rng(7)
    lr = (rng.random((40, 30, 4)) * 2500 + 100).astype(np.uint16)
    src = str(tmp_path / "lr.tif")
    write_tiff(src, lr)
    full, part = str(tmp_path / "full.tif"), str(tmp_path / "part.tif")
    flags = [*_model_flags(ckpt), "--stream", "--uncertainty",
             "--samples", "3", "--batch", "4", "--request_seed", "11"]
    raster.main([src, full, *flags])  # uninterrupted reference product

    from simple_vae_rs_tpu.data import tiffio

    real = tiffio.TiffStripWriter.write_rows
    calls = {"n": 0}

    def bomb(self, block):
        calls["n"] += 1
        if calls["n"] > 5:
            raise RuntimeError("simulated crash")
        return real(self, block)

    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", bomb)
    with pytest.raises(RuntimeError, match="simulated crash"):
        raster.main([src, part, *flags, "--resume"])
    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", real)
    assert os.path.exists(part + ".resume.json")

    raster.main([src, part, *flags, "--resume"])
    assert not os.path.exists(part + ".resume.json")  # complete -> removed
    np.testing.assert_array_equal(read_tiff(part), read_tiff(full))
    np.testing.assert_array_equal(
        read_tiff(str(tmp_path / "part_std.tif")),
        read_tiff(str(tmp_path / "full_std.tif")),
    )


def test_stream_resume_guards(ckpt, tmp_path):
    lr = np.random.default_rng(8).random((20, 20, 4)).astype(np.float32)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "out.tif")
    write_tiff(src, lr)
    # --resume needs --stream
    with pytest.raises(SystemExit):
        raster.main([src, dst, *_model_flags(ckpt), "--resume"])
    # --resume needs --request_seed (seam draws must be pinned)
    with pytest.raises(SystemExit, match="request_seed"):
        raster.main([src, dst, *_model_flags(ckpt), "--stream", "--resume"])
    # seeds are non-negative by contract (tiling.subseed's domain)
    with pytest.raises(SystemExit):
        raster.main([src, dst, *_model_flags(ckpt), "--request_seed", "-2"])


def test_url_request_seed_requires_server_capability(monkeypatch):
    """Non-stream --url --request_seed: a pre-seed server silently ignores
    unknown query params, breaking the bit-identical-product promise — the
    CLI must refuse up front, like RemoteResolver does on the stream path."""
    import argparse

    from simple_vae_rs_tpu import client as client_mod

    monkeypatch.setattr(client_mod.Client, "health",
                        lambda self: {"channels": 4})  # no "seed" capability
    args = argparse.Namespace(url="http://unit.test", token="", timeout=1.0,
                              model_ckpt=None, request_seed=3)
    with pytest.raises(SystemExit, match="seed"):
        raster._open_endpoints(args)


def test_stream_resume_rejects_changed_invocation(ckpt, tmp_path,
                                                  monkeypatch):
    """A journal written by one invocation must not silently continue a
    different one (changed options would corrupt the product)."""
    lr = (np.random.default_rng(9).random((24, 20, 4)) * 900).astype(
        np.uint16)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "out.tif")
    write_tiff(src, lr)
    flags = [*_model_flags(ckpt), "--stream", "--request_seed", "5"]

    from simple_vae_rs_tpu.data import tiffio

    real = tiffio.TiffStripWriter.write_rows
    calls = {"n": 0}

    def bomb(self, block):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated crash")
        return real(self, block)

    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", bomb)
    with pytest.raises(RuntimeError):
        raster.main([src, dst, *flags, "--resume"])
    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", real)
    with pytest.raises(SystemExit, match="different invocation"):
        raster.main([src, dst, *flags, "--resume", "--request_seed", "6"])
    # the fingerprint covers the MODEL identity too: resuming with a
    # different network (here: the int8 decode variant) would splice two
    # models' rows into one product
    with pytest.raises(SystemExit, match="different invocation"):
        raster.main([src, dst, *flags, "--resume", "--int8"])


def test_stream_failure_closes_files_without_bogus_ifd(ckpt, tmp_path,
                                                       monkeypatch):
    """A mid-sweep failure (server error, Ctrl-C) must close the fds via
    the writers' error path: the partial output keeps its zeroed IFD
    pointer, so readers refuse it cleanly instead of seeing a 'complete'
    TIFF with missing rows."""
    lr = (np.random.default_rng(31).random((40, 24, 4)) * 900).astype(
        np.uint16)
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "out.tif")
    write_tiff(src, lr)

    from simple_vae_rs_tpu.data import tiffio

    real = tiffio.TiffStripWriter.write_rows
    calls = {"n": 0}

    def bomb(self, block):
        calls["n"] += 1
        if calls["n"] > 2:
            raise RuntimeError("simulated failure")
        return real(self, block)

    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", bomb)
    with pytest.raises(RuntimeError, match="simulated failure"):
        raster.main([src, dst, *_model_flags(ckpt), "--stream"])
    monkeypatch.setattr(tiffio.TiffStripWriter, "write_rows", real)
    assert os.path.exists(dst)
    with pytest.raises(ValueError, match="never finalized"):
        read_tiff(dst)  # zero IFD pointer -> clean refusal


def test_stall_watchdog_aborts_and_resume_completes(ckpt, tmp_path):
    """A wedged dispatch mid-sweep: the --stall_timeout watchdog
    hard-exits (code 3) since a blocked call cannot be interrupted; the
    resume journal from the last completed band survives, and a --resume
    re-run finishes a product identical to an uninterrupted run. Runs the
    stalled sweep in a subprocess because the abort is os._exit."""
    import subprocess
    import sys

    rng = np.random.default_rng(21)
    lr = (rng.random((40, 24, 4)) * 2000 + 50).astype(np.uint16)
    src = str(tmp_path / "lr.tif")
    write_tiff(src, lr)
    full, part = str(tmp_path / "full.tif"), str(tmp_path / "part.tif")
    flags = ["-cr", "2.0", "--patch_size", "16", "--stream",
             "--batch", "4", "--request_seed", "3"]
    raster.main([src, full, "--model_ckpt", ckpt, *flags])

    driver = tmp_path / "wedge.py"
    driver.write_text(f"""
import jax
jax.config.update("jax_platforms", "cpu")
import time
from simple_vae_rs_tpu import raster
from simple_vae_rs_tpu.serve import SuperResolver

real = SuperResolver.super_resolve
calls = {{"n": 0}}

def wedged(self, *a, **k):
    calls["n"] += 1
    if calls["n"] > 4:
        time.sleep(3600)  # the wedged-link failure mode
    return real(self, *a, **k)

SuperResolver.super_resolve = wedged
raster.main([{src!r}, {part!r}, "--model_ckpt", {ckpt!r},
             *{flags!r}, "--resume", "--stall_timeout", "60"])
""")
    repo_root = os.path.dirname(
        os.path.dirname(os.path.abspath(raster.__file__))
    )  # the package is imported from the repo root, not pip-installed
    env = dict(os.environ)
    env["PYTHONPATH"] = repo_root + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, str(driver)], capture_output=True, text=True,
        timeout=600, cwd=repo_root, env=env,
    )
    assert proc.returncode == 3, proc.stderr[-2000:]
    assert "stalled" in proc.stderr
    assert os.path.exists(part + ".resume.json")

    raster.main([src, part, "--model_ckpt", ckpt, *flags, "--resume"])
    assert not os.path.exists(part + ".resume.json")
    np.testing.assert_array_equal(read_tiff(part), read_tiff(full))


def test_wire_u16_requires_url(ckpt, tmp_path):
    """--wire u16 is a --url body encoding; local mode must refuse it
    instead of silently serving f32 products."""
    src = str(tmp_path / "in.tif")
    write_tiff(src, np.zeros((8, 8, 4), np.float32))
    with pytest.raises(SystemExit):
        raster.main([src, str(tmp_path / "out.tif"),
                     *_model_flags(ckpt), "--wire", "u16"])
