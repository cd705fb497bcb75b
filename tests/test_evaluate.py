"""Product evaluation CLI: metric semantics + raster IO round trip.

The metric family matches training's val metrics (engine._eval_metrics:
PSNR/SSIM at data_range=1 in the truth-normalized [0,1] domain); the
reference has no product-scoring path at all (metrics only exist inside
its training loop, /root/reference/models/base.py:200-260).
"""

import json

import numpy as np
import pytest

from simple_vae_rs_tpu import evaluate
from simple_vae_rs_tpu.data.tiffio import write_tiff


def _truth(h=40, w=36, c=4, seed=0):
    rng = np.random.default_rng(seed)
    base = rng.random((h, w, c)).astype(np.float32)
    # smooth it a little so SSIM has structure to compare
    base = (base + np.roll(base, 1, 0) + np.roll(base, 1, 1)) / 3.0
    return (base * 3000.0 + 500.0).astype(np.float32)


def test_perfect_product_scores_perfect():
    t = _truth()
    out = evaluate.evaluate_product(t.copy(), t)
    assert out["psnr"] > 60.0
    assert out["ssim"] > 0.999
    assert out["rmse_input_units"] < 1e-3


def test_noisier_product_scores_worse_and_baseline_rows():
    t = _truth(seed=1)
    rng = np.random.default_rng(2)
    mild = t + rng.normal(0, 30.0, t.shape).astype(np.float32)
    harsh = t + rng.normal(0, 300.0, t.shape).astype(np.float32)
    lr = t.reshape(20, 2, 18, 2, 4).mean(axis=(1, 3))  # box 2x LR view
    a = evaluate.evaluate_product(mild, t, lr=lr)
    b = evaluate.evaluate_product(harsh, t, lr=lr)
    assert a["psnr"] > b["psnr"]
    assert a["ssim"] > b["ssim"]
    assert a["rmse_input_units"] < b["rmse_input_units"]
    # bicubic baseline rows computed from the LR input
    assert "psnr_baseline" in a and "ssim_baseline" in a
    assert a["psnr_baseline"] == pytest.approx(b["psnr_baseline"])


def test_unit_scale_product_detected():
    """A [0,1] product (svrs-raster --scale unit) scores identically to
    its input-scale twin — range detection maps both to the same domain."""
    t = _truth(seed=3)
    mn = t.min(axis=(0, 1), keepdims=True)
    denom = t.max(axis=(0, 1), keepdims=True) - mn + 1e-5
    rng = np.random.default_rng(4)
    product = t + rng.normal(0, 50.0, t.shape).astype(np.float32)
    unit_product = np.clip((product - mn) / denom, 0.0, 1.0)
    scaled = evaluate.evaluate_product(
        np.clip(product, mn, mn + denom), t)
    unit = evaluate.evaluate_product(unit_product, t)
    assert unit["psnr"] == pytest.approx(scaled["psnr"], abs=0.05)
    assert unit["ssim"] == pytest.approx(scaled["ssim"], abs=1e-3)


def test_shape_mismatch_is_clean():
    t = _truth()
    with pytest.raises(ValueError, match="differ in shape"):
        evaluate.evaluate_product(t[:-2], t)
    with pytest.raises(ValueError, match="not half"):
        evaluate.evaluate_product(t, t, lr=t)


def test_cli_end_to_end(tmp_path, capsys):
    t = _truth(h=41, w=37, seed=5)  # odd extents: baseline crop path
    rng = np.random.default_rng(6)
    product = (t + rng.normal(0, 40.0, t.shape)).astype(np.float32)
    lr = t[:40, :36].reshape(20, 2, 18, 2, 4).mean(axis=(1, 3))
    tp, pp, lp = (str(tmp_path / n) for n in ("t.tif", "p.tif", "lr.tif"))
    write_tiff(tp, t)
    write_tiff(pp, product)
    write_tiff(lp, lr.astype(np.float32))
    assert evaluate.main([pp, tp, "--lr", lp]) == 0
    line = capsys.readouterr().out.strip().splitlines()[-1]
    out = json.loads(line)
    assert out["metric"] == "product_eval"
    assert 0 < out["ssim"] <= 1 and out["psnr"] > 5
    assert "psnr_baseline" in out


# ----------------------------------------------------------- streamed scoring
def test_streamed_matches_in_memory_exactly_when_window_covers(tmp_path):
    """win >= extent: the streamed sweep's single window IS the full
    image, so PSNR/RMSE (exact by construction) AND SSIM match the
    in-memory scorer."""
    t = _truth(h=48, w=48, seed=11)
    rng = np.random.default_rng(12)
    product = (t + rng.normal(0, 60.0, t.shape)).astype(np.float32)
    tp, pp = str(tmp_path / "t.tif"), str(tmp_path / "p.tif")
    write_tiff(tp, t)
    write_tiff(pp, product)
    mem = evaluate.evaluate_product(product, t)
    st = evaluate.evaluate_product_streamed(pp, tp, win=48)
    assert st["psnr"] == pytest.approx(mem["psnr"], abs=1e-3)
    assert st["rmse_input_units"] == pytest.approx(
        mem["rmse_input_units"], rel=1e-5)
    assert st["ssim"] == pytest.approx(mem["ssim"], abs=1e-5)


def test_streamed_baseline_upsample_is_exact(tmp_path):
    """Band-wise bicubic with the 2-px halo equals the full-image
    upsample: streamed psnr_baseline == in-memory psnr_baseline even
    with several bands (exact accumulation, boundary-halo reads)."""
    t = _truth(h=64, w=32, seed=13)
    rng = np.random.default_rng(14)
    product = (t + rng.normal(0, 60.0, t.shape)).astype(np.float32)
    lr = t.reshape(32, 2, 16, 2, 4).mean(axis=(1, 3))
    tp, pp, lp = (str(tmp_path / n) for n in ("t.tif", "p.tif", "l.tif"))
    write_tiff(tp, t)
    write_tiff(pp, product)
    write_tiff(lp, lr.astype(np.float32))
    mem = evaluate.evaluate_product(product, t, lr=lr)
    st = evaluate.evaluate_product_streamed(pp, tp, lr_path=lp, win=16)
    assert st["psnr_baseline"] == pytest.approx(mem["psnr_baseline"],
                                                abs=2e-3)
    # multi-band PSNR/RMSE stay exact too
    assert st["psnr"] == pytest.approx(mem["psnr"], abs=1e-3)
    # window-grid SSIM tracks the full-image value (boundary weighting)
    assert st["ssim"] == pytest.approx(mem["ssim"], abs=0.05)


def test_streamed_baseline_covers_final_band_on_odd_heights(tmp_path):
    """Odd truth height: the final row band extends past the
    baseline-covered region (bh = 2*(h//2)). Its rows must still be
    scored — clipped to bh — or streamed baseline metrics silently cover
    up to win-1 fewer rows than the in-memory scorer."""
    t = _truth(h=101, w=32, seed=17)  # bands [0, 37]; 37+64 > bh=100
    rng = np.random.default_rng(18)
    product = (t + rng.normal(0, 60.0, t.shape)).astype(np.float32)
    lr = t[:100].reshape(50, 2, 16, 2, 4).mean(axis=(1, 3))
    tp, pp, lp = (str(tmp_path / n) for n in ("t.tif", "p.tif", "l.tif"))
    write_tiff(tp, t)
    write_tiff(pp, product)
    write_tiff(lp, lr.astype(np.float32))
    mem = evaluate.evaluate_product(product, t, lr=lr)
    st = evaluate.evaluate_product_streamed(pp, tp, lr_path=lp, win=64)
    # PSNR is exact accumulation: streamed == in-memory only if the final
    # band's 36 covered rows are included
    assert st["psnr_baseline"] == pytest.approx(mem["psnr_baseline"],
                                                abs=2e-3)
    assert st["psnr"] == pytest.approx(mem["psnr"], abs=1e-3)


def test_streamed_cli_flag(tmp_path, capsys):
    t = _truth(h=40, w=36, seed=15)
    product = (t + np.random.default_rng(16).normal(0, 40.0, t.shape)
               ).astype(np.float32)
    tp, pp = str(tmp_path / "t.tif"), str(tmp_path / "p.tif")
    write_tiff(tp, t)
    write_tiff(pp, product)
    assert evaluate.main([pp, tp, "--stream", "--win", "20"]) == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["metric"] == "product_eval"
    assert 0 < out["ssim"] <= 1
