"""Product evaluation command: score an SR raster against ground truth.

The reference only ever reports metrics inside its training loop
(``/root/reference/models/base.py:200-260`` logs SSIM/PSNR on val
batches); once a product raster exists on disk there is nothing to
score it with. This command closes the workflow loop for the serving
side: given a finished SR GeoTIFF (from ``svrs-raster``, the HTTP
endpoints, or anywhere else) and the ground-truth HR raster, it reports
the same metric family training logs — PSNR, SSIM, LPIPS when weights
are available — plus the bicubic-baseline comparison when the LR input
is provided, so "is this product better than bicubic, and by how much"
is one command:

    python -m simple_vae_rs_tpu.evaluate sr.tif truth.tif \
        [--lr lr.tif] [--backend cpu]
    # or: svrs-eval sr.tif truth.tif --lr lr.tif

Semantics match training's validation metrics: both rasters are mapped
to [0,1] by the TRUTH's per-channel min-max (the same normalization the
model was trained against — ``utils/image.normalize_image``), and
PSNR/SSIM use ``data_range=1`` in that domain exactly like
``train/engine._eval_metrics``. RMSE is additionally reported in the
input's radiometric units. LPIPS (AlexNet) runs over a window grid
(whole scenes don't fit one AlexNet forward) and averages; it is
skipped with a note when no weights/backend are available. The final
line is one JSON object, machine-readable like ``bench.py``.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from typing import Dict, Optional

import numpy as np

_EPS = 1e-5  # matches utils.image.normalize_image


def _load_hwc(path: str, channels: Optional[int]):
    from simple_vae_rs_tpu.data.tiffio import read_tiff
    from simple_vae_rs_tpu.raster import _to_hwc

    arr = read_tiff(path)
    hwc, _layout = _to_hwc(arr, channels)
    return np.asarray(hwc, np.float32), arr.dtype


def _truth_norm(truth: np.ndarray):
    """Per-channel min-max of the ground truth — the evaluation domain.

    Normalizing BOTH rasters by the truth's statistics keeps the metric
    invariant to the product's radiometric scaling (``svrs-raster``
    writes input-scale or [0,1] products; either lands on the same
    score) and matches the [0,1] domain training's val metrics use.
    """
    mn = truth.min(axis=(0, 1), keepdims=True)
    denom = truth.max(axis=(0, 1), keepdims=True) - mn + _EPS
    return mn, denom


def _lpips_windowed(a: np.ndarray, b: np.ndarray, win: int = 64):
    """Mean LPIPS over a non-overlapping ``win``-px window grid (tail
    windows flush to the edge), or None when no backend/weights. AlexNet
    features need fixed, modest inputs — a whole scene is windowed the
    same way the serving grid windows it."""
    from simple_vae_rs_tpu.tiling import grid_starts
    from simple_vae_rs_tpu.utils.lpips_optional import lpips_batch

    h, w = a.shape[:2]
    win = min(win, h, w)
    wins_a, wins_b = [], []
    for sh in grid_starts(h, win, win):
        for sw in grid_starts(w, win, win):
            wins_a.append(a[sh:sh + win, sw:sw + win])
            wins_b.append(b[sh:sh + win, sw:sw + win])
    vals = lpips_batch(np.stack(wins_a), np.stack(wins_b))
    return float(np.mean(vals)) if vals is not None else None


def evaluate_product(
    sr: np.ndarray, truth: np.ndarray, lr: Optional[np.ndarray] = None,
) -> Dict[str, Optional[float]]:
    """Metric dict for (H, W, C) float32 rasters (``lr`` is (H/2, W/2, C)
    for the bicubic baseline rows). Pure function — the CLI below is IO."""
    import jax.numpy as jnp

    from simple_vae_rs_tpu.ops.metrics import psnr_batch, ssim_batch
    from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x

    if sr.shape != truth.shape:
        raise ValueError(
            f"product {sr.shape} and truth {truth.shape} differ in shape"
        )
    mn, denom = _truth_norm(truth)
    # the product may be the [0,1] float form already (svrs-raster
    # --scale unit); if so its values are not in the truth's radiometry —
    # detect by range and use it as-is
    unit = float(sr.max()) <= 1.0 + 1e-6 and float(sr.min()) >= -1e-6 \
        and float(truth.max()) > 2.0
    sr_n = sr if unit else (sr - mn) / denom
    truth_n = (truth - mn) / denom

    a = jnp.asarray(sr_n)[None]
    b = jnp.asarray(truth_n)[None]
    out: Dict[str, Optional[float]] = {
        "psnr": float(psnr_batch(a, b)[0]),
        "ssim": float(ssim_batch(a, b)[0]),
        "rmse_input_units": float(
            np.sqrt(np.mean((sr_n * denom - truth_n * denom) ** 2))
        ),
        "lpips": _lpips_windowed(sr_n, truth_n),
    }
    if lr is not None:
        if lr.shape[:2] != (truth.shape[0] // 2, truth.shape[1] // 2):
            raise ValueError(
                f"LR {lr.shape} is not half the truth's extent "
                f"{truth.shape}"
            )
        lr_n = (lr - mn) / denom
        up = np.asarray(bicubic_upsample_2x(jnp.asarray(lr_n)[None]))[0]
        # odd truth extents: the 2x upsample covers 2*(extent//2) rows —
        # score the baseline on the covered region
        bh, bw = up.shape[0], up.shape[1]
        u = jnp.asarray(up)[None]
        bt = jnp.asarray(truth_n[:bh, :bw])[None]
        out["psnr_baseline"] = float(psnr_batch(u, bt)[0])
        out["ssim_baseline"] = float(ssim_batch(u, bt)[0])
        out["lpips_baseline"] = _lpips_windowed(up, truth_n[:bh, :bw])
    return out


def _open_reader(path: str):
    """(reader, to_hwc, H, W, C) for strip-windowed scoring."""
    from simple_vae_rs_tpu.data.tiffio import TiffReader

    r = TiffReader(path)
    c = 1 if r.layout == "hw" else r.samples_per_pixel
    return r, r.to_hwc, r.height, r.width, c


def evaluate_product_streamed(
    product_path: str,
    truth_path: str,
    lr_path: Optional[str] = None,
    win: int = 64,
) -> Dict[str, Optional[float]]:
    """Bounded-memory scoring sweep for scenes too large to materialize.

    PSNR and RMSE are EXACT (squared error accumulates over
    non-overlapping rows). SSIM and LPIPS run over a ``win``-px window
    grid (tails flush to the edge) and average per-window values — SSIM
    is itself a mean of local-window statistics, so the grid mean tracks
    the full-image value, differing only through boundary-window
    weighting (with ``win`` >= the raster extent it is identical). The
    bicubic baseline reads each LR band with a 2-px halo (the cubic
    kernel's footprint), so band-wise upsampling equals the full-image
    upsample exactly; odd extents score the baseline on the covered
    region. Peak memory is O(win x width), independent of scene height.
    """
    import jax.numpy as jnp

    from simple_vae_rs_tpu.ops.metrics import ssim_batch
    from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x
    from simple_vae_rs_tpu.raster import _stream_stats
    from simple_vae_rs_tpu.tiling import grid_starts

    rp, to_p, ph, pw, pc = _open_reader(product_path)
    rt, to_t, h, w, c = _open_reader(truth_path)
    if (ph, pw, pc) != (h, w, c):
        raise ValueError(
            f"product {(ph, pw, pc)} and truth {(h, w, c)} differ in shape"
        )
    rl = None
    if lr_path:
        rl, to_l, lh, lw, lc = _open_reader(lr_path)
        if (lh, lw, lc) != (h // 2, w // 2, c):
            raise ValueError(
                f"LR {(lh, lw, lc)} is not half the truth's extent "
                f"{(h, w, c)}"
            )
    win = min(win, h, w)

    # pass 1: truth range (the metric domain) + product range (unit
    # detection), streamed exactly like raster --stream's stats pass
    tmn, tmx, _tbad = _stream_stats(rt, to_t, max(rt.rows_per_strip, 256))
    pmn, pmx, _pbad = _stream_stats(rp, to_p, max(rp.rows_per_strip, 256))
    unit = float(pmx.max()) <= 1.0 + 1e-6 and float(pmn.min()) >= -1e-6 \
        and float(tmx.max()) > 2.0
    mn = tmn[None, None]
    denom = (tmx[None, None] - mn) + _EPS

    se_n = se_in = 0.0          # normalized / input-unit squared error
    ssim_sum, n_win = 0.0, 0
    lp_sum, lp_n = 0.0, 0
    bse_n = 0.0
    bssim_sum, bn_win = 0.0, 0
    blp_sum, blp_n = 0.0, 0
    b_px = 0
    b_counted = 0                # baseline rows already in its MSE sum
    counted = 0                  # truth rows already in the MSE sums
    bh, bw = 2 * (h // 2), 2 * (w // 2)  # baseline-covered region
    from simple_vae_rs_tpu.utils.lpips_optional import lpips_batch

    for rs in grid_starts(h, win, win):
        p_rows = to_p(rp.read_rows(rs, rs + win)).astype(np.float32)
        t_rows = to_t(rt.read_rows(rs, rs + win)).astype(np.float32)
        p_n = p_rows if unit else (p_rows - mn) / denom
        t_n = (t_rows - mn) / denom
        new0 = max(0, counted - rs)  # the flush tail band overlaps
        d = p_n[new0:] - t_n[new0:]
        se_n += float(np.sum(d * d))
        din = d * denom
        se_in += float(np.sum(din * din))
        counted = rs + win
        cols = grid_starts(w, win, win)
        wa = np.stack([p_n[:, cs:cs + win] for cs in cols])
        wb = np.stack([t_n[:, cs:cs + win] for cs in cols])
        ssim_sum += float(np.sum(np.asarray(
            ssim_batch(jnp.asarray(wa), jnp.asarray(wb))
        )))
        n_win += len(cols)
        lv = lpips_batch(wa, wb)
        if lv is not None:
            lp_sum += float(np.sum(lv))
            lp_n += len(lv)
        if rl is not None and rs < bh:
            # LR band with the cubic kernel's 2-px halo: band-wise
            # upsample == full-image upsample on the sliced rows. On odd
            # truth heights the final band extends past the covered
            # region — clip its rows to bh instead of skipping it (the
            # in-memory scorer covers all bh rows; so must this one).
            be = min(rs + win, bh)
            lo = max(0, rs // 2 - 2)
            hi = min(h // 2, (be - 1) // 2 + 3)
            lr_rows = to_l(rl.read_rows(lo, hi)).astype(np.float32)
            lr_n = (lr_rows - mn) / denom
            up = np.asarray(bicubic_upsample_2x(jnp.asarray(lr_n)[None]))[0]
            band = up[rs - 2 * lo: rs - 2 * lo + (be - rs), :bw]
            tb = t_n[:be - rs, :bw]
            nb = max(0, b_counted - rs)  # the flush tail band overlaps
            db = band[nb:] - tb[nb:]
            bse_n += float(np.sum(db * db))
            b_px += db.size
            b_counted = be
            bcols = grid_starts(bw, win, win)
            ba = np.stack([band[:, cs:cs + win] for cs in bcols])
            bb = np.stack([tb[:, cs:cs + win] for cs in bcols])
            bssim_sum += float(np.sum(np.asarray(
                ssim_batch(jnp.asarray(ba), jnp.asarray(bb))
            )))
            bn_win += len(bcols)
            blv = lpips_batch(ba, bb)
            if blv is not None:
                blp_sum += float(np.sum(blv))
                blp_n += len(blv)
    rp.close()
    rt.close()
    if rl is not None:
        rl.close()

    n_px = float(h * w * c)
    out: Dict[str, Optional[float]] = {
        "psnr": float(10.0 * np.log10(1.0 / max(se_n / n_px, 1e-12))),
        "ssim": ssim_sum / max(n_win, 1),
        "rmse_input_units": float(np.sqrt(se_in / n_px)),
        "lpips": (lp_sum / lp_n) if lp_n else None,
    }
    if rl is not None:
        out["psnr_baseline"] = float(
            10.0 * np.log10(1.0 / max(bse_n / max(b_px, 1), 1e-12))
        )
        out["ssim_baseline"] = bssim_sum / max(bn_win, 1)
        out["lpips_baseline"] = (blp_sum / blp_n) if blp_n else None
    return out


def main(argv: Optional[list] = None) -> int:
    p = argparse.ArgumentParser(
        prog="python -m simple_vae_rs_tpu.evaluate",
        description="Score an SR raster product against ground truth "
        "(PSNR/SSIM/LPIPS in training's [0,1] metric domain; optional "
        "bicubic-baseline rows from the LR input).",
    )
    p.add_argument("product", help="SR raster to score (svrs-raster "
                   "output or any same-shape raster)")
    p.add_argument("truth", help="ground-truth HR raster")
    p.add_argument("--lr", default=None,
                   help="the LR input raster: adds bicubic-baseline "
                   "PSNR/SSIM/LPIPS rows (the comparison training logs "
                   "as Metrics/*_Baseline)")
    p.add_argument("--channels", type=int, default=None,
                   help="band count (disambiguates (C,H,W) vs (H,W,C) "
                   "layouts; default: small-axis heuristic)")
    p.add_argument("--stream", action="store_true",
                   help="bounded-memory scoring sweep for whole scenes: "
                   "strip-windowed reads, exact PSNR/RMSE, SSIM/LPIPS "
                   "averaged over a --win window grid (peak memory "
                   "O(win x width))")
    p.add_argument("--win", type=int, default=64,
                   help="window size for the streamed SSIM/LPIPS grid "
                   "(default 64)")
    p.add_argument("--backend", default="",
                   help="JAX platform override (e.g. 'cpu'); same "
                   "semantics as train.py --backend")
    args = p.parse_args(argv)
    from simple_vae_rs_tpu.utils.backend import apply_backend

    apply_backend(args.backend)

    if args.stream:
        out = evaluate_product_streamed(
            args.product, args.truth, lr_path=args.lr, win=args.win
        )
    else:
        sr, _ = _load_hwc(args.product, args.channels)
        truth, _ = _load_hwc(args.truth, args.channels)
        lr = None
        if args.lr:
            lr, _ = _load_hwc(args.lr, args.channels)
        out = evaluate_product(sr, truth, lr=lr)

    print(f"product: {os.path.abspath(args.product)}")
    print(f"truth:   {os.path.abspath(args.truth)}")
    print(f"  PSNR  {out['psnr']:.2f} dB"
          + (f"   (bicubic {out['psnr_baseline']:.2f})"
             if "psnr_baseline" in out else ""))
    print(f"  SSIM  {out['ssim']:.4f}"
          + (f"      (bicubic {out['ssim_baseline']:.4f})"
             if "ssim_baseline" in out else ""))
    if out["lpips"] is not None:
        print(f"  LPIPS {out['lpips']:.4f}"
              + (f"     (bicubic {out['lpips_baseline']:.4f})"
                 if out.get("lpips_baseline") is not None else ""))
    else:
        print("  LPIPS skipped (no weights/backend — see doctor)",
              file=sys.stderr)
    print(f"  RMSE  {out['rmse_input_units']:.3f} (input units)")
    print(json.dumps({"metric": "product_eval", **{
        k: (round(v, 6) if isinstance(v, float) else v)
        for k, v in out.items()
    }}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
