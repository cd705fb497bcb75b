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
    p.add_argument("--backend", default="",
                   help="JAX platform override (e.g. 'cpu'); same "
                   "semantics as train.py --backend")
    args = p.parse_args(argv)
    if args.backend:
        import jax

        jax.config.update("jax_platforms", args.backend)

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
