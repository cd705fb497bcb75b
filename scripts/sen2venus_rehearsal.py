#!/usr/bin/env python
"""Sen2Venus dress rehearsal: prove the real-data path end to end, today.

The north star's quality clause ("PSNR/SSIM parity on the grid-mode test
split") is blocked on the real ARM tree appearing on this box. This script
keeps that path one command away (round-4 verdict item 5): it synthesizes
an ARM-SHAPED tree — int16 GeoTIFF tile pairs written by our own codec
(``data/tiffio.py``), named/paired like a Sen2Venus download
(``*_b2b3b4b8_10m.tif`` / ``*_05m.tif``, reference ``dataset.py:103-116``)
— then drives every piece the real data will use:

1. ``scripts/make_index.py --validate``  → tab-separated index.csv
2. ``train.py --dataset Sen2Venus --crop grid --data_root <tree>``
   (a real CLI training run + ``--test`` task from the checkpoint)
3. ``scripts/quality_parity.py --dataset sen2venus --data_root <tree>``
   BOTH sides (torch reference + this framework) reading the same tree

Any piece rotting fails loudly (non-zero exit). When the real tree
appears, replace the synthesized root with it and the same three commands
are the production run:

    python scripts/make_index.py /data/ARM --validate
    python train.py --dataset Sen2Venus --data_root /data/ARM --crop grid ...
    python scripts/quality_parity.py --side tpu --dataset sen2venus \
        --data_root /data/ARM   # and --side reference

Defaults are CPU-affordable (tiny tiles, 2 epochs, small preset);
``--backend`` forwards to the CLIs.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synthesize_tree(root: str, pairs: int, lr_size: int, seed: int) -> None:
    """Write an ARM-shaped tree: int16 DN tile pairs, HR = 2x LR.

    Content comes from the synthetic HF renderer (band-correlated scenes
    with sub-pixel structure) scaled to a Sentinel-2-like DN range, so
    the SR problem is real; the HR->LR link is the same PSF+decimation
    the renderer uses for its own pairs.
    """
    import numpy as np

    from simple_vae_rs_tpu.data.datasets import SyntheticHFDataset
    from simple_vae_rs_tpu.data.tiffio import write_tiff

    ds = SyntheticHFDataset(length=pairs, hr_size=lr_size * 2, seed=seed)
    site_dir = os.path.join(root, "SYNT1")
    os.makedirs(site_dir, exist_ok=True)
    for i in range(pairs):
        lr, hr = ds[i]  # float32 HWC in [0,1]

        def dn(a):  # [0,1] -> int16 DN like a real S2 tile
            return np.clip(a * 10000.0, 0, 10000).astype(np.int16)

        base = f"SYNT1_{i:03d}_b2b3b4b8"
        write_tiff(os.path.join(site_dir, f"{base}_10m.tif"), dn(lr),
                   compression="lzw", predictor=True)
        write_tiff(os.path.join(site_dir, f"{base}_05m.tif"), dn(hr),
                   compression="lzw", predictor=True)


def run(cmd, **kw) -> None:
    print(f"$ {' '.join(cmd)}", flush=True)
    subprocess.run(cmd, check=True, cwd=REPO, **kw)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tree", default=None,
                    help="existing tree (skip synthesis — THE real-data "
                         "invocation)")
    ap.add_argument("--pairs", type=int, default=10)
    ap.add_argument("--lr_size", type=int, default=64,
                    help="synthesized LR tile side (HR is 2x)")
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--qp_epochs", type=int, default=2,
                    help="epochs for the quality_parity legs")
    ap.add_argument("--batch_size", type=int, default=2,
                    help="TILE batch (grid mode multiplies by patches/tile; the 80/20 val split must hold >= one batch of tiles)")
    ap.add_argument("--patch_size", type=int, default=32)
    ap.add_argument("--cr", type=float, default=2.0)
    ap.add_argument("--backend", default="cpu")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--skip_parity", action="store_true",
                    help="stop after the train/test leg")
    args = ap.parse_args()

    root = args.tree
    tmp = None
    if root is None:
        tmp = tempfile.mkdtemp(prefix="svrs_s2v_")
        root = os.path.join(tmp, "ARM")
        print(f"synthesizing ARM-shaped tree at {root}")
        synthesize_tree(root, args.pairs, args.lr_size, args.seed)

    # 1. index the tree, validating every pair through the codec
    run([sys.executable, "scripts/make_index.py", root, "--validate"])
    index = os.path.join(root, "index.csv")
    assert os.path.exists(index), "make_index wrote no index.csv"

    # 2. real CLI training run, grid mode, then the --test task
    common = ["--dataset", "Sen2Venus", "--data_root", root,
              "--crop", "grid", "--patch_size", str(args.patch_size),
              "-cr", str(args.cr), "--batch_size", str(args.batch_size),
              "--backend", args.backend, "--seed", str(args.seed)]
    run([sys.executable, "train.py", *common,
         "--epochs", str(args.epochs), "--val_metrics_every", "1",
         "--samples", "8"])
    ckpts = sorted(
        (os.path.join("ckpt", f) for f in os.listdir(os.path.join(REPO, "ckpt"))
         if f.endswith((".orbax", ".msgpack"))),
        key=lambda p: os.path.getmtime(os.path.join(REPO, p)),
    )
    latest = ckpts[-1].rsplit(".", 1)[0]
    run([sys.executable, "train.py", *common, "--test",
         "--model_ckpt", latest, "--samples", "8"])

    # 3. quality parity: BOTH frameworks read the same tree
    if not args.skip_parity:
        for side in ("tpu", "reference"):
            cmd = [sys.executable, "scripts/quality_parity.py",
                   "--side", side, "--dataset", "sen2venus",
                   "--data_root", root, "--preset", "small",
                   "--epochs", str(args.qp_epochs), "--seed", str(args.seed)]
            if side == "tpu" and args.backend:
                cmd += ["--backend", args.backend]
            run(cmd)
        for side in ("tpu", "reference"):
            path = os.path.join(
                REPO, "results",
                f"quality_parity_{side}_s2v_ps32_e{args.qp_epochs}.json"
                if args.seed == 0 else
                f"quality_parity_{side}_s2v_ps32_s{args.seed}"
                f"_e{args.qp_epochs}.json",
            )
            with open(path) as fh:
                rec = json.load(fh)
            last = rec["epochs"][-1]
            assert all(
                v == v for v in last.values() if isinstance(v, float)
            ), f"{side} produced NaNs: {last}"
            print(f"{side}: e{last.get('epoch')} "
                  f"ssim_sr={last.get('ssim_sr'):.3f} "
                  f"psnr_sr={last.get('psnr_sr'):.2f} "
                  f"(bicubic {rec['ssim_baseline']:.3f}/"
                  f"{rec['psnr_baseline']:.2f})")

    print("sen2venus rehearsal: ALL LEGS GREEN")


if __name__ == "__main__":
    main()
