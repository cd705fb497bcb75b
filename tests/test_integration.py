"""End-to-end integration: tiff files on disk -> loader -> training -> task.

The closest CPU analogue of a real Sen2Venus run: a synthetic ARM tree
(index.csv + planar int16 tiffs), `init_dataloader`, one epoch of
Cond_SRVAE training through the real engine, and the task report.
"""

import os

import numpy as np
import jax

from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
from simple_vae_rs_tpu.data.loader import init_dataloader
from simple_vae_rs_tpu.data.tiffio import write_tiff
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.tasks import run_task
from simple_vae_rs_tpu.train.engine import Trainer


def _make_arm_tree(root, n_tiles=6, hr=32):
    os.makedirs(root)
    rng = np.random.default_rng(0)
    rows = ["b2b3b4b8_10m\tb2b3b4b8_05m"]
    for i in range(n_tiles):
        hr_img = (rng.random((4, hr, hr)) * 10000).astype(np.int16)
        lr_img = hr_img.reshape(4, hr // 2, 2, hr // 2, 2).mean(axis=(2, 4)).astype(
            np.int16
        )
        write_tiff(os.path.join(root, f"lr_{i}.tif"), lr_img, planar_channels_first=True)
        write_tiff(os.path.join(root, f"hr_{i}.tif"), hr_img, planar_channels_first=True)
        rows.append(f"lr_{i}.tif\thr_{i}.tif")
    with open(os.path.join(root, "index.csv"), "w") as fh:
        fh.write("\n".join(rows))


def test_tiff_to_training_to_task(tmp_path):
    root = str(tmp_path / "ARM")
    _make_arm_tree(root, n_tiles=6, hr=32)

    train_loader, val_loader = init_dataloader(
        "s2v", batch_size=2, patch_size=16, crop="grid", data_root=root
    )
    assert len(train_loader.dataset) == 4  # 80% of 6 (floor)
    lr, hr = next(iter(train_loader))
    assert hr.shape == (8, 16, 16, 4)  # 2 tiles x (32/16)^2 patches
    assert lr.shape == (8, 8, 8, 4)
    assert float(lr.max()) <= 1.0  # normalized on device

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3))
    state = trainer.fit(train_loader, val_loader, epochs=1, val_metrics_every=1)
    assert int(state.step) == len(train_loader)

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    out = run_task(model, variables, val_loader, "integration", 2.0,
                   samples=4, chunk=4, results_root=str(tmp_path / "results"))
    assert np.isfinite(out["mmse"])
    assert os.path.exists(os.path.join(out["results_dir"], "error_mean_std_maps.png"))


def test_random_mode_from_tiffs(tmp_path):
    root = str(tmp_path / "ARM")
    _make_arm_tree(root, n_tiles=6, hr=32)
    train_loader, _ = init_dataloader(
        "s2v", batch_size=2, patch_size=16, crop="random", data_root=root
    )
    lr, hr = next(iter(train_loader))
    assert hr.shape == (2, 16, 16, 4)
    assert lr.shape == (2, 8, 8, 4)


def test_compressed_tiffs_to_training_to_int8_task(tmp_path):
    """Real-data shape of round 2's additions: LZW/deflate+predictor tiles
    (what GDAL writes) through the loader and engine, then the task report
    decoded through the W8A8 int8 path (CLI surface: --int8)."""
    from simple_vae_rs_tpu.ops import quantize as qz

    root = str(tmp_path / "ARM")
    os.makedirs(root)
    rng = np.random.default_rng(3)
    rows = ["b2b3b4b8_10m\tb2b3b4b8_05m"]
    for i in range(6):
        hr_img = (rng.random((4, 32, 32)) * 10000).astype(np.int16)
        lr_img = hr_img.reshape(4, 16, 2, 16, 2).mean(axis=(2, 4)).astype(np.int16)
        write_tiff(os.path.join(root, f"lr_{i}.tif"), lr_img,
                   planar_channels_first=True, compression="lzw", predictor=True)
        write_tiff(os.path.join(root, f"hr_{i}.tif"), hr_img,
                   planar_channels_first=True, compression="deflate",
                   predictor=True)
        rows.append(f"lr_{i}.tif\thr_{i}.tif")
    with open(os.path.join(root, "index.csv"), "w") as fh:
        fh.write("\n".join(rows))

    train_loader, val_loader = init_dataloader(
        "s2v", batch_size=2, patch_size=16, crop="grid", data_root=root
    )
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3))
    state = trainer.fit(train_loader, val_loader, epochs=1, val_metrics_every=1)

    variables = {"params": state.params, "batch_stats": state.batch_stats,
                 "quant": qz.quantize_params_tree(state.params,
                                                  jax.random.PRNGKey(0))}
    out = run_task(model, variables, val_loader, "int8-task", 2.0,
                   samples=4, chunk=4,
                   results_root=str(tmp_path / "results"))
    assert np.isfinite(out["mmse"])
    assert os.path.exists(os.path.join(out["results_dir"],
                                       "error_mean_std_maps.png"))
