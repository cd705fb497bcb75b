"""Tile-pair datasets: Sen2Venus, Floods, and a synthetic generator.

Datasets here are *tile sources*: ``__getitem__`` returns raw NHWC float32
tile pairs ``(lr (H/2, W/2, C), hr (H, W, C))``. Cropping and normalization
happen on device (``ops/patchify.py``) — the reference instead crops and
normalizes per item inside DataLoader workers, re-reading the full tile per
patch (``dataset.py:165-191``, SURVEY §3.5).

- ``Sen2VenusDataset``: tab-separated ``index.csv`` with tile-pair paths in
  columns ``b2b3b4b8_10m`` / ``b2b3b4b8_05m`` (reference
  ``dataset.py:107-116``: 10m Sentinel-2 LR vs 5m Venus HR, 4 bands).
- ``FloodDataset``: directories of S2 tiffs; quantile-normalized patches
  (reference ``dataset.py:50-100``, with its hardcoded cluster path made a
  parameter and its single-tensor items fixed to pairs — SURVEY §2.2-10).
- ``SyntheticSRDataset``: deterministic smooth random fields with
  LR = 2x2 box-downsampled HR, so the whole framework runs (tests, bench,
  CI) without the proprietary ARM tree.
"""

from __future__ import annotations

import csv
import os
from typing import List, Tuple

import numpy as np

from simple_vae_rs_tpu.data.tiffio import read_tiff


def _to_hwc(arr: np.ndarray) -> np.ndarray:
    """tifffile-style output -> (H, W, C), native dtype preserved.

    Integer tiles (Sen2Venus is int16 digital numbers) stay integer so the
    host->device transfer ships half the bytes; the cast to f32 happens on
    device inside the patchify jit (normalization is f32 regardless).
    """
    if arr.ndim == 2:
        arr = arr[..., None]
    elif arr.ndim == 3 and arr.shape[0] <= 16 and arr.shape[0] < arr.shape[-1]:
        arr = np.transpose(arr, (1, 2, 0))  # (C, H, W) -> (H, W, C)
    if arr.dtype.kind == "f" and arr.dtype != np.float32:
        arr = arr.astype(np.float32)
    return np.ascontiguousarray(arr)


class Sen2VenusDataset:
    """Sentinel-2 / Venus tile pairs listed by ``index.csv``."""

    def __init__(
        self,
        root: str = "ARM",
        bands: str = "visu",
        patch_size: int = 256,
    ) -> None:
        if bands != "visu":
            raise NotImplementedError("Only 'visu' bands are implemented.")
        self.root = os.path.abspath(root)
        self.patch_size = patch_size
        self.p0 = "b2b3b4b8_10m"  # LR (10 m)
        self.p1 = "b2b3b4b8_05m"  # HR (5 m)
        index = os.path.join(self.root, "index.csv")
        self.rows: List[Tuple[str, str]] = []
        with open(index, newline="") as fh:
            for rec in csv.DictReader(fh, delimiter="\t"):
                self.rows.append((rec[self.p0], rec[self.p1]))

    def __len__(self) -> int:
        return len(self.rows)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        lr_rel, hr_rel = self.rows[idx]
        lr = _to_hwc(read_tiff(os.path.join(self.root, lr_rel)))
        hr = _to_hwc(read_tiff(os.path.join(self.root, hr_rel)))
        return lr, hr


class FloodDataset:
    """Single-resolution flood patches; items are (patch, patch) pairs."""

    def __init__(self, root: str, patch_size: int = 64) -> None:
        self.patch_size = patch_size
        self.patches: List[np.ndarray] = []
        for site in sorted(os.listdir(root)):
            s2 = os.path.join(root, site, "S2")
            if not os.path.isdir(s2):
                continue
            for name in sorted(os.listdir(s2)):
                if not name.endswith(".tif"):
                    continue
                img = _to_hwc(read_tiff(os.path.join(s2, name)))
                self._extract_patches(img)

    def _extract_patches(self, img: np.ndarray) -> None:
        p = self.patch_size
        h, w = img.shape[:2]
        for row in range(0, h - p + 1, p):
            for col in range(0, w - p + 1, p):
                patch = img[row : row + p, col : col + p]
                qlo, qhi = np.quantile(patch, [0.01, 0.99], axis=(0, 1), keepdims=True)
                patch = np.clip((patch - qlo) / (qhi - qlo + 1e-5), 0.0, 1.0)
                if not np.isnan(patch).any():
                    self.patches.append(patch.astype(np.float32))

    def __len__(self) -> int:
        return len(self.patches)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        p = self.patches[idx]
        return p, p


class SyntheticSRDataset:
    """Deterministic synthetic LR/HR tile pairs (no files needed).

    HR tiles are smooth multi-band random fields; the LR tile is the 2x2
    box-downsample, so SR models have genuine structure to learn.
    """

    def __init__(
        self,
        length: int = 64,
        hr_size: int = 256,
        channels: int = 4,
        seed: int = 0,
    ) -> None:
        self.length = length
        self.hr_size = hr_size
        self.channels = channels
        self.seed = seed

    def __len__(self) -> int:
        return self.length

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, np.ndarray]:
        if not 0 <= idx < self.length:
            raise IndexError(idx)
        rng = np.random.default_rng(self.seed * 1_000_003 + idx)
        hs = self.hr_size
        base = rng.standard_normal((hs // 16, hs // 16, self.channels))
        hr = np.kron(base, np.ones((16, 16, 1)))
        # smooth out the block edges with a small separable box blur
        k = 8
        pad = np.pad(hr, ((k, k), (k, k), (0, 0)), mode="edge")
        cs = np.cumsum(pad, axis=0)
        hr = (cs[2 * k :] - cs[: -2 * k]) / (2 * k)
        cs = np.cumsum(hr, axis=1)
        hr = (cs[:, 2 * k :] - cs[:, : -2 * k]) / (2 * k)
        hr = hr[:hs, :hs]
        hr = hr + 0.05 * rng.standard_normal(hr.shape)
        lr = hr.reshape(hs // 2, 2, hs // 2, 2, self.channels).mean(axis=(1, 3))
        scale = 1000.0  # raw-ish digital numbers; normalization happens on device
        return (
            (lr * scale).astype(np.float32),
            (hr * scale).astype(np.float32),
        )
