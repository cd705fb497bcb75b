#!/usr/bin/env python
"""Benchmark the data path: tiles/sec and patches/sec through the loader.

Quantifies the on-device patchify design (SURVEY §3.5): the reference
re-reads and re-decodes a full tile from disk per 64px patch in its
DataLoader workers; here one tile read feeds 16 patches and the
crop/normalize runs inside jit. Writes a synthetic ARM tree of real TIFF
files, then times ``DeviceLoader`` end to end (disk -> numpy -> device ->
patchified batch). Prints one JSON line per mode.
"""

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(n_tiles=48, hr=256, batch_size=8, patch=64, epochs=2):
    import jax
    import numpy as np

    from simple_vae_rs_tpu.data.datasets import Sen2VenusDataset
    from simple_vae_rs_tpu.data.loader import DeviceLoader
    from simple_vae_rs_tpu.data.tiffio import write_tiff

    root = tempfile.mkdtemp(prefix="bench_arm_")
    try:
        rng = np.random.default_rng(0)
        rows = ["b2b3b4b8_10m\tb2b3b4b8_05m"]
        for i in range(n_tiles):
            hr_img = (rng.random((4, hr, hr)) * 10000).astype(np.int16)
            lr_img = (
                hr_img.reshape(4, hr // 2, 2, hr // 2, 2).mean(axis=(2, 4))
            ).astype(np.int16)
            write_tiff(os.path.join(root, f"l{i}.tif"), lr_img, True)
            write_tiff(os.path.join(root, f"h{i}.tif"), hr_img, True)
            rows.append(f"l{i}.tif\th{i}.tif")
        with open(os.path.join(root, "index.csv"), "w") as fh:
            fh.write("\n".join(rows))

        ds = Sen2VenusDataset(root=root)
        for crop in ("grid", "random"):
            loader = DeviceLoader(ds, batch_size, patch, crop=crop, shuffle=True)
            # warmup epoch (compiles the patchify jit)
            for lr, hr_b in loader:
                pass
            jax.block_until_ready(hr_b)
            t0 = time.perf_counter()
            tiles = patches = 0
            for _ in range(epochs):
                for lr, hr_b in loader:
                    patches += hr_b.shape[0]
                    tiles += batch_size
            float(jax.device_get(hr_b[0, 0, 0, 0]))
            dt = time.perf_counter() - t0
            print(json.dumps({
                "metric": "data_pipeline_throughput",
                "crop": crop,
                "tiles_per_sec": round(tiles / dt, 1),
                "patches_per_sec": round(patches / dt, 1),
                "tile_px": hr,
                "patch_px": patch,
            }))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
