"""Pluggable metric/image logging.

The reference hard-wires wandb (entity included — ``models/base.py:62-79``).
Here logging is a small protocol with three implementations:

- ``WandbLogger`` — used when the ``wandb`` package is importable
- ``JsonlLogger`` — appends one JSON object per log call (the default;
  greppable, diffable, no network)
- ``NullLogger`` — discards everything (tests)

Metric names/cadence match the reference exactly ("Loss/loss",
"Metrics/SSIM_SR", "HyperParameters/Gamma_X", ... — see SURVEY §5.e).
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Optional, Protocol

import numpy as np


class Logger(Protocol):
    def log(self, metrics: Dict[str, Any], step: Optional[int] = None) -> None: ...

    def log_images(
        self, images: Dict[str, Any], step: Optional[int] = None
    ) -> None: ...

    def finish(self) -> None: ...


class NullLogger:
    def log(self, metrics, step=None):
        pass

    def log_images(self, images, step=None):
        pass

    def finish(self):
        pass


class JsonlLogger:
    """One JSON object per call to ``{run_dir}/metrics.jsonl``; images as PNG."""

    def __init__(self, run_dir: str) -> None:
        self.run_dir = run_dir
        os.makedirs(run_dir, exist_ok=True)
        self._fh = open(os.path.join(run_dir, "metrics.jsonl"), "a")

    def log(self, metrics, step=None):
        rec = {"_step": step, "_time": time.time()}
        for k, v in metrics.items():
            rec[k] = float(v) if np.isscalar(v) or hasattr(v, "item") else v
        self._fh.write(json.dumps(rec) + "\n")
        self._fh.flush()

    def log_images(self, images, step=None):
        img_dir = os.path.join(self.run_dir, "images")
        os.makedirs(img_dir, exist_ok=True)
        for name, batch in images.items():
            arr = np.asarray(batch)
            if arr.ndim == 3:
                arr = arr[None]
            for i, img in enumerate(arr):
                _save_png(
                    os.path.join(
                        img_dir, f"{name.replace('/', '_')}_s{step}_{i}.png"
                    ),
                    img,
                )

    def finish(self):
        self._fh.close()


def to_png_bytes(img: np.ndarray) -> Optional[bytes]:
    """(H, W, C) float [0,1] -> PNG bytes, BGR->RGB bands [2,1,0] like the
    reference's visualizations (``models/base.py:317``); None without PIL.
    The single band-convention/encoding choke point — the JSONL panels and
    the TensorBoard image summaries both go through here."""
    try:
        from io import BytesIO

        from PIL import Image
    except ImportError:
        return None
    if img.shape[-1] >= 3:
        img = img[..., [2, 1, 0]]
    else:
        img = np.repeat(img[..., :1], 3, axis=-1)
    arr = np.clip(np.nan_to_num(img) * 255.0, 0, 255).astype(np.uint8)
    buf = BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return buf.getvalue()


def _save_png(path: str, img: np.ndarray) -> None:
    data = to_png_bytes(img)
    if data is None:
        return
    with open(path, "wb") as fh:
        fh.write(data)


class WandbLogger:
    def __init__(self, project: str, name: str, config: Dict[str, Any]) -> None:
        import wandb

        self._wandb = wandb
        self.run = wandb.init(project=project, name=name, config=config)

    def log(self, metrics, step=None):
        self.run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_images(self, images, step=None):
        payload = {}
        for name, batch in images.items():
            arr = np.asarray(batch)
            if arr.ndim == 3:
                arr = arr[None]
            payload[name] = [
                self._wandb.Image(np.clip(img[..., [2, 1, 0]], 0, 1))
                for img in arr
            ]
        self.run.log(payload, step=step)

    def finish(self):
        self.run.finish()


def make_logger(
    project: str,
    name: str,
    config: Dict[str, Any],
    run_dir: str = "runs",
    tensorboard: bool = False,
) -> Logger:
    """wandb when available, else JSONL (reference wandb-spine, SURVEY §5.e).

    ``tensorboard=True`` tees the stream into a TensorBoard event file under
    the run dir as well (the reference *declares* tensorboard but never
    writes it — SURVEY §5.a; here it's a real sink, stdlib-only).
    """
    out_dir = os.path.join(run_dir, f"{project}-{name}")
    try:
        import wandb  # noqa: F401

        base: Logger = WandbLogger(project, name, config)
    except Exception:
        base = JsonlLogger(out_dir)
    if tensorboard:
        from simple_vae_rs_tpu.utils.tensorboard import (
            TeeLogger,
            TensorBoardLogger,
        )

        return TeeLogger(base, TensorBoardLogger(os.path.join(out_dir, "tb")))
    return base
