"""LPIPS (AlexNet) perceptual distance, implemented natively in JAX.

The reference computes LPIPS(alex) per image on the host through the
``lpips`` torch package (``models/base.py:37``, ``models/vae.py:170-172``),
with BGR-reordered channels ``[2,1,0]``. This module reproduces that exact
computation on-device:

- scaling layer: ``(x - shift) / scale`` with the package's constants
  (inputs are fed in the reference's convention — the [0,1]-normalized
  images go in directly, as the reference does);
- AlexNet feature stack: 5 conv+ReLU taps with maxpools after taps 0/1;
- per-tap: channel-unit-normalize, squared difference, non-negative 1x1
  linear calibration weights, spatial mean; sum over taps.

LPIPS is a *learned* metric, so it needs the pretrained weights. They load
from an ``.npz`` (``SVRS_LPIPS_WEIGHTS`` env var, or
``~/.cache/svrs_lpips_alex.npz``), exported once on any machine that has
the ``lpips`` package via ``scripts/export_lpips_weights.py``. Without a
weights file the caller falls back to the torch package or skips the
metric (``utils/lpips_optional.py``).
"""

from __future__ import annotations

import os
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

Array = jnp.ndarray

# AlexNet ``features`` geometry (torchvision): conv indices 0,3,6,8,10;
# ReLU taps after each; maxpool(k3, s2) after taps 0 and 1.
_CONVS = (
    {"out": 64, "k": 11, "s": 4, "p": 2},
    {"out": 192, "k": 5, "s": 1, "p": 2},
    {"out": 384, "k": 3, "s": 1, "p": 1},
    {"out": 256, "k": 3, "s": 1, "p": 1},
    {"out": 256, "k": 3, "s": 1, "p": 1},
)
_POOL_AFTER = (0, 1)

DEFAULT_WEIGHTS = os.path.expanduser("~/.cache/svrs_lpips_alex.npz")


def weights_path() -> str:
    return os.environ.get("SVRS_LPIPS_WEIGHTS", DEFAULT_WEIGHTS)


def load_weights(path: Optional[str] = None) -> Optional[Dict[str, np.ndarray]]:
    """Load the exported npz; None when absent or malformed."""
    path = path or weights_path()
    if not os.path.exists(path):
        return None
    try:
        with np.load(path) as z:
            params = {k: np.asarray(z[k], np.float32) for k in z.files}
        for i in range(5):
            w = params[f"conv{i}_w"]  # torch (O, I, kh, kw)
            if w.shape[0] != _CONVS[i]["out"]:
                return None
            params[f"conv{i}_w"] = np.ascontiguousarray(
                w.transpose(2, 3, 1, 0)  # -> HWIO
            )
            params[f"lin{i}"] = params[f"lin{i}"].reshape(-1)
        params["shift"] = params["shift"].reshape(3)
        params["scale"] = params["scale"].reshape(3)
        return params
    except Exception:
        return None


def _prep(x: Array) -> Array:
    """NHWC any-C -> NHWC RGB in the reference's convention: BGR reorder
    for >=3 bands (``models/base.py:317`` visual convention used for LPIPS
    too), gray replication otherwise."""
    if x.shape[-1] >= 3:
        return x[..., [2, 1, 0]]
    return jnp.repeat(x[..., :1], 3, axis=-1)


def _features(x: Array, params) -> list:
    h = (x - params["shift"]) / params["scale"]
    taps = []
    for i, spec in enumerate(_CONVS):
        h = jax.lax.conv_general_dilated(
            h,
            jnp.asarray(params[f"conv{i}_w"]),
            window_strides=(spec["s"], spec["s"]),
            padding=[(spec["p"], spec["p"])] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + params[f"conv{i}_b"]
        h = jax.nn.relu(h)
        taps.append(h)
        # skip a pool whose VALID window would be empty (inputs < 3px at
        # this depth): keeps small eval patches defined where the torch
        # package would crash; identical behavior at >=32px inputs
        if i in _POOL_AFTER and min(h.shape[1], h.shape[2]) >= 3:
            h = jax.lax.reduce_window(
                h, -jnp.inf, jax.lax.max,
                window_dimensions=(1, 3, 3, 1),
                window_strides=(1, 2, 2, 1),
                padding="VALID",
            )
    return taps


@partial(jax.jit, static_argnames=())
def _lpips_from_params(a: Array, b: Array, params) -> Array:
    fa = _features(_prep(a), params)
    fb = _features(_prep(b), params)
    total = jnp.zeros((a.shape[0],), jnp.float32)
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        # lpips.normalize_tensor puts eps OUTSIDE the sqrt:
        # x / (||x||_2 + 1e-10) — not x / sqrt(sum + eps). The difference
        # only matters near zero-norm pixels but parity is the point
        # (cross-derived against a hand-built torch LPIPS in
        # tests/test_lpips.py).
        na = xa / (jnp.sqrt(jnp.sum(xa**2, axis=-1, keepdims=True)) + 1e-10)
        nb = xb / (jnp.sqrt(jnp.sum(xb**2, axis=-1, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2
        w = params[f"lin{i}"]  # (C,), non-negative calibration
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(1, 2))
    return total


MIN_INPUT = 11  # AlexNet conv1 kernel: smaller inputs have no valid output


def lpips(a: Array, b: Array, params: Dict[str, np.ndarray]) -> Array:
    """Per-image LPIPS for NHWC batches (any band count); on-device."""
    if min(a.shape[1], a.shape[2]) < MIN_INPUT:
        raise ValueError(
            f"LPIPS(alex) needs inputs >= {MIN_INPUT}px; got {a.shape}"
        )
    p = {k: jnp.asarray(v) for k, v in params.items()}
    return _lpips_from_params(jnp.asarray(a, jnp.float32),
                              jnp.asarray(b, jnp.float32), p)
