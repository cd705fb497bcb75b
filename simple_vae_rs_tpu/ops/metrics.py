"""On-device image quality metrics (SSIM, PSNR, MSE).

The reference computes SSIM per image on the *host* with scikit-image
(``models/vae.py:162-168``: win_size=11, data_range=1.0, channel_axis=0,
uniform windows, sample covariance) — a major device->host sink flagged in
SURVEY §3.1. These are the same formulas as batched XLA reductions, so full-
validation metrics never leave the device.

LPIPS is a learned metric requiring pretrained AlexNet weights; it is exposed
through ``utils/lpips_optional.py`` and skipped when the ``lpips`` package
(and weights) are unavailable.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _uniform_filter_valid(x: Array, win: int) -> Array:
    """Windowed mean over VALID windows; x is (B, H, W, C)."""
    summed = lax.reduce_window(
        x,
        0.0,
        lax.add,
        window_dimensions=(1, win, win, 1),
        window_strides=(1, 1, 1, 1),
        padding="VALID",
    )
    return summed / (win * win)


def ssim(
    a: Array,
    b: Array,
    win_size: int = 11,
    data_range: float = 1.0,
    k1: float = 0.01,
    k2: float = 0.03,
) -> Array:
    """Per-image SSIM matching ``skimage.metrics.structural_similarity``.

    Inputs (B, H, W, C); returns (B,) — per-channel SSIM maps over valid
    windows (skimage computes centered windows then crops the pad border;
    identical to VALID windows), sample covariance normalization
    ``NP/(NP-1)``, averaged over channels as skimage does with
    ``channel_axis``.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    np_ = win_size * win_size
    cov_norm = np_ / (np_ - 1.0)
    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2

    ua = _uniform_filter_valid(a, win_size)
    ub = _uniform_filter_valid(b, win_size)
    uaa = _uniform_filter_valid(a * a, win_size)
    ubb = _uniform_filter_valid(b * b, win_size)
    uab = _uniform_filter_valid(a * b, win_size)

    va = cov_norm * (uaa - ua * ua)
    vb = cov_norm * (ubb - ub * ub)
    vab = cov_norm * (uab - ua * ub)

    s = ((2 * ua * ub + c1) * (2 * vab + c2)) / (
        (ua * ua + ub * ub + c1) * (va + vb + c2)
    )
    return jnp.mean(s, axis=(1, 2, 3))


def psnr(a: Array, b: Array, data_range: float = 1.0) -> Array:
    """Per-image PSNR in dB; inputs (B, H, W, C), returns (B,)."""
    mse = jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=(1, 2, 3))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def batch_mse(a: Array, b: Array) -> Array:
    return jnp.mean((a.astype(jnp.float32) - b.astype(jnp.float32)) ** 2, axis=(1, 2, 3))


ssim_batch = jax.jit(ssim, static_argnames=("win_size",))
psnr_batch = jax.jit(psnr)
