"""On-device patchification + normalization — the data path's hot stage.

The reference's DataLoader workers re-read and re-decode a full 256px tile
from disk *per 64px patch* and normalize on the CPU (``dataset.py:165-191``,
SURVEY §3.5). Here a tile batch crosses host->device once, and everything
else — grid split, aligned random crops, per-channel min-max normalize —
is a jitted reshape/transpose/dynamic-slice pipeline (pure layout +
VPU work that XLA fuses; 1 read -> 16 patches at line rate).

Grid-patch ordering is row-major, matching the reference ``select_crop``
index convention (``dataset.py:220-228``); grid mode makes the effective
batch ``16 x batch_size`` real (the reference documents but never wires
this — SURVEY §2.2-3).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.utils.image import normalize_image

Array = jnp.ndarray


def grid_patchify(tiles: Array, patch: int) -> Array:
    """(B, H, W, C) -> (B * (H/p)*(W/p), p, p, C), row-major within a tile."""
    b, h, w, c = tiles.shape
    gh, gw = h // patch, w // patch
    x = tiles[:, : gh * patch, : gw * patch, :]
    x = x.reshape(b, gh, patch, gw, patch, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, gh, gw, p, p, C)
    return x.reshape(b * gh * gw, patch, patch, c)


def grid_unpatchify(patches: Array, grid: int) -> Array:
    """Inverse of :func:`grid_patchify` for square grids."""
    n, p, _, c = patches.shape
    b = n // (grid * grid)
    x = patches.reshape(b, grid, grid, p, p, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, grid * p, grid * p, c)


@partial(jax.jit, static_argnames=("patch",))
def grid_sr_batch(lr_tiles: Array, hr_tiles: Array, patch: int) -> Tuple[Array, Array]:
    """Grid mode: tile pair batch -> normalized (LR p/2, HR p) patch pairs.

    LR patches use ``patch // 2`` so patch i of the LR grid covers the same
    ground footprint as patch i of the HR grid (2x SR pairing,
    ``dataset.py:157-162``). Normalization is per patch per channel,
    matching the reference order (crop first, then normalize).
    """
    lr = grid_patchify(lr_tiles.astype(jnp.float32), patch // 2)
    hr = grid_patchify(hr_tiles.astype(jnp.float32), patch)
    return normalize_image(lr), normalize_image(hr)


@partial(jax.jit, static_argnames=("patch",))
def random_sr_crop_batch(
    rng: jax.Array, lr_tiles: Array, hr_tiles: Array, patch: int
) -> Tuple[Array, Array]:
    """Random mode: aligned (LR p/2, HR p) crops per tile, normalized.

    Parity with ``sr_randomcrop`` (``dataset.py:193-218``): top/left drawn
    in LR coordinates, HR crop at exactly 2x those coordinates.
    """
    b, h, w, _ = lr_tiles.shape
    p2 = patch // 2
    top = jax.random.randint(jax.random.fold_in(rng, 0), (b,), 0, h - p2)
    left = jax.random.randint(jax.random.fold_in(rng, 1), (b,), 0, w - p2)

    def crop(img, t, l, size):
        return jax.lax.dynamic_slice(
            img, (t, l, 0), (size, size, img.shape[-1])
        )

    lr = jax.vmap(lambda img, t, l: crop(img, t, l, p2))(
        lr_tiles.astype(jnp.float32), top, left
    )
    hr = jax.vmap(lambda img, t, l: crop(img, t, l, patch))(
        hr_tiles.astype(jnp.float32), 2 * top, 2 * left
    )
    return normalize_image(lr), normalize_image(hr)


@partial(jax.jit, static_argnames=("patch",))
def grid_single_batch(tiles: Array, patch: int) -> Array:
    """Single-resolution grid patchify + normalize (plain-VAE path)."""
    return normalize_image(grid_patchify(tiles.astype(jnp.float32), patch))
