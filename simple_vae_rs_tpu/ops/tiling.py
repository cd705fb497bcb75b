"""Grid tiling + feathered stitching for arbitrary-size image serving.

The reference operates strictly on fixed-size patches: its dataset crops
aligned windows (``/root/reference/dataset.py:60-77``) and its test path
reconstructs single patches (``/root/reference/models/base.py:306-348``) —
there is no way to super-resolve a whole tile. Production rasters are far
bigger than one patch, so the serving layer needs to cover an (H, W)
image with an overlapping grid of model-sized windows, run each window
through the compiled endpoint, and blend the outputs back seamlessly.

This module is the pure array logic for that: ``grid_starts`` places the
windows (stride = patch - overlap, last window flush to the edge),
``stitch`` re-assembles per-window outputs with separable feather weights
(linear ramps over the overlap band) normalized by the accumulated weight
so coverage differences never change brightness. If every window output
is a crop of one underlying image, ``stitch`` reproduces that image
exactly — the blend only acts where neighboring windows disagree.

Stitching is host-side numpy on purpose: it is O(pixels) cheap next to
the model, and keeping it out of the jitted graph means one compiled
(batch, patch, patch, C) model shape serves every tile size.
"""

from __future__ import annotations

from typing import List, Sequence, Tuple

import numpy as np


def grid_starts(size: int, patch: int, stride: int) -> List[int]:
    """Window start offsets covering ``[0, size)`` with the last one flush.

    ``stride`` windows from 0; if the regular grid stops short of the
    edge, one extra window is placed at ``size - patch`` (it overlaps its
    neighbor by more than the others — the feather blend handles the
    uneven overlap).
    """
    if patch <= 0 or stride <= 0:
        raise ValueError(f"patch and stride must be positive (got {patch}, {stride})")
    if patch > size:
        raise ValueError(f"patch {patch} exceeds image extent {size}")
    starts = list(range(0, size - patch + 1, stride))
    if starts[-1] != size - patch:
        starts.append(size - patch)
    return starts


def feather_profile(patch: int, overlap: int) -> np.ndarray:
    """1-D blend weights: linear ramps over ``overlap`` pixels, interior 1.

    Ramp values are strictly positive (1/(overlap+1) .. overlap/(overlap+1))
    so the normalizing accumulation in ``stitch`` never divides by zero,
    and symmetric so two neighbors' ramps sum to a constant across a
    standard-overlap seam.
    """
    if not 0 <= overlap <= patch // 2:
        raise ValueError(f"overlap must be in [0, patch//2] (got {overlap} for patch {patch})")
    w = np.ones(patch, np.float32)
    if overlap:
        ramp = np.arange(1, overlap + 1, dtype=np.float32) / (overlap + 1)
        w[:overlap] = ramp
        w[patch - overlap:] = ramp[::-1]
    return w


def stitch(
    patches: np.ndarray,
    starts: Sequence[Tuple[int, int]],
    out_hw: Tuple[int, int],
    overlap: int,
) -> np.ndarray:
    """Blend (N, p, p, C) window outputs into an (H, W, C) mosaic.

    Each window contributes ``feather_profile`` weights (outer product of
    the row/column profiles); the result is the per-pixel weighted mean,
    so image borders (covered once, at down-ramped weight) normalize back
    to exactly the single window's value.
    """
    patches = np.asarray(patches, np.float32)
    if patches.ndim != 4 or patches.shape[1] != patches.shape[2]:
        raise ValueError(f"patches must be (N, p, p, C), got {patches.shape}")
    if len(starts) != patches.shape[0]:
        raise ValueError(f"{patches.shape[0]} patches but {len(starts)} starts")
    p = patches.shape[1]
    prof = feather_profile(p, overlap)
    w = (prof[:, None] * prof[None, :])[..., None]
    num = np.zeros((*out_hw, patches.shape[-1]), np.float32)
    den = np.zeros((*out_hw, 1), np.float32)
    for (sh, sw), patch in zip(starts, patches):
        if sh < 0 or sw < 0 or sh + p > out_hw[0] or sw + p > out_hw[1]:
            raise ValueError(f"window at {(sh, sw)} falls outside {out_hw}")
        num[sh:sh + p, sw:sw + p] += w * patch
        den[sh:sh + p, sw:sw + p] += w
    if np.any(den == 0.0):
        raise ValueError("window grid leaves uncovered pixels")
    return num / den
