"""Image normalization (reference ``utils.py:4-23``), NHWC + jit-friendly.

Per-channel min-max scaling to [0, 1] with the reference's ``+1e-5``
denominator guard. Runs on device inside the patchify pipeline
(``ops/patchify.py``) instead of per-item in host dataloader workers.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def normalize_image(image: Array) -> Array:
    """Min-max normalize per channel over the spatial dims.

    Accepts (H, W, C) or (B, H, W, C); min/max are taken over H, W per
    channel (and per batch element for 4-D), matching reference
    ``utils.py:12-20`` (which reduces over the spatial axes in NCHW).
    """
    if image.ndim == 3:
        spatial = (0, 1)
    elif image.ndim == 4:
        spatial = (1, 2)
    else:
        raise ValueError("Input image must be a 3-D or 4-D array.")
    min_val = jnp.min(image, axis=spatial, keepdims=True)
    max_val = jnp.max(image, axis=spatial, keepdims=True)
    return (image - min_val) / (max_val - min_val + 1e-5)
