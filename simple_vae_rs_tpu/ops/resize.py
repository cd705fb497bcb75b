"""Bicubic 2x upsampling matching ``torch.nn.functional.interpolate``.

The reference's SR baseline is ``F.interpolate(y, scale_factor=2,
mode="bicubic")`` (reference ``models/cond_vae.py:451,555``): cubic
convolution with a = -0.75, align_corners=False, replicate borders. For an
exact x2 scale this reduces to a fixed separable 4-tap two-phase filter —
implemented here as shifted weighted slices (pure VPU work, no gathers),
which XLA fuses into a handful of elementwise ops.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray

# Cubic-convolution (a=-0.75) taps for fractional offsets 0.75 / 0.25.
# Output pixel 2j   samples input at j - 0.25 -> taps on rows j-2..j+1
# Output pixel 2j+1 samples input at j + 0.25 -> taps on rows j-1..j+2
_W_EVEN = (-0.03515625, 0.26171875, 0.87890625, -0.10546875)
_W_ODD = (-0.10546875, 0.87890625, 0.26171875, -0.03515625)


def _upsample_axis(x: Array, axis: int) -> Array:
    n = x.shape[axis]
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (2, 2)
    xp = jnp.pad(x, pad_width, mode="edge")

    def taps(start):
        # four consecutive length-n slices beginning at `start`
        return [
            jnp.take(xp, jnp.arange(start + k, start + k + n), axis=axis)
            for k in range(4)
        ]

    even = sum(w * t for w, t in zip(_W_EVEN, taps(0)))
    odd = sum(w * t for w, t in zip(_W_ODD, taps(1)))
    inter = jnp.stack([even, odd], axis=axis + 1)
    new_shape = list(x.shape)
    new_shape[axis] = 2 * n
    return inter.reshape(new_shape)


def bicubic_upsample_2x(x: Array) -> Array:
    """(B, H, W, C) -> (B, 2H, 2W, C), torch-bicubic semantics."""
    x = x.astype(jnp.float32)
    x = _upsample_axis(x, 1)
    x = _upsample_axis(x, 2)
    return x
