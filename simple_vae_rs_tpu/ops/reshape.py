"""Space/depth reshuffles used to move between latent-grid factorizations.

The reference moves between flat latent vectors and feature maps through
C-major ``Flatten``/``Unflatten`` pairs whose factorizations don't always
agree (e.g. ``cond_vae.py:167-189`` reinterprets the flat ``u`` vector with a
different channel/spatial split than the encoder that produced it — a fixed
but structure-scrambling bijection). This rebuild uses structure-preserving
pixel-shuffle mappings instead: a factor-2 regrouping moves information
between neighboring spatial positions and channel groups without scrambling.
Capability and parameter counts are identical; shapes match the reference at
every stage (documented divergence, SURVEY.md §7).
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def space_to_depth(x: Array, block: int = 2) -> Array:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b)."""
    b, h, w, c = x.shape
    x = x.reshape(b, h // block, block, w // block, block, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h // block, w // block, c * block * block)


def depth_to_space(x: Array, block: int = 2) -> Array:
    """(B, H, W, C) -> (B, H*b, W*b, C/(b*b)). Inverse of space_to_depth."""
    b, h, w, c = x.shape
    c_out = c // (block * block)
    x = x.reshape(b, h, w, block, block, c_out)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b, h * block, w * block, c_out)


def cmajor_regroup_down(x: Array, block: int = 2) -> Array:
    """(B, H, W, C) -> (B, H/b, W/b, C*b*b) with the *reference's* C-major
    Flatten/Unflatten reinterpretation semantics.

    Exactly reproduces ``nn.Flatten`` of an NCHW ``(C, H, W)`` map followed
    by ``nn.Unflatten(1, (C*b*b, H/b, W/b))`` (reference
    ``cond_vae.py:167-189``): equivalent to the NCHW reshape
    ``(B, C, H, W) -> (B, C*b*b, H/b, W/b)``. Unlike
    :func:`space_to_depth` this scrambles spatial structure (row pairs move
    into channels; columns scatter across the new row) — it exists so
    converted reference checkpoints are *functionally exact*
    (``utils/convert.py``; enable with ``CondSRVAEConfig.torch_regroup``).
    """
    b, h, w, c = x.shape
    x = x.transpose(0, 3, 1, 2)  # NCHW
    x = x.reshape(b, c * block * block, h // block, w // block)
    return x.transpose(0, 2, 3, 1)


def cmajor_regroup_up(x: Array, block: int = 2) -> Array:
    """(B, H, W, C) -> (B, H*b, W*b, C/(b*b)); inverse of
    :func:`cmajor_regroup_down` (the reference's C-major reinterpretation
    in the widening direction, e.g. ``decoder_x``'s Unflatten of the
    ``y_to_z`` flat vector — ``cond_vae.py:110-118,270-272``)."""
    b, h, w, c = x.shape
    x = x.transpose(0, 3, 1, 2)  # NCHW
    x = x.reshape(b, c // (block * block), h * block, w * block)
    return x.transpose(0, 2, 3, 1)


def flatten_map(x: Array) -> Array:
    """(B, H, W, C) -> (B, H*W*C). This framework's canonical latent order."""
    return x.reshape(x.shape[0], -1)


def unflatten_map(x: Array, h: int, w: int, c: int) -> Array:
    """(B, H*W*C) -> (B, H, W, C)."""
    return x.reshape(x.shape[0], h, w, c)
