"""Multi-head self-attention over the H*W token grid of a feature map.

Parity: reference ``models/layers.py:300-354`` (``self_attention``): 1x1-conv
QKV projections, scaled dot-product attention over flattened spatial tokens,
1x1-conv output projection, residual add. Unused by the shipped reference
models but part of the layer API surface.

TPU-native: the attention core is ``jax.nn.dot_product_attention`` — XLA
lowers it to fused MXU matmuls with a streaming softmax; token counts here
(<= 64*64) are far below the regime where a hand-written Pallas flash kernel
would win.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from simple_vae_rs_tpu.ops.conv_blocks import torch_conv

Array = jnp.ndarray


class SelfAttention2D(nn.Module):
    """Convolutional multi-head self-attention with residual connection."""

    features: int
    num_heads: int = 8
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array) -> Array:
        if self.features % self.num_heads != 0:
            raise ValueError("features must be divisible by num_heads")
        b, h, w, c = x.shape
        head_dim = self.features // self.num_heads

        q = torch_conv(c, c, 1, 1, 0, dtype=self.dtype, name="query")(x)
        k = torch_conv(c, c, 1, 1, 0, dtype=self.dtype, name="key")(x)
        v = torch_conv(c, c, 1, 1, 0, dtype=self.dtype, name="value")(x)

        # (B, H*W tokens, heads, head_dim)
        def to_tokens(t: Array) -> Array:
            return t.reshape(b, h * w, self.num_heads, head_dim)

        out = jax.nn.dot_product_attention(to_tokens(q), to_tokens(k), to_tokens(v))
        out = out.reshape(b, h, w, c)
        out = torch_conv(c, c, 1, 1, 0, dtype=self.dtype, name="out")(out)
        return out + x
