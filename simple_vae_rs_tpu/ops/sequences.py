"""Auto-planned down/upsample sequences from a compression ratio.

Parity target: reference ``models/layers.py:25-214`` (``downsample_sequence``
/ ``upsample_sequence``) — experimental modules that plan a stride/channel
schedule automatically from an input shape and compression ratio. The
reference versions are dead code with real defects (SURVEY §2.2-8):
``upsample_sequence`` hardcodes a 1x1 input grid (``layers.py:136-138``) so
it only works for one degenerate shape, and neither is used by the models.

This re-design keeps the *capability* — "give me an encoder/decoder stack
for this shape and compression ratio" — with a sound plan:

- ``DownsampleSequence``: K stride-2 stages (conv3x3 + conv4x4/s2 + BN +
  ReLU, optional self-attention), channels growing geometrically toward a
  target chosen so the flattened output is ``round(prod(shape)/cr)``
  rounded to a whole channel count on the final grid.
- ``UpsampleSequence``: infers the largest square grid that divides the
  flat input, then K stride-2 transposed stages down to the target shape,
  sigmoid output — shape-sound for every (in_size, out_shape) where such a
  grid exists.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from simple_vae_rs_tpu.ops.attention import SelfAttention2D
from simple_vae_rs_tpu.ops.conv_blocks import (
    DownBlock,
    UpBlock,
    torch_conv,
)

Array = jnp.ndarray


def plan_downsample(
    in_shape: Tuple[int, int, int], compression_ratio: float, num_steps: Optional[int]
) -> Tuple[int, list, int]:
    """-> (steps, channel schedule, out_flat_size). in_shape = (H, W, C)."""
    h, w, c = in_shape
    target_flat = int(round(h * w * c / compression_ratio))
    steps = num_steps
    if steps is None:
        # halve spatial until the per-position channel target is reasonable
        steps = 0
        th = h
        while th > 4 and th % 2 == 0 and steps < 4:
            th //= 2
            steps += 1
    if h % (1 << steps) or w % (1 << steps):
        raise ValueError(f"spatial {h}x{w} not divisible by 2^{steps}")
    gh, gw = h >> steps, w >> steps
    out_channels = max(1, target_flat // (gh * gw))
    schedule = []
    ch = c
    for i in range(steps):
        ch = out_channels if i == steps - 1 else min(out_channels, ch * 4)
        schedule.append(ch)
    return steps, schedule, out_channels * gh * gw


class DownsampleSequence(nn.Module):
    """Auto-planned encoder stack; returns a flat (B, out_size) embedding."""

    in_shape: Tuple[int, int, int]  # (H, W, C)
    compression_ratio: float
    num_steps: Optional[int] = None
    with_attention: bool = False
    attention_heads: int = 2
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, x: Array, train: bool = True) -> Array:
        steps, schedule, out_size = plan_downsample(
            self.in_shape, self.compression_ratio, self.num_steps
        )
        self.sow("intermediates", "out_size", jnp.int32(out_size))
        c = self.in_shape[2]
        for i, ch in enumerate(schedule):
            x = DownBlock(
                c, ch, with_relu=i < steps - 1, dtype=self.dtype, name=f"down{i}"
            )(x, train)
            if self.with_attention:
                x = SelfAttention2D(
                    ch, num_heads=min(self.attention_heads, ch),
                    dtype=self.dtype, name=f"attn{i}",
                )(x)
            c = ch
        return x.reshape(x.shape[0], -1)

    @property
    def out_size(self) -> int:
        return plan_downsample(self.in_shape, self.compression_ratio, self.num_steps)[2]


def plan_upsample(
    in_size: int, out_shape: Tuple[int, int, int], num_steps: Optional[int]
) -> Tuple[int, int, list]:
    """-> (steps, in_channels, channel schedule). out_shape = (H, W, C)."""
    h, w, c = out_shape
    max_steps = 0
    th = h
    while th > 1 and th % 2 == 0:
        th //= 2
        max_steps += 1
    # the largest square grid (fewest steps) whose size divides in_size
    candidates = range(num_steps, num_steps + 1) if num_steps else range(0, max_steps + 1)
    for steps in candidates:
        gh, gw = h >> steps, w >> steps
        if gh and gw and h % (1 << steps) == 0 and in_size % (gh * gw) == 0:
            in_channels = in_size // (gh * gw)
            schedule = [
                c if i == steps - 1 else max(c, in_channels // (4 ** (i + 1)))
                for i in range(steps)
            ]
            return steps, in_channels, schedule
    raise ValueError(
        f"in_size {in_size} admits no square grid dividing output {h}x{w}"
    )


class UpsampleSequence(nn.Module):
    """Auto-planned decoder stack; flat (B, in_size) -> (B, H, W, C) in [0,1]."""

    in_size: int
    out_shape: Tuple[int, int, int]  # (H, W, C)
    num_steps: Optional[int] = None
    dtype: Optional[Any] = None

    @nn.compact
    def __call__(self, z: Array, train: bool = True) -> Array:
        steps, in_channels, schedule = plan_upsample(
            self.in_size, self.out_shape, self.num_steps
        )
        h, w, c_out = self.out_shape
        gh, gw = h >> steps, w >> steps
        x = z.reshape(z.shape[0], gh, gw, in_channels)
        c = in_channels
        for i, ch in enumerate(schedule):
            x = UpBlock(
                c, ch, with_relu=i < steps - 1, with_bn=i < steps - 1,
                dtype=self.dtype, name=f"up{i}",
            )(x, train)
            c = ch
        if steps == 0 or c != c_out:
            x = torch_conv(c_out, c, 3, 1, 1, dtype=self.dtype, name="proj")(x)
        return nn.sigmoid(x.astype(jnp.float32))
