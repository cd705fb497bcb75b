from simple_vae_rs_tpu.ops.losses import base_loss, cond_loss
from simple_vae_rs_tpu.ops.conv_blocks import DownBlock, UpBlock
from simple_vae_rs_tpu.ops.attention import SelfAttention2D

__all__ = [
    "base_loss",
    "cond_loss",
    "DownBlock",
    "UpBlock",
    "SelfAttention2D",
]
