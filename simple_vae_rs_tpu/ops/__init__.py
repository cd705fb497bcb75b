from simple_vae_rs_tpu.ops.attention import SelfAttention2D
from simple_vae_rs_tpu.ops.conv_blocks import DownBlock, Residual, UpBlock
from simple_vae_rs_tpu.ops.losses import base_loss, cond_loss
from simple_vae_rs_tpu.ops.metrics import psnr, ssim
from simple_vae_rs_tpu.ops.pallas_elbo import fused_base_loss, fused_cond_loss
from simple_vae_rs_tpu.ops.patchify import (
    grid_patchify,
    grid_sr_batch,
    grid_unpatchify,
    random_sr_crop_batch,
)
from simple_vae_rs_tpu.ops.quantize import (
    dequantize,
    quantize_params_tree,
    quantize_rtn,
    quantize_stochastic,
)
from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x
from simple_vae_rs_tpu.ops.sequences import DownsampleSequence, UpsampleSequence

__all__ = [
    "base_loss",
    "cond_loss",
    "fused_base_loss",
    "fused_cond_loss",
    "DownBlock",
    "UpBlock",
    "Residual",
    "SelfAttention2D",
    "DownsampleSequence",
    "UpsampleSequence",
    "ssim",
    "psnr",
    "bicubic_upsample_2x",
    "grid_patchify",
    "grid_unpatchify",
    "grid_sr_batch",
    "random_sr_crop_batch",
    "quantize_stochastic",
    "quantize_rtn",
    "quantize_params_tree",
    "dequantize",
]
