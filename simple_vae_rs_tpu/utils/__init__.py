from simple_vae_rs_tpu.utils.image import normalize_image
from simple_vae_rs_tpu.utils.logging import (
    JsonlLogger,
    Logger,
    NullLogger,
    make_logger,
)

__all__ = [
    "normalize_image",
    "Logger",
    "JsonlLogger",
    "NullLogger",
    "make_logger",
]
