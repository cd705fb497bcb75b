from simple_vae_rs_tpu.data.datasets import (
    FloodDataset,
    Sen2VenusDataset,
    SyntheticSRDataset,
)
from simple_vae_rs_tpu.data.loader import DeviceLoader, init_dataloader

__all__ = [
    "Sen2VenusDataset",
    "FloodDataset",
    "SyntheticSRDataset",
    "DeviceLoader",
    "init_dataloader",
]
