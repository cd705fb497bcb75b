"""TPU-native JAX framework for satellite-image super-resolution VAEs.

A from-scratch rebuild of the capabilities of ``Etienne-bdt/Simple-VAE-RS``
(plain Gaussian VAE + conditional super-resolution VAE on 4-band satellite
imagery, see reference ``README.md:1-15``), designed TPU-first:

- NHWC Flax models compiled by XLA onto the MXU (``models/``)
- fused Gaussian-NLL + KL ELBO Pallas kernel (``ops/pallas_elbo.py``)
- on-device grid patchification and normalization (``ops/patchify.py``)
- ``jit`` train step sharded over a ``jax.sharding.Mesh`` (``parallel/``)
- functional training engine with callbacks, plateau LR schedule and
  orbax checkpoints (``train/``)
"""

from simple_vae_rs_tpu.config import (
    CondSRVAEConfig,
    MeshConfig,
    TrainConfig,
    VAEConfig,
)

__version__ = "0.1.0"

__all__ = [
    "VAEConfig",
    "CondSRVAEConfig",
    "MeshConfig",
    "TrainConfig",
]
