from simple_vae_rs_tpu.models.cond_vae import CondSRVAE
from simple_vae_rs_tpu.models.srvae import SRVAE
from simple_vae_rs_tpu.models.vae import VAE

__all__ = ["VAE", "CondSRVAE", "SRVAE"]
