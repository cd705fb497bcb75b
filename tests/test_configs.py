"""BASELINE.json config matrix: shape-soundness via abstract evaluation.

Configs 3 (multispectral 128px, wider channels) and similar larger variants
are validated with ``jax.eval_shape`` — no FLOPs, just the shape algebra —
so CI covers the big configs cheaply.
"""

import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.config import CondSRVAEConfig, VAEConfig
from simple_vae_rs_tpu.models import VAE, CondSRVAE, SRVAE


def _abstract_init_out(model, *args):
    return jax.eval_shape(
        lambda: model.init_with_output(
            {"params": jax.random.PRNGKey(0)}, *args, train=False
        )[0]
    )


def test_multispectral_128px_cond_srvae():
    """BASELINE config 3: 4-band SR-VAE at 128px crops (wide channels)."""
    cfg = CondSRVAEConfig(cr=1.2, patch_size=128)
    assert cfg.latent_size == 54528  # int(128*128*4/1.2)//256*256
    assert cfg.z_channels == 852  # genuinely wide head
    model = CondSRVAE(cfg)
    x = jnp.zeros((2, 128, 128, 4))
    y = jnp.zeros((2, 64, 64, 4))
    out = _abstract_init_out(model, x, y, jax.random.PRNGKey(1))
    assert out[0].shape == (2, 128, 128, 4)
    assert out[1].shape == (2, 64, 64, 4)
    assert out[2].shape == (2, cfg.z_dim)


def test_multispectral_8band_cond_srvae():
    """More spectral bands than the reference's 4 (channels is a config)."""
    cfg = CondSRVAEConfig(cr=1.5, patch_size=64, channels=8)
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 64, 64, 8))
    y = jnp.zeros((1, 32, 32, 8))
    out = _abstract_init_out(model, x, y, jax.random.PRNGKey(1))
    assert out[0].shape == (1, 64, 64, 8)


def test_hierarchical_srvae_128px():
    cfg = CondSRVAEConfig(cr=1.2, patch_size=128)
    model = SRVAE(cfg)
    x = jnp.zeros((1, 128, 128, 4))
    out = _abstract_init_out(model, x, jax.random.PRNGKey(1))
    assert out[0].shape == (1, 128, 128, 4)
    assert out[8].shape == (1, 64, 64, 4)  # internal LR view


def test_vae_large_patch():
    cfg = VAEConfig(cr=1.28, patch_size=64)
    model = VAE(cfg)
    out = _abstract_init_out(model, jnp.zeros((2, 64, 64, 4)), jax.random.PRNGKey(1))
    assert out[0].shape == (2, 64, 64, 4)
