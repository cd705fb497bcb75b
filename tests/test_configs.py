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


def test_latent_budget_override_128px():
    """Fixed latent budget (--latent_size): a 128px config with the
    canonical 64px budget keeps the canonical latent-head widths (the cr
    formula alone would 4x them into a ~600M-param graph)."""
    import pytest

    canonical = CondSRVAEConfig(cr=1.2, patch_size=64)
    cfg = CondSRVAEConfig(cr=1.2, patch_size=128,
                          latent_size_override=canonical.latent_size)
    assert cfg.latent_size == 13568
    assert cfg.z_channels == canonical.z_channels == 212
    assert cfg.u_channels == canonical.u_channels
    model = CondSRVAE(cfg)
    out = _abstract_init_out(
        model, jnp.zeros((1, 128, 128, 4)), jnp.zeros((1, 64, 64, 4)),
        jax.random.PRNGKey(1),
    )
    assert out[0].shape == (1, 128, 128, 4)
    assert out[2].shape == (1, cfg.z_dim)

    with pytest.raises(ValueError):
        CondSRVAEConfig(latent_size_override=300)  # not a multiple of 256
    with pytest.raises(ValueError):
        VAEConfig(latent_size_override=100)  # not a multiple of 64


def test_latent_budget_override_runs_concretely():
    """Tiny overridden config initializes and decodes for real (not just
    abstractly): override 256 at ps=16 -> z 4ch on a 2x2 grid."""
    cfg = CondSRVAEConfig(cr=1.2, patch_size=16, latent_size_override=256)
    assert cfg.z_channels == 4 and cfg.u_channels == 1
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    y = jnp.zeros((1, 8, 8, 4))
    out, _ = model.init_with_output(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1),
        train=False,
    )
    assert out[0].shape == (1, 16, 16, 4)
    assert bool(jnp.isfinite(out[0]).all())


def test_vae_latent_budget_override():
    cfg = VAEConfig(cr=1.5, patch_size=64, latent_size_override=1024)
    assert cfg.latent_size == 1024 and cfg.latent_channels == 16
    model = VAE(cfg)
    out = _abstract_init_out(model, jnp.zeros((1, 64, 64, 4)),
                             jax.random.PRNGKey(1))
    assert out[0].shape == (1, 64, 64, 4)
