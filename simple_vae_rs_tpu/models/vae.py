"""Plain Gaussian VAE for single-image reconstruction.

Architecture parity with reference ``models/vae.py:24-107``:

- encoder: 2x DownBlock (4->16->64, spatial /4) + 4 conv3x3
  (64->64->128->128->2*latent_channels), channel-split into (mu, logvar)
- decoder: latent map (ps/4, ps/4, latent_channels) -> 2x UpBlock
  (->128->64) + 4 conv3x3 (->64->16->16->4) + sigmoid
- learnable scalar ``gamma`` (Gaussian decoder std), init 1.0
  (reference ``models/vae.py:34``; made a real parameter per SURVEY §2.2-7)

Differences by design (TPU-first, documented):

- NHWC layout; latent vectors flatten in HWC order (the reference flattens
  C-major; the orderings are isomorphic — the channel-split into mu/logvar
  is identical).
- ``latent_dim`` (= latent_channels * (ps/4)^2) is the true latent
  dimension, shape-sound at every config; the reference's ``latent_size``
  attribute only matches it at canonical configs (SURVEY §2.1).
- RNG is explicit: ``__call__`` takes a ``jax.random`` key.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simple_vae_rs_tpu.config import VAEConfig
from simple_vae_rs_tpu.ops.conv_blocks import (
    DownBlock,
    UpBlock,
    tail_chain,
    torch_conv,
)
from simple_vae_rs_tpu.ops.reshape import flatten_map, unflatten_map

Array = jnp.ndarray


def reparameterize(rng: jax.Array, mu: Array, logvar: Array) -> Array:
    """z = mu + eps * exp(0.5*logvar) (reference ``models/vae.py:94-98``)."""
    std = jnp.exp(0.5 * logvar)
    eps = jax.random.normal(rng, mu.shape, dtype=mu.dtype)
    return mu + eps * std


class VAE(nn.Module):
    """Gaussian VAE; ``__call__`` returns ``(x_hat, mu, logvar)``."""

    config: VAEConfig
    dtype: Optional[Any] = None

    def setup(self):
        cfg = self.config
        lc = cfg.latent_channels
        if lc < 1:
            raise ValueError(
                f"latent_channels < 1 for patch_size={cfg.patch_size}, cr={cfg.cr}"
            )
        dt = self.dtype
        self.gamma = self.param("gamma", nn.initializers.ones, ())

        self.enc_down1 = DownBlock(cfg.channels, 16, dtype=dt)
        self.enc_down2 = DownBlock(16, 64, dtype=dt)
        self.enc_conv1 = torch_conv(64, 64, dtype=dt)
        self.enc_conv2 = torch_conv(128, 64, dtype=dt)
        self.enc_conv3 = torch_conv(128, 128, dtype=dt)
        self.enc_head = torch_conv(2 * lc, 128, dtype=dt)

        self.dec_up1 = UpBlock(lc, 128, dtype=dt)
        self.dec_up2 = UpBlock(128, 64, dtype=dt)
        self.dec_conv1 = torch_conv(64, 64, dtype=dt)
        self.dec_conv2 = torch_conv(16, 64, dtype=dt)
        self.dec_conv3 = torch_conv(16, 16, dtype=dt)
        self.dec_conv4 = torch_conv(cfg.channels, 16, dtype=dt)

    # ---------------------------------------------------------------- encode
    def encode(self, x: Array, train: bool = True) -> Tuple[Array, Array]:
        """x (B, ps, ps, C) -> flattened (mu, logvar), each (B, latent_dim)."""
        h = self.enc_down1(x, train)
        h = self.enc_down2(h, train)
        chained = tail_chain(
            self, h, ("enc_conv1", "enc_conv2", "enc_conv3", "enc_head"), train
        )
        if chained is None:
            h = self.enc_conv1(h)
            h = self.enc_conv2(h)
            h = self.enc_conv3(h)
            h = self.enc_head(h)
        else:
            h = chained
        lc = self.config.latent_channels
        mu_map, logvar_map = h[..., :lc], h[..., lc:]
        return (
            flatten_map(mu_map).astype(jnp.float32),
            flatten_map(logvar_map).astype(jnp.float32),
        )

    # ---------------------------------------------------------------- decode
    def decode(self, z: Array, train: bool = True) -> Array:
        """z (B, latent_dim) -> reconstruction (B, ps, ps, C) in [0, 1]."""
        cfg = self.config
        h = unflatten_map(z, cfg.latent_spatial, cfg.latent_spatial, cfg.latent_channels)
        h = h.astype(self.dtype or h.dtype)
        h = self.dec_up1(h, train)
        h = self.dec_up2(h, train)
        chained = tail_chain(
            self, h, ("dec_conv1", "dec_conv2", "dec_conv3", "dec_conv4"), train
        )
        if chained is None:
            h = self.dec_conv1(h)
            h = self.dec_conv2(h)
            h = self.dec_conv3(h)
            h = self.dec_conv4(h)
        else:
            h = chained
        return nn.sigmoid(h.astype(jnp.float32))

    def __call__(
        self, x: Array, rng: jax.Array, train: bool = True
    ) -> Tuple[Array, Array, Array]:
        mu, logvar = self.encode(x, train)
        z = reparameterize(rng, mu, logvar)
        return self.decode(z, train), mu, logvar

    # ---------------------------------------------------------------- sample
    def sample(self, y: Array, rng: jax.Array, samples: int) -> Array:
        """N posterior draws from q(z|y), decoded (reference ``vae.py:240-252``).

        Returns (samples, ps, ps, C). Uses eval-mode batch stats.
        """
        mu, logvar = self.encode(y, train=False)
        eps = jax.random.normal(
            rng, (samples, self.config.latent_dim), dtype=jnp.float32
        )
        z = mu + jnp.exp(0.5 * logvar) * eps
        return self.decode(z, train=False)
