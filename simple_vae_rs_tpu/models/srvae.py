"""Hierarchical (unconditional) srVAE: two latent levels per the paper.

Gatopoulos, Stol & Tomczak, "Super-resolution variational auto-encoders"
(arXiv:2006.05218 — the paper the reference adapts, reference
``README.md:5``) define a *generative model of single images* with a
two-level latent hierarchy: the LR view ``y`` is a deterministic
downscaling of ``x``, ``u`` models ``y``, and ``z`` models ``x``
conditioned on ``y``:

    p(x, y, u, z) = p(x | z, y) p(z | u, y) p(y | u) p(u)

The reference only ships the *conditional* variant (``Cond_SRVAE``, where
``y`` comes from the dataset). This module adds the hierarchical variant
from the paper (BASELINE.json config 4) by reusing the exact same six
sub-networks: ``y`` is computed inside the model as the 2x2 box
downsample of ``x``, so the ELBO gains the ``y`` reconstruction and both
KL levels with no new parameters beyond ``Cond_SRVAE``'s.

Unconditional sampling: ``u ~ N(0, I) -> y_hat = p(y|u) -> z ~ p(z|u,
y_hat) -> x_hat = p(x|z, y_hat)``.
"""

from __future__ import annotations

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models.cond_vae import CondSRVAE

Array = jnp.ndarray


def box_downsample_2x(x: Array) -> Array:
    """(B, H, W, C) -> (B, H/2, W/2, C), 2x2 mean — the deterministic
    downscaling ``y = d(x)`` of the srVAE paper."""
    b, h, w, c = x.shape
    return x.reshape(b, h // 2, 2, w // 2, 2, c).mean(axis=(2, 4))


class SRVAE(nn.Module):
    """Two-level hierarchical srVAE over single HR images."""

    config: CondSRVAEConfig
    dtype: Optional[Any] = None

    def setup(self):
        self.core = CondSRVAE(self.config, dtype=self.dtype, name="core")

    def __call__(
        self, x: Array, rng: jax.Array, train: bool = True
    ) -> Tuple[Array, ...]:
        """Returns the Cond_SRVAE 8-tuple with the internal ``y`` appended:
        ``(x_hat, y_hat, mu_z, lv_z, mu_u, lv_u, mu_z_uy, lv_z_uy, y)``."""
        y = box_downsample_2x(x)
        out = self.core(x, y, rng, train)
        return out + (y,)

    def conditional_generation(self, y: Array, rng: jax.Array) -> Array:
        """Single-draw 2x SR given an LR (or HR, downsampled first) image."""
        if y.shape[1] == self.config.patch_size:
            y = box_downsample_2x(y)
        return self.core.conditional_generation(y, rng)

    def conditional_generation_eps(
        self, y: Array, eps_u: Array, eps_z: Array
    ) -> Array:
        """Noise-injected SR (see ``CondSRVAE.conditional_generation_eps``)."""
        if y.shape[1] == self.config.patch_size:
            y = box_downsample_2x(y)
        return self.core.conditional_generation_eps(y, eps_u, eps_z)

    def generation_noise_shapes(self, y: Array) -> Tuple[Array, Array]:
        """Shape probe for ``conditional_generation_eps`` (eval_shape only)."""
        if y.shape[1] == self.config.patch_size:
            y = box_downsample_2x(y)
        return self.core.generation_noise_shapes(y)

    def sample(
        self, y: Array, rng: jax.Array, samples: int = 1000, chunk: int = 128
    ) -> Array:
        """Posterior-prior draws given an image (HR or LR).

        If given an HR image it is downsampled to the model's LR grid
        first; then identical to ``Cond_SRVAE.sample`` (chunked, HBM-safe).
        """
        if y.shape[1] == self.config.patch_size:
            y = box_downsample_2x(y)
        return self.core.sample(y, rng, samples, chunk)

    def generation(self, rng: jax.Array) -> Tuple[Array, Array]:
        """Unconditional: u ~ N(0,I) -> y_hat -> z ~ p(z|u, y_hat) -> x_hat."""
        return self.core.generation(rng)
