"""Gaussian ELBO terms for the VAE family.

Reproduces, term by term, the loss formulas of the reference
(``loss/vae_loss.py:5-13`` and ``loss/cond_vae_loss.py:39-58``), including the
``d = B*C*H*W`` scaling of the Gaussian negative log-likelihood (so the loss
scales with batch size, as in the reference) and the learned scalar decoder
std ``gamma``.

All math is float32 regardless of the activations' dtype: these reductions
are tiny compared to the conv stacks, and f32 keeps the NaN-guard semantics
of the reference intact.

A Pallas-fused single-pass version of (NLL + KL) lives in
``ops/pallas_elbo.py``; this module is the always-available XLA reference
implementation and the numerical ground truth for its tests.
"""

from __future__ import annotations

from typing import Tuple

import jax.numpy as jnp

Array = jnp.ndarray


def gaussian_nll(recon: Array, target: Array, gamma: Array) -> Array:
    """``d * (MSE_mean / (2*gamma^2) + log(gamma))`` with d = total elements.

    Matches reference ``loss/vae_loss.py:8-11``: the mean squared error over
    all elements, scaled back by the element count (including batch).
    """
    recon = recon.astype(jnp.float32)
    target = target.astype(jnp.float32)
    gamma = gamma.astype(jnp.float32)
    d = recon.size
    mse_mean = jnp.mean((recon - target) ** 2)
    return d * (mse_mean / (2.0 * gamma**2) + jnp.log(gamma))


def kl_standard_normal(mu: Array, logvar: Array) -> Array:
    """KL(q(z|x) || N(0, I)): ``0.5 * mean_b sum_d(mu^2 + e^lv - 1 - lv)``.

    Matches reference ``loss/vae_loss.py:12``. ``mu``/``logvar`` are
    ``(batch, latent_dim)``.
    """
    mu = mu.astype(jnp.float32)
    logvar = logvar.astype(jnp.float32)
    kl = 0.5 * jnp.sum(mu**2 + jnp.exp(logvar) - 1.0 - logvar, axis=1)
    return jnp.mean(kl)


def kl_gaussian_gaussian(
    mu_q: Array, logvar_q: Array, mu_p: Array, logvar_p: Array
) -> Array:
    """KL(q || p) between diagonal Gaussians, reference formula.

    ``0.5 * mean_b [ sum(lv_p - lv_q - 1) + sum(e^{lv_q - lv_p})
    + sum((mu_q - mu_p)^2 * e^{-lv_p}) ]``
    (reference ``loss/cond_vae_loss.py:50-57`` with q=2 (z|x) and p=3 (z|u,y)).
    """
    mu_q = mu_q.astype(jnp.float32)
    logvar_q = logvar_q.astype(jnp.float32)
    mu_p = mu_p.astype(jnp.float32)
    logvar_p = logvar_p.astype(jnp.float32)
    term = (
        jnp.sum(logvar_p - logvar_q - 1.0, axis=1)
        + jnp.sum(jnp.exp(logvar_q - logvar_p), axis=1)
        + jnp.sum((mu_q - mu_p) ** 2 * jnp.exp(-logvar_p), axis=1)
    )
    return 0.5 * jnp.mean(term)


def base_loss(
    recon_x: Array, x: Array, mu: Array, logvar: Array, gamma: Array
) -> Tuple[Array, Array]:
    """Plain-VAE loss terms ``(mse, kld)`` (reference ``loss/vae_loss.py:5``)."""
    return gaussian_nll(recon_x, x, gamma), kl_standard_normal(mu, logvar)


def cond_loss(
    recon_x: Array,
    x: Array,
    recon_y: Array,
    y: Array,
    mu_u: Array,
    logvar_u: Array,
    mu_z: Array,
    logvar_z: Array,
    mu_z_uy: Array,
    logvar_z_uy: Array,
    gammax: Array,
    gammay: Array,
) -> Tuple[Array, Array, Array, Array]:
    """Cond_SRVAE loss terms ``(mse_x, kld_u, mse_y, kld_z)``.

    Matches reference ``loss/cond_vae_loss.py:5-58``: HR/LR Gaussian NLLs with
    learned ``gammax``/``gammay`` plus KL(q(u|y)||N(0,I)) and the general
    Gaussian KL between q(z|x) and the conditional prior p(z|u,y).
    """
    mse_x = gaussian_nll(recon_x, x, gammax)
    mse_y = gaussian_nll(recon_y, y, gammay)
    kld_u = kl_standard_normal(mu_u, logvar_u)
    kld_z = kl_gaussian_gaussian(mu_z, logvar_z, mu_z_uy, logvar_z_uy)
    return mse_x, kld_u, mse_y, kld_z
