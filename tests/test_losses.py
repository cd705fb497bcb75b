"""Golden-value tests for the ELBO terms.

The loss formulas are the parity anchor (SURVEY.md §7 step 1): they are
checked against an independent numpy re-derivation of the reference formulas
(reference ``loss/vae_loss.py:5-13``, ``loss/cond_vae_loss.py:39-58``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.ops.losses import (
    base_loss,
    cond_loss,
    gaussian_nll,
    kl_gaussian_gaussian,
    kl_standard_normal,
)


@pytest.fixture
def rng():
    return np.random.default_rng(42)


def np_gaussian_nll(recon, target, gamma):
    d = recon.size
    return d * (np.mean((recon - target) ** 2) / (2 * gamma**2) + np.log(gamma))


def np_kl_standard(mu, logvar):
    return 0.5 * np.mean(np.sum(mu**2 + np.exp(logvar) - 1 - logvar, axis=1))


def np_kl_general(mu2, lv2, mu3, lv3):
    t = (
        np.sum(lv3 - lv2 - 1, axis=1)
        + np.sum(np.exp(lv2 - lv3), axis=1)
        + np.sum((mu2 - mu3) ** 2 * np.exp(-lv3), axis=1)
    )
    return 0.5 * np.mean(t)


def test_gaussian_nll_matches_reference_formula(rng):
    recon = rng.random((3, 8, 8, 4)).astype(np.float32)
    target = rng.random((3, 8, 8, 4)).astype(np.float32)
    for gamma in (0.5, 1.0, 2.0):
        got = gaussian_nll(jnp.array(recon), jnp.array(target), jnp.float32(gamma))
        want = np_gaussian_nll(recon.astype(np.float64), target.astype(np.float64), gamma)
        np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_gaussian_nll_scales_with_batch(rng):
    """d includes the batch size — the loss doubles when the batch doubles."""
    recon = rng.random((2, 4, 4, 4)).astype(np.float32)
    target = rng.random((2, 4, 4, 4)).astype(np.float32)
    one = gaussian_nll(jnp.array(recon), jnp.array(target), jnp.float32(1.0))
    two = gaussian_nll(
        jnp.concatenate([jnp.array(recon)] * 2),
        jnp.concatenate([jnp.array(target)] * 2),
        jnp.float32(1.0),
    )
    np.testing.assert_allclose(float(two), 2 * float(one), rtol=1e-5)


def test_kl_standard_normal_golden(rng):
    mu = rng.standard_normal((5, 16)).astype(np.float32)
    logvar = rng.standard_normal((5, 16)).astype(np.float32)
    got = kl_standard_normal(jnp.array(mu), jnp.array(logvar))
    want = np_kl_standard(mu.astype(np.float64), logvar.astype(np.float64))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_kl_standard_normal_zero_at_prior():
    mu = jnp.zeros((3, 7))
    logvar = jnp.zeros((3, 7))
    assert float(kl_standard_normal(mu, logvar)) == pytest.approx(0.0, abs=1e-7)


def test_kl_general_golden(rng):
    mu2 = rng.standard_normal((4, 32)).astype(np.float32)
    lv2 = rng.standard_normal((4, 32)).astype(np.float32)
    mu3 = rng.standard_normal((4, 32)).astype(np.float32)
    lv3 = rng.standard_normal((4, 32)).astype(np.float32)
    got = kl_gaussian_gaussian(*(jnp.array(a) for a in (mu2, lv2, mu3, lv3)))
    want = np_kl_general(*(a.astype(np.float64) for a in (mu2, lv2, mu3, lv3)))
    np.testing.assert_allclose(float(got), want, rtol=1e-5)


def test_kl_general_zero_when_equal(rng):
    mu = rng.standard_normal((4, 8)).astype(np.float32)
    lv = rng.standard_normal((4, 8)).astype(np.float32)
    got = kl_gaussian_gaussian(jnp.array(mu), jnp.array(lv), jnp.array(mu), jnp.array(lv))
    assert float(got) == pytest.approx(0.0, abs=1e-5)


def test_base_loss_terms(rng):
    recon = rng.random((2, 8, 8, 4)).astype(np.float32)
    x = rng.random((2, 8, 8, 4)).astype(np.float32)
    mu = rng.standard_normal((2, 10)).astype(np.float32)
    lv = rng.standard_normal((2, 10)).astype(np.float32)
    mse, kld = base_loss(
        jnp.array(recon), jnp.array(x), jnp.array(mu), jnp.array(lv), jnp.float32(1.3)
    )
    np.testing.assert_allclose(
        float(mse), np_gaussian_nll(recon.astype(np.float64), x.astype(np.float64), 1.3),
        rtol=1e-5,
    )
    np.testing.assert_allclose(
        float(kld), np_kl_standard(mu.astype(np.float64), lv.astype(np.float64)),
        rtol=1e-5,
    )


def test_cond_loss_terms(rng):
    rx = rng.random((2, 16, 16, 4)).astype(np.float32)
    x = rng.random((2, 16, 16, 4)).astype(np.float32)
    ry = rng.random((2, 8, 8, 4)).astype(np.float32)
    y = rng.random((2, 8, 8, 4)).astype(np.float32)
    mu_u = rng.standard_normal((2, 12)).astype(np.float32)
    lv_u = rng.standard_normal((2, 12)).astype(np.float32)
    mu_z = rng.standard_normal((2, 48)).astype(np.float32)
    lv_z = rng.standard_normal((2, 48)).astype(np.float32)
    mu_p = rng.standard_normal((2, 48)).astype(np.float32)
    lv_p = rng.standard_normal((2, 48)).astype(np.float32)
    gx, gy = 0.9, 1.1

    mse_x, kld_u, mse_y, kld_z = cond_loss(
        jnp.array(rx), jnp.array(x), jnp.array(ry), jnp.array(y),
        jnp.array(mu_u), jnp.array(lv_u), jnp.array(mu_z), jnp.array(lv_z),
        jnp.array(mu_p), jnp.array(lv_p), jnp.float32(gx), jnp.float32(gy),
    )
    f64 = np.float64
    np.testing.assert_allclose(
        float(mse_x), np_gaussian_nll(rx.astype(f64), x.astype(f64), gx), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(mse_y), np_gaussian_nll(ry.astype(f64), y.astype(f64), gy), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(kld_u), np_kl_standard(mu_u.astype(f64), lv_u.astype(f64)), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(kld_z),
        np_kl_general(mu_z.astype(f64), lv_z.astype(f64), mu_p.astype(f64), lv_p.astype(f64)),
        rtol=1e-5,
    )


def test_loss_matches_torch_reference_formula(rng):
    """Cross-check against the exact torch ops the reference uses."""
    torch = pytest.importorskip("torch")
    recon = rng.random((3, 4, 8, 8)).astype(np.float32)
    x = rng.random((3, 4, 8, 8)).astype(np.float32)
    mu = rng.standard_normal((3, 20)).astype(np.float32)
    lv = rng.standard_normal((3, 20)).astype(np.float32)
    gamma = 1.7

    tr, tx = torch.tensor(recon), torch.tensor(x)
    tg = torch.tensor(gamma)
    d = tr.shape[0] * tr.shape[1] * tr.shape[2] * tr.shape[3]
    t_mse = d * (
        torch.nn.functional.mse_loss(tr, tx, reduction="mean") / (2 * tg.pow(2))
        + tg.log()
    )
    tmu, tlv = torch.tensor(mu), torch.tensor(lv)
    t_kld = 0.5 * torch.sum(tmu.pow(2) + tlv.exp() - 1 - tlv, dim=1).mean()

    j_mse, j_kld = base_loss(
        jnp.array(recon), jnp.array(x), jnp.array(mu), jnp.array(lv), jnp.float32(gamma)
    )
    np.testing.assert_allclose(float(j_mse), float(t_mse), rtol=1e-5)
    np.testing.assert_allclose(float(j_kld), float(t_kld), rtol=1e-5)
