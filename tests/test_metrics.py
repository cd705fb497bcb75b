"""Metric parity: SSIM vs skimage semantics, bicubic vs torch, PSNR."""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.ops.metrics import psnr, ssim
from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x
from simple_vae_rs_tpu.utils.image import normalize_image


def _np_ssim_single_channel(a, b, win=11, data_range=1.0):
    """Independent numpy re-derivation of skimage structural_similarity
    (uniform windows, sample covariance, mean over the cropped map)."""
    from numpy.lib.stride_tricks import sliding_window_view

    k1, k2 = 0.01, 0.03
    c1, c2 = (k1 * data_range) ** 2, (k2 * data_range) ** 2
    npx = win * win
    cov_norm = npx / (npx - 1)
    wa = sliding_window_view(a, (win, win)).reshape(*a.shape[0] - win + 1 and (a.shape[0] - win + 1, a.shape[1] - win + 1), win * win)
    wb = sliding_window_view(b, (win, win)).reshape(a.shape[0] - win + 1, a.shape[1] - win + 1, win * win)
    ua, ub = wa.mean(-1), wb.mean(-1)
    va = cov_norm * (wa.var(-1))
    vb = cov_norm * (wb.var(-1))
    vab = cov_norm * ((wa * wb).mean(-1) - ua * ub)
    s = ((2 * ua * ub + c1) * (2 * vab + c2)) / ((ua**2 + ub**2 + c1) * (va + vb + c2))
    return s.mean()


def test_ssim_matches_windowed_formula():
    rng = np.random.default_rng(0)
    a = rng.random((1, 24, 24, 2)).astype(np.float64)
    b = np.clip(a + 0.1 * rng.standard_normal(a.shape), 0, 1)
    got = float(ssim(jnp.array(a), jnp.array(b))[0])
    want = np.mean(
        [_np_ssim_single_channel(a[0, :, :, c], b[0, :, :, c]) for c in range(2)]
    )
    np.testing.assert_allclose(got, want, rtol=1e-4)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(1)
    a = rng.random((2, 16, 16, 4)).astype(np.float32)
    vals = np.asarray(ssim(jnp.array(a), jnp.array(a)))
    np.testing.assert_allclose(vals, 1.0, atol=1e-4)


def test_ssim_matches_skimage_if_available():
    skimage = pytest.importorskip("skimage")
    from skimage.metrics import structural_similarity

    rng = np.random.default_rng(2)
    a = rng.random((20, 20, 4)).astype(np.float64)
    b = np.clip(a + 0.05 * rng.standard_normal(a.shape), 0, 1)
    want = structural_similarity(
        a.transpose(2, 0, 1), b.transpose(2, 0, 1),
        win_size=11, data_range=1.0, channel_axis=0,
    )
    got = float(ssim(jnp.array(a[None]), jnp.array(b[None]))[0])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_psnr_known_value():
    a = np.zeros((1, 8, 8, 1), np.float32)
    b = np.full((1, 8, 8, 1), 0.1, np.float32)
    got = float(psnr(jnp.array(a), jnp.array(b))[0])
    np.testing.assert_allclose(got, 20.0, rtol=1e-4)  # 10*log10(1/0.01)


def test_bicubic_matches_torch():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    x = rng.random((2, 9, 7, 4)).astype(np.float32)
    want = (
        torch.nn.functional.interpolate(
            torch.tensor(x.transpose(0, 3, 1, 2)), scale_factor=2, mode="bicubic"
        )
        .numpy()
        .transpose(0, 2, 3, 1)
    )
    got = np.asarray(bicubic_upsample_2x(jnp.array(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_normalize_image_parity():
    rng = np.random.default_rng(4)
    img = (rng.random((12, 12, 4)) * 1000).astype(np.float32)
    out = np.asarray(normalize_image(jnp.array(img)))
    for c in range(4):
        ch = img[..., c]
        want = (ch - ch.min()) / (ch.max() - ch.min() + 1e-5)
        np.testing.assert_allclose(out[..., c], want, rtol=1e-5)
    batched = np.asarray(normalize_image(jnp.array(img[None])))
    np.testing.assert_allclose(batched[0], out, rtol=1e-6)
    with pytest.raises(ValueError):
        normalize_image(jnp.zeros((4, 4)))
