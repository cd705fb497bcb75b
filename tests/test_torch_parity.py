"""End-to-end functional parity: converted weights reproduce torch outputs.

The decisive conversion/architecture check: a random reference-layout
``state_dict`` is (a) run through an independent torch-functional
re-derivation of the reference VAE graph (conv3x3 -> strided conv4x4 -> BN
-> ReLU blocks, reference ``models/layers.py:217-297`` +
``models/vae.py:36-85``), and (b) converted with ``utils/convert`` and run
through this framework's ``VAE``. Encoder statistics and decoder outputs
must match elementwise (up to the documented HWC-vs-CHW latent ordering,
which these tests align explicitly).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from simple_vae_rs_tpu.config import VAEConfig  # noqa: E402
from simple_vae_rs_tpu.models import VAE  # noqa: E402
from simple_vae_rs_tpu.utils import convert as cv  # noqa: E402
from tests.test_convert import _synthesize_state_dict  # noqa: E402


def _t(sd, key):
    return torch.tensor(sd[key])


def t_conv(x, sd, p, stride=1, padding=1):
    return F.conv2d(x, _t(sd, p + ".weight"), _t(sd, p + ".bias"), stride, padding)


def t_convT(x, sd, p):
    return F.conv_transpose2d(
        x, _t(sd, p + ".weight"), _t(sd, p + ".bias"), stride=2, padding=1
    )


def t_bn(x, sd, p):
    return F.batch_norm(
        x,
        _t(sd, p + ".running_mean"),
        _t(sd, p + ".running_var"),
        _t(sd, p + ".weight"),
        _t(sd, p + ".bias"),
        training=False,
        eps=1e-5,
    )


def t_down_block(x, sd, p):
    x = t_conv(x, sd, p + ".conv")
    x = t_conv(x, sd, p + ".downsample", stride=2, padding=1)
    return F.relu(t_bn(x, sd, p + ".bn"))


def t_up_block(x, sd, p):
    x = t_conv(x, sd, p + ".conv")
    x = t_convT(x, sd, p + ".upsample")
    return F.relu(t_bn(x, sd, p + ".bn"))


def t_vae_encode_maps(x, sd):
    """Reference VAE encoder up to the channel-split (NCHW maps)."""
    h = t_down_block(x, sd, "encoder.0")
    h = t_down_block(h, sd, "encoder.1")
    h = t_conv(h, sd, "encoder.2")
    h = t_conv(h, sd, "encoder.3")
    h = t_conv(h, sd, "encoder.4")
    h = t_conv(h, sd, "encoder.5")
    c = h.shape[1] // 2
    return h[:, :c], h[:, c:]


def t_vae_decode(zmap, sd):
    """Reference VAE decoder from the latent map (NCHW)."""
    h = t_up_block(zmap, sd, "decoder.1")
    h = t_up_block(h, sd, "decoder.2")
    h = t_conv(h, sd, "decoder.3")
    h = t_conv(h, sd, "decoder.4")
    h = t_conv(h, sd, "decoder.5")
    h = t_conv(h, sd, "decoder.6")
    return torch.sigmoid(h)


@pytest.fixture(scope="module")
def converted_setup():
    cfg = VAEConfig(cr=2.0, patch_size=16)
    model = VAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    sd = _synthesize_state_dict(cv._VAE_ENCODER + cv._VAE_DECODER, variables)
    # tame the random BN running stats (variance must be positive)
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
        if k.endswith("running_mean"):
            sd[k] = sd[k] * 0.1
    converted = cv.convert_vae_state_dict(sd)
    ours = {"params": converted["params"], "batch_stats": converted["batch_stats"]}
    return cfg, model, ours, sd


def test_encoder_outputs_match_torch(converted_setup):
    cfg, model, ours, sd = converted_setup
    rng = np.random.default_rng(3)
    x = rng.random((2, 16, 16, 4)).astype(np.float32)

    mu_t, lv_t = t_vae_encode_maps(torch.tensor(x.transpose(0, 3, 1, 2)), sd)

    mu_j, lv_j = model.apply(ours, jnp.array(x), train=False, method=VAE.encode)
    s, c = cfg.latent_spatial, cfg.latent_channels
    mu_j_map = np.asarray(mu_j).reshape(2, s, s, c).transpose(0, 3, 1, 2)
    lv_j_map = np.asarray(lv_j).reshape(2, s, s, c).transpose(0, 3, 1, 2)

    np.testing.assert_allclose(mu_j_map, mu_t.detach().numpy(), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(lv_j_map, lv_t.detach().numpy(), rtol=2e-3, atol=2e-4)


def test_decoder_outputs_match_torch(converted_setup):
    cfg, model, ours, sd = converted_setup
    rng = np.random.default_rng(4)
    s, c = cfg.latent_spatial, cfg.latent_channels
    zmap = rng.standard_normal((2, c, s, s)).astype(np.float32)  # NCHW

    out_t = t_vae_decode(torch.tensor(zmap), sd).detach().numpy()

    z_ours = jnp.array(zmap.transpose(0, 2, 3, 1).reshape(2, -1))  # HWC-flat
    out_j = model.apply(ours, z_ours, train=False, method=VAE.decode)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=2e-3, atol=2e-4
    )


def test_full_autoencode_matches_torch(converted_setup):
    """Deterministic roundtrip (z = mu): full forward equivalence."""
    cfg, model, ours, sd = converted_setup
    rng = np.random.default_rng(5)
    x = rng.random((1, 16, 16, 4)).astype(np.float32)

    mu_t, _ = t_vae_encode_maps(torch.tensor(x.transpose(0, 3, 1, 2)), sd)
    out_t = t_vae_decode(mu_t, sd).detach().numpy()

    mu_j, _ = model.apply(ours, jnp.array(x), train=False, method=VAE.encode)
    out_j = model.apply(ours, mu_j, train=False, method=VAE.decode)
    np.testing.assert_allclose(
        np.asarray(out_j).transpose(0, 3, 1, 2), out_t, rtol=2e-3, atol=2e-4
    )
