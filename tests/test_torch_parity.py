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


# --------------------------------------------------------- Cond_SRVAE parity
# Torch-functional re-derivation of the full reference Cond_SRVAE graph
# (reference ``models/cond_vae.py:27-286``), including the C-major
# Flatten/Unflatten reinterpretations of the conditional-prior path
# (``cond_vae.py:167-231``) — the part round 1 only converted approximately.
# With ``torch_regroup=True`` the converted model must match elementwise.

from simple_vae_rs_tpu.config import CondSRVAEConfig  # noqa: E402
from simple_vae_rs_tpu.models import CondSRVAE  # noqa: E402


def t_encoder_y_maps(y, sd):
    h = t_down_block(y, sd, "encoder_y.0")
    h = t_down_block(h, sd, "encoder_y.1")
    for i in (2, 3, 4, 5):
        h = t_conv(h, sd, f"encoder_y.{i}")
    c = h.shape[1] // 2
    return h[:, :c], h[:, c:]


def t_encoder_x_maps(x, sd):
    h = t_down_block(x, sd, "encoder_x.0")
    h = t_down_block(h, sd, "encoder_x.1")
    h = t_down_block(h, sd, "encoder_x.2")
    for i in (3, 4, 5, 6):
        h = t_conv(h, sd, f"encoder_x.{i}")
    c = h.shape[1] // 2
    return h[:, :c], h[:, c:]


def t_y_to_z_flat(y, sd):
    h = t_down_block(y, sd, "y_to_z.0")
    h = t_down_block(h, sd, "y_to_z.1")
    h = t_down_block(h, sd, "y_to_z.2")
    h = t_conv(h, sd, "y_to_z.3")
    h = t_conv(h, sd, "y_to_z.4")
    return h.flatten(1)


def t_z_cond_flat(y, u_flat, sd, cfg):
    """Reference z_cond: C-major unflattens + convs + flatten + clamp."""
    g = cfg.patch_size // 16
    ly16 = cfg.latent_size_y // 16
    lz16 = cfg.latent_size // 16
    y_flat = t_y_to_z_flat(y, sd)
    u = u_flat.view(-1, ly16, g, g)
    u = t_conv(u, sd, "u_to_z.1")
    u = t_conv(u, sd, "u_to_z.2")
    joint = torch.cat((y_flat, u.flatten(1)), dim=1).view(-1, 2 * lz16, g, g)
    mu = t_conv(t_conv(joint, sd, "mu_u_y_to_z.1"), sd, "mu_u_y_to_z.2")
    lv = t_conv(t_conv(joint, sd, "logvar_u_y_to_z.1"), sd, "logvar_u_y_to_z.2")
    return mu.flatten(1), torch.clamp(lv.flatten(1), -7.0, 7.0)


def t_decode_y(u_map, sd):
    h = t_up_block(u_map, sd, "decoder_y.1")
    h = t_up_block(h, sd, "decoder_y.2")
    for i in (3, 4, 5, 6):
        h = t_conv(h, sd, f"decoder_y.{i}")
    return torch.sigmoid(h)


def t_decode_x(z_flat, y, sd, cfg):
    g = cfg.patch_size // 8
    y_flat = t_y_to_z_flat(y, sd)
    stack = torch.cat((y_flat, z_flat), dim=1).view(
        -1, 2 * cfg.latent_size // 64, g, g
    )
    h = t_up_block(stack, sd, "decoder_x.1")
    h = t_up_block(h, sd, "decoder_x.2")
    h = t_up_block(h, sd, "decoder_x.3")
    for i in (4, 5, 6, 7):
        h = t_conv(h, sd, f"decoder_x.{i}")
    return torch.sigmoid(h)


def _nchw(a):
    return np.asarray(a).transpose(0, 3, 1, 2)


@pytest.fixture(scope="module")
def cond_converted_setup():
    from tests.test_convert import _synthesize_state_dict

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16, torch_regroup=True)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    sd = _synthesize_state_dict(cv._COND_MAP, variables)
    for k in list(sd):
        if k.endswith("running_var"):
            sd[k] = np.abs(sd[k]) + 0.5
        if k.endswith("running_mean"):
            sd[k] = sd[k] * 0.1
        # keep activations in a sane range through the deep stacks
        if k.endswith("weight"):
            sd[k] = sd[k] * 0.2
    converted = cv.convert_cond_state_dict(sd)
    ours = {"params": converted["params"], "batch_stats": converted["batch_stats"]}
    rng = np.random.default_rng(7)
    y = rng.random((2, 8, 8, 4)).astype(np.float32)
    x = rng.random((2, 16, 16, 4)).astype(np.float32)
    return cfg, model, ours, sd, y, x


def test_cond_encoders_match_torch(cond_converted_setup):
    cfg, model, ours, sd, y, x = cond_converted_setup
    mu_u_t, lv_u_t = t_encoder_y_maps(torch.tensor(_nchw(y)), sd)
    mu_z_t, lv_z_t = t_encoder_x_maps(torch.tensor(_nchw(x)), sd)
    mu_u, lv_u = model.apply(ours, jnp.array(y), False, method=CondSRVAE.encode_y)
    mu_z, lv_z = model.apply(ours, jnp.array(x), False, method=CondSRVAE.encode_x)
    for got, want in (
        (mu_u, mu_u_t), (lv_u, lv_u_t), (mu_z, mu_z_t), (lv_z, lv_z_t),
    ):
        np.testing.assert_allclose(
            _nchw(got), want.detach().numpy(), rtol=2e-3, atol=2e-4
        )


def test_cond_prior_heads_match_torch_exactly(cond_converted_setup):
    """The C-major prior path (u_to_z + mu/logvar heads): round 1's known
    gap. torch_regroup must make the converted prior elementwise-exact."""
    cfg, model, ours, sd, y, x = cond_converted_setup
    mu_u = model.apply(ours, jnp.array(y), False, method=CondSRVAE.encode_y)[0]

    # torch consumes u as the C-major flat vector
    u_flat_t = torch.tensor(_nchw(mu_u)).flatten(1)
    mu_t, lv_t = t_z_cond_flat(torch.tensor(_nchw(y)), u_flat_t, sd, cfg)

    def prior(m, yy, u):
        return m.z_cond(m.y_embedding(yy, False), u, False)

    mu_j, lv_j = model.apply(ours, jnp.array(y), mu_u, method=prior)
    # ours are z-grid maps; torch flats reinterpret C-major to the z grid
    zc, zs = cfg.z_channels, cfg.z_spatial
    np.testing.assert_allclose(
        _nchw(mu_j), mu_t.detach().numpy().reshape(-1, zc, zs, zs),
        rtol=2e-3, atol=2e-4,
    )
    np.testing.assert_allclose(
        _nchw(lv_j), lv_t.detach().numpy().reshape(-1, zc, zs, zs),
        rtol=2e-3, atol=2e-4,
    )


def test_cond_decoders_match_torch(cond_converted_setup):
    cfg, model, ours, sd, y, x = cond_converted_setup
    mu_u = model.apply(ours, jnp.array(y), False, method=CondSRVAE.encode_y)[0]
    mu_z = model.apply(ours, jnp.array(x), False, method=CondSRVAE.encode_x)[0]

    y_hat_t = t_decode_y(torch.tensor(_nchw(mu_u)), sd)
    z_flat_t = torch.tensor(_nchw(mu_z)).flatten(1)
    x_hat_t = t_decode_x(z_flat_t, torch.tensor(_nchw(y)), sd, cfg)

    y_hat = model.apply(
        ours, mu_u, method=lambda m, u: m.decode_y(u, False)
    )
    x_hat = model.apply(
        ours, mu_z, jnp.array(y), method=lambda m, z, yy: m.decode_x(z, yy, False)
    )
    np.testing.assert_allclose(
        _nchw(y_hat), y_hat_t.detach().numpy(), rtol=2e-3, atol=2e-4
    )
    np.testing.assert_allclose(
        _nchw(x_hat), x_hat_t.detach().numpy(), rtol=2e-3, atol=2e-4
    )
