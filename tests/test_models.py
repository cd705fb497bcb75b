"""Model-level parity tests: shapes, parameter counts, loss finiteness.

The reference's own model test asserts wrong shapes and fails (SURVEY.md
§2.2-1); these tests assert the *actual* dims implied by the graph, plus the
exact parameter counts verified by executing the reference
(805,562 / 48,953,912 — reference ``models/vae.py:87``,
``models/cond_vae.py:233-235``).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig, VAEConfig
from simple_vae_rs_tpu.models import VAE, CondSRVAE
from simple_vae_rs_tpu.ops.losses import base_loss, cond_loss


def n_params(params, exclude=("gamma",)):
    total = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(params):
        name = jax.tree_util.keystr(path)
        if any(e in name for e in exclude):
            continue
        total += int(np.prod(leaf.shape))
    return total


@pytest.fixture(scope="module")
def small_vae():
    cfg = VAEConfig(cr=2.0, patch_size=16)
    model = VAE(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1), train=False
    )
    return cfg, model, variables


@pytest.fixture(scope="module")
def small_cond():
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    x = jnp.zeros((2, 16, 16, 4))
    y = jnp.zeros((2, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1), train=False
    )
    return cfg, model, variables


def test_vae_forward_shapes_and_loss(small_vae):
    cfg, model, variables = small_vae
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 4))
    (x_hat, mu, logvar), _ = model.apply(
        variables, x, jax.random.PRNGKey(3), train=True, mutable=["batch_stats"]
    )
    assert x_hat.shape == x.shape
    assert mu.shape == (2, cfg.latent_dim)
    assert logvar.shape == (2, cfg.latent_dim)
    assert float(jnp.min(x_hat)) >= 0.0 and float(jnp.max(x_hat)) <= 1.0
    mse, kld = base_loss(x_hat, x, mu, logvar, variables["params"]["gamma"])
    assert np.isfinite(float(mse)) and np.isfinite(float(kld))


def test_vae_param_count_canonical():
    cfg = VAEConfig(cr=1.5, patch_size=32)
    model = VAE(cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 32, 32, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    assert n_params(v["params"]) == 805_562  # reference models/vae.py:87
    assert cfg.latent_size == 2720  # reference attribute
    assert cfg.latent_dim == 2688  # actual latent dim (SURVEY §2.1)


def test_vae_encode_decode_roundtrip_shapes(small_vae):
    cfg, model, variables = small_vae
    x = jnp.zeros((3, 16, 16, 4))
    mu, logvar = model.apply(variables, x, train=False, method=VAE.encode)
    assert mu.shape == (3, cfg.latent_dim)
    recon = model.apply(variables, mu, train=False, method=VAE.decode)
    assert recon.shape == (3, 16, 16, 4)


def test_vae_sample(small_vae):
    cfg, model, variables = small_vae
    y = jnp.zeros((1, 16, 16, 4))
    out = model.apply(
        variables, y, jax.random.PRNGKey(0), 5, method=VAE.sample
    )
    assert out.shape == (5, 16, 16, 4)


def test_cond_forward_shapes_and_loss(small_cond):
    cfg, model, variables = small_cond
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 4))
    y = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 4))
    out, _ = model.apply(
        variables, x, y, jax.random.PRNGKey(4), train=True, mutable=["batch_stats"]
    )
    x_hat, y_hat, mu_z, lv_z, mu_u, lv_u, mu_p, lv_p = out
    assert x_hat.shape == x.shape and y_hat.shape == y.shape
    assert mu_z.shape == (2, cfg.z_dim) and lv_z.shape == (2, cfg.z_dim)
    assert mu_u.shape == (2, cfg.u_dim)
    assert mu_p.shape == (2, cfg.z_dim)
    # logvar of the conditional prior is clamped to [-7, 7]
    assert float(jnp.max(lv_p)) <= 7.0 and float(jnp.min(lv_p)) >= -7.0
    terms = cond_loss(
        x_hat, x, y_hat, y, mu_u, lv_u, mu_z, lv_z, mu_p, lv_p,
        variables["params"]["gammax"], variables["params"]["gammay"],
    )
    for t in terms:
        assert np.isfinite(float(t))


def test_cond_param_count_canonical():
    cfg = CondSRVAEConfig(cr=1.2, patch_size=64)
    model = CondSRVAE(cfg)
    v = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 64, 64, 4)),
        jnp.zeros((1, 32, 32, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    # reference cond_vae.py:233-235, verified by execution
    assert n_params(v["params"]) == 48_953_912
    assert cfg.latent_size == 13568 and cfg.latent_size_y == 3392
    assert cfg.z_dim == 13568  # canonical config: attr == actual


def test_cond_generation_paths(small_cond):
    cfg, model, variables = small_cond
    y = jax.random.uniform(jax.random.PRNGKey(5), (1, 8, 8, 4))
    sr = model.apply(
        variables, y, jax.random.PRNGKey(6), method=CondSRVAE.conditional_generation
    )
    assert sr.shape == (1, 16, 16, 4)
    samples = model.apply(
        variables, y, jax.random.PRNGKey(7), 4, method=CondSRVAE.sample
    )
    assert samples.shape == (4, 16, 16, 4)
    # posterior draws differ from each other
    assert not np.allclose(np.asarray(samples[0]), np.asarray(samples[1]))
    y_gen, x_gen = model.apply(
        variables, jax.random.PRNGKey(8), method=CondSRVAE.generation
    )
    assert y_gen.shape == (1, 8, 8, 4)
    assert x_gen.shape == (1, 16, 16, 4)


def test_models_shape_sound_at_noncanonical_configs():
    """The reference breaks at e.g. ps=16 (SURVEY §2.1); we must not."""
    for ps in (16, 32, 48):
        cfg = CondSRVAEConfig(cr=1.5, patch_size=ps)
        if cfg.latent_size // 64 < 1:
            continue
        model = CondSRVAE(cfg)
        out, _ = model.init_with_output(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, ps, ps, 4)),
            jnp.zeros((1, ps // 2, ps // 2, 4)),
            jax.random.PRNGKey(1),
            train=False,
        )
        assert out[0].shape == (1, ps, ps, 4)


def test_forward_is_deterministic_given_rng(small_cond):
    cfg, model, variables = small_cond
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, 16, 16, 4))
    y = jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 4))
    a = model.apply(variables, x, y, jax.random.PRNGKey(9), train=False)
    b = model.apply(variables, x, y, jax.random.PRNGKey(9), train=False)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    c = model.apply(variables, x, y, jax.random.PRNGKey(10), train=False)
    assert not np.allclose(np.asarray(a[0]), np.asarray(c[0]))


def test_sample_is_chunked_and_equivalent_at_n1000():
    """VERDICT r1 #8: model.sample must be HBM-safe from any entry point.
    The internal nn.scan chunking (one decoder trace, one chunk's
    activations live) must equal the single-batch decode elementwise."""
    import numpy as np

    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    y = jnp.asarray(np.random.default_rng(0).random((1, 8, 8, 4)), jnp.float32)
    v = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)), y, jax.random.PRNGKey(1), train=False,
    )
    rng = jax.random.PRNGKey(2)
    chunked = model.apply(v, y, rng, 1000, 128, method=CondSRVAE.sample)
    assert chunked.shape == (1000, 16, 16, 4)
    # chunk >= samples degenerates to the single-batch decode
    whole = model.apply(v, y, rng, 1000, 1000, method=CondSRVAE.sample)
    np.testing.assert_allclose(
        np.asarray(chunked), np.asarray(whole), rtol=1e-5, atol=1e-6
    )
