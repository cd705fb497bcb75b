"""Serving API: checkpoint -> SuperResolver -> SR + uncertainty endpoints."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.serve import SuperResolver, warmup
from simple_vae_rs_tpu.train.checkpoint import save_checkpoint
from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer


@pytest.fixture(scope="module")
def resolver(tmp_path_factory):
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    state = create_train_state(variables, make_optimizer(TrainConfig()),
                               jax.random.PRNGKey(2))
    path = str(tmp_path_factory.mktemp("ck") / "model")
    save_checkpoint(path, state, epoch=5)
    return SuperResolver.from_checkpoint(path, cr=2.0, patch_size=16)


def test_super_resolve_shapes_and_range(resolver):
    y = np.random.default_rng(0).random((3, 8, 8, 4)).astype(np.float32) * 900
    x_hat = resolver.super_resolve(y)
    assert x_hat.shape == (3, 16, 16, 4)
    assert 0.0 <= float(jnp.min(x_hat)) and float(jnp.max(x_hat)) <= 1.0
    # single image without batch dim also accepted
    one = resolver.super_resolve(y[0])
    assert one.shape == (1, 16, 16, 4)


def test_repeated_calls_reuse_compilation_and_vary(resolver):
    y = np.random.default_rng(1).random((2, 8, 8, 4)).astype(np.float32)
    a = resolver.super_resolve(y)
    b = resolver.super_resolve(y)
    # same conditioning, fresh posterior draw -> different samples
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_uncertainty_maps(resolver):
    y = np.random.default_rng(2).random((8, 8, 4)).astype(np.float32)
    maps = resolver.uncertainty(y, samples=6, chunk=3)
    assert maps["mean"].shape == (16, 16, 4)
    assert float(jnp.min(maps["variance"])) >= 0.0
    mmse = resolver.mmse_estimate(y, samples=4, chunk=4)
    assert mmse.shape == (16, 16, 4)


def test_warmup(resolver):
    warmup(resolver, lr_shape=(1, 8, 8, 4))


def test_from_checkpoint_srvae(tmp_path):
    from simple_vae_rs_tpu.models import SRVAE

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = SRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    state = create_train_state(variables, make_optimizer(TrainConfig()),
                               jax.random.PRNGKey(2))
    path = str(tmp_path / "srvae")
    save_checkpoint(path, state, epoch=1)
    sr = SuperResolver.from_checkpoint(path, cr=2.0, patch_size=16,
                                       model_type="SRVAE")
    y = np.random.default_rng(5).random((2, 8, 8, 4)).astype(np.float32)
    out = sr.super_resolve(y)
    assert out.shape == (2, 16, 16, 4)
    maps = sr.uncertainty(y[0], samples=4, chunk=2)
    assert maps["mean"].shape == (16, 16, 4)
