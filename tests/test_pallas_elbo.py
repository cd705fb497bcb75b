"""Pallas fused-ELBO kernels vs the jnp reference implementation.

Kernels run in interpret mode on the CPU backend; values and *gradients*
must match ``ops.losses`` (the golden-tested formulas) to float tolerance.
"""

import numpy as np
import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.ops import losses as ref
from simple_vae_rs_tpu.ops import pallas_elbo as pe


def _rows(rng, b, d):
    return rng.standard_normal((b, d)).astype(np.float32)


def test_sq_rows_interpret_matches():
    rng = np.random.default_rng(0)
    a, b = _rows(rng, 4, 256), _rows(rng, 4, 256)
    got = pe._sq_rows_impl(jnp.array(a), jnp.array(b), interpret=True)
    want = np.sum((a - b) ** 2, axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_kl_std_rows_interpret_matches():
    rng = np.random.default_rng(1)
    mu, lv = _rows(rng, 3, 384), _rows(rng, 3, 384)
    got = pe._kl_std_rows_impl(jnp.array(mu), jnp.array(lv), interpret=True)
    want = np.sum(mu**2 + np.exp(lv) - 1 - lv, axis=1)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_kl_gen_rows_interpret_matches():
    rng = np.random.default_rng(2)
    args = [_rows(rng, 2, 128) for _ in range(4)]
    got = pe._kl_gen_rows_impl(*(jnp.array(a) for a in args), interpret=True)
    mu2, lv2, mu3, lv3 = args
    want = np.sum(
        (lv3 - lv2 - 1) + np.exp(lv2 - lv3) + (mu2 - mu3) ** 2 * np.exp(-lv3), axis=1
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5)


def test_column_tiled_accumulation():
    """Rows longer than one VMEM block (128px configs: 218k features) are
    tiled over column blocks with accumulation; ragged edge zero-padded."""
    from simple_vae_rs_tpu.ops import pallas_elbo as pe_mod

    old = pe_mod._MAX_COLS
    pe_mod._MAX_COLS = 256  # force many column blocks with a ragged edge
    try:
        rng = np.random.default_rng(7)
        d = 1000  # 4 blocks of 256 with padding
        a, b = _rows(rng, 3, d), _rows(rng, 3, d)
        got = pe._sq_rows_impl(jnp.array(a), jnp.array(b), interpret=True)
        np.testing.assert_allclose(
            np.asarray(got), np.sum((a - b) ** 2, axis=1), rtol=1e-4
        )
        args = [_rows(rng, 3, d) for _ in range(4)]
        got_kl = pe._kl_gen_rows_impl(*(jnp.array(x) for x in args), interpret=True)
        mu2, lv2, mu3, lv3 = args
        want = np.sum(
            (lv3 - lv2 - 1) + np.exp(lv2 - lv3) + (mu2 - mu3) ** 2 * np.exp(-lv3),
            axis=1,
        )
        np.testing.assert_allclose(np.asarray(got_kl), want, rtol=1e-4)
    finally:
        pe_mod._MAX_COLS = old


def test_unaligned_row_length():
    """Row length not a multiple of 128 (latent_y=3392 case)."""
    rng = np.random.default_rng(3)
    a, b = _rows(rng, 2, 212), _rows(rng, 2, 212)
    got = pe._sq_rows_impl(jnp.array(a), jnp.array(b), interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.sum((a - b) ** 2, 1), rtol=1e-5)


def test_fused_base_loss_matches_reference_and_grads():
    rng = np.random.default_rng(4)
    recon = rng.random((3, 8, 8, 4)).astype(np.float32)
    x = rng.random((3, 8, 8, 4)).astype(np.float32)
    mu, lv = _rows(rng, 3, 64), _rows(rng, 3, 64)
    gamma = jnp.float32(1.4)
    args = (jnp.array(recon), jnp.array(x), jnp.array(mu), jnp.array(lv), gamma)

    mse_f, kld_f = pe.fused_base_loss(*args)
    mse_r, kld_r = ref.base_loss(*args)
    np.testing.assert_allclose(float(mse_f), float(mse_r), rtol=1e-5)
    np.testing.assert_allclose(float(kld_f), float(kld_r), rtol=1e-5)

    def total_f(recon, mu, lv, g):
        m, k = pe.fused_base_loss(recon, args[1], mu, lv, g)
        return m + k

    def total_r(recon, mu, lv, g):
        m, k = ref.base_loss(recon, args[1], mu, lv, g)
        return m + k

    gf = jax.grad(total_f, argnums=(0, 1, 2, 3))(args[0], args[2], args[3], gamma)
    gr = jax.grad(total_r, argnums=(0, 1, 2, 3))(args[0], args[2], args[3], gamma)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_fused_cond_loss_matches_reference_and_grads():
    rng = np.random.default_rng(5)
    shapes = dict(
        recon_x=(2, 16, 16, 4), x=(2, 16, 16, 4),
        recon_y=(2, 8, 8, 4), y=(2, 8, 8, 4),
    )
    imgs = {k: jnp.array(rng.random(v).astype(np.float32)) for k, v in shapes.items()}
    lat = {
        k: jnp.array(_rows(rng, 2, 96))
        for k in ("mu_u", "lv_u", "mu_z", "lv_z", "mu_p", "lv_p")
    }
    gx, gy = jnp.float32(0.8), jnp.float32(1.2)
    args = (
        imgs["recon_x"], imgs["x"], imgs["recon_y"], imgs["y"],
        lat["mu_u"], lat["lv_u"], lat["mu_z"], lat["lv_z"],
        lat["mu_p"], lat["lv_p"], gx, gy,
    )
    for f, r in zip(pe.fused_cond_loss(*args), ref.cond_loss(*args)):
        np.testing.assert_allclose(float(f), float(r), rtol=1e-5)

    def tot(fn, *diff_args):
        out = fn(diff_args[0], args[1], args[2], args[3],
                 diff_args[1], diff_args[2], diff_args[3], diff_args[4],
                 diff_args[5], diff_args[6], diff_args[7], args[11])
        return sum(out)

    d_args = (args[0], args[4], args[5], args[6], args[7], args[8], args[9], args[10])
    gf = jax.grad(lambda *a: tot(pe.fused_cond_loss, *a), argnums=tuple(range(8)))(*d_args)
    gr = jax.grad(lambda *a: tot(ref.cond_loss, *a), argnums=tuple(range(8)))(*d_args)
    for a, b in zip(gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_pallas_rows_under_shard_map_match():
    """The actual Pallas kernel (interpret mode) runs PER-SHARD under
    shard_map over the 8-virtual-device mesh — the multi-chip routing the
    engine uses (it passes its mesh into the fused losses, which wrap the
    row kernels in shard_map instead of falling back to XLA)."""
    import functools

    import pytest
    from jax.sharding import PartitionSpec as P

    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mesh = make_mesh(MeshConfig(data=8, model=1))
    rng = np.random.default_rng(3)
    a, b = _rows(rng, 16, 256), _rows(rng, 16, 256)
    fn = functools.partial(pe._sq_rows_impl, interpret=True)
    got = jax.shard_map(
        fn,
        mesh=mesh,
        in_specs=(P("data", None), P("data", None)),
        out_specs=P("data"),
        check_vma=False,
    )(jnp.array(a), jnp.array(b))
    np.testing.assert_allclose(
        np.asarray(got), np.sum((a - b) ** 2, axis=1), rtol=1e-5
    )


def test_engine_elbo_scope_routes_training_to_xla():
    """Round-5 default: training traces under force_xla (the measured
    faster arm); eval keeps the fused kernels; cfg restores Pallas."""
    import contextlib

    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.train.engine import Trainer

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    def kind(tr, train):
        return type(tr._elbo_scope(train)).__name__

    default = Trainer(model, TrainConfig())
    assert default.cfg.train_elbo == "xla"
    with default._elbo_scope(True):
        assert pe._FORCE_XLA.get() is True  # training scope forces XLA
    assert pe._FORCE_XLA.get() is False  # scope exits cleanly
    assert isinstance(default._elbo_scope(False), contextlib.nullcontext)

    pallas = Trainer(model, TrainConfig(train_elbo="pallas"))
    assert isinstance(pallas._elbo_scope(True), contextlib.nullcontext)
    assert kind(default, True) != "nullcontext"
