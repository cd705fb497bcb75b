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


def test_uncertainty_auto_chunk_default(resolver):
    """chunk=None sizes the decode by HBM budget (single dispatch for small
    requests) and matches an explicit-chunk call drawn from the same key."""
    y = np.random.default_rng(5).random((8, 8, 4)).astype(np.float32)
    maps = resolver.uncertainty(y, samples=5)  # chunk=None -> auto
    assert maps["mean"].shape == (16, 16, 4)
    assert float(jnp.min(maps["variance"])) >= 0.0


def test_super_resolve_moments_rederives(resolver):
    """The device-side moment sums equal a manual per-key generation loop
    over the documented schedule: key = fold_in(rng, call#), split into
    ``samples`` draw keys, each split into (k_u, k_z) -> globally drawn
    eps -> ``conditional_generation_eps`` (``serve._sr_moments_call``)."""
    y = np.random.default_rng(3).random((2, 8, 8, 4)).astype(np.float32)
    calls_before = resolver._calls
    s1, s2 = resolver.super_resolve_moments(y, 3)
    assert s1.shape == (2, 16, 16, 4) and s2.shape == (2, 16, 16, 4)

    model, variables = resolver.model, resolver.variables
    yj = jnp.asarray(y, jnp.float32)
    shapes = jax.eval_shape(
        lambda v, yy: model.apply(
            v, yy, method=type(model).generation_noise_shapes
        ),
        variables, yj,
    )
    key = jax.random.fold_in(resolver._rng, calls_before + 1)
    e1 = np.zeros_like(np.asarray(s1))
    e2 = np.zeros_like(e1)
    for key_i in jax.random.split(key, 3):
        k_u, k_z = jax.random.split(key_i)
        eps_u = jax.random.normal(k_u, shapes[0].shape, jnp.float32)
        eps_z = jax.random.normal(k_z, shapes[1].shape, jnp.float32)
        out = np.asarray(model.apply(
            variables, yj, eps_u, eps_z,
            method=type(model).conditional_generation_eps,
        ), np.float32)
        e1 += out
        e2 += out * out
    np.testing.assert_allclose(np.asarray(s1), e1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2), e2, rtol=1e-5, atol=1e-6)
    with pytest.raises(ValueError, match="samples"):
        resolver.super_resolve_moments(y, 0)


def test_warmup(resolver):
    warmup(resolver, lr_shape=(1, 8, 8, 4))
    warmup(resolver, lr_shape=(1, 8, 8, 4), tile_batch=None)


def test_from_checkpoint_resolves_embedded_config(tmp_path, capsys):
    """A checkpoint path alone serves: model-config arguments resolve from
    the sidecar meta the trainer embeds; explicit flags warn on conflict
    and win."""
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
    path = str(tmp_path / "model")
    save_checkpoint(path, state, epoch=1, extra={"model": {
        "type": "Cond_SRVAE", "cr": 2.0, "patch_size": 16, "channels": 4,
        "latent_size_override": 0, "torch_regroup": False,
    }})
    r = SuperResolver.from_checkpoint(path)  # no flags at all
    assert r.window == 8
    assert float(r.model.config.cr) == 2.0
    out = r.super_resolve(np.zeros((1, 8, 8, 4), np.float32))
    assert np.asarray(out).shape == (1, 16, 16, 4)
    capsys.readouterr()
    # matching explicit flags: silent
    SuperResolver.from_checkpoint(path, cr=2.0, patch_size=16)
    assert "overrides" not in capsys.readouterr().out
    # conflicting explicit flag: warned, and the flag wins (the restore
    # itself can even succeed — the models are fully convolutional, so a
    # wrong patch_size would otherwise serve the wrong window silently;
    # the warning is the safeguard)
    r32 = SuperResolver.from_checkpoint(path, cr=2.0, patch_size=32)
    assert r32.window == 16
    assert "overrides the checkpoint's recorded patch_size=16" in \
        capsys.readouterr().out


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


# ------------------------------------------------------- multi-device serving
def _small_cond(seed=0):
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(seed)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    return model, variables


def test_mesh_serving_matches_single_device():
    """SuperResolver(mesh=...) on the 8-virtual-device CPU mesh: batch
    shards over ``data``, results equal the single-device resolver."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(0).random((8, 8, 8, 4)).astype(np.float32)

    single = SuperResolver(model, variables, seed=3)
    meshed = SuperResolver(model, variables, seed=3, mesh=mesh)
    a = single.super_resolve(y)
    b = meshed.super_resolve(y)
    assert b.shape == (8, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_mesh_moments_match_single_device():
    """``super_resolve_moments`` on the 8-virtual-device mesh: windows
    shard over ``data``, each scan step's generation runs per-shard under
    shard_map with globally drawn eps — sums equal single-chip (the
    whole-raster UQ path therefore survives any mesh unchanged)."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(6).random((8, 8, 8, 4)).astype(np.float32)

    single = SuperResolver(model, variables, seed=9)
    meshed = SuperResolver(model, variables, seed=9, mesh=mesh)
    a1, a2 = single.super_resolve_moments(y, 4)
    b1, b2 = meshed.super_resolve_moments(y, 4)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b1), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a2), np.asarray(b2), rtol=1e-5,
                               atol=1e-5)
    # partial batches pad to the shard count and trim back
    c1, c2 = meshed.super_resolve_moments(y[:3], 2)
    assert c1.shape == (3, 16, 16, 4) and c2.shape == (3, 16, 16, 4)


def test_mesh_streaming_matches_single_device():
    """The bounded-memory scene sweep (``iter_tile_rows``) on a meshed
    resolver: window batches shard over the mesh and the streamed rows
    equal the single-chip stream (reparameterization noise is drawn
    globally, so meshed == single-chip with the same seed and batching)."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(2).random((17, 19, 4)).astype(np.float32)
    single = SuperResolver(model, variables, seed=5, normalize=False)
    meshed = SuperResolver(model, variables, seed=5, mesh=mesh,
                           normalize=False)

    def read(a, b):
        return y[a:b]

    a = np.concatenate(
        [blk for _, blk in single.iter_tile_rows(read, 17, 19, batch=8)])
    b = np.concatenate(
        [blk for _, blk in meshed.iter_tile_rows(read, 17, 19, batch=8)])
    assert a.shape == b.shape == (34, 38, 4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_mesh_serving_pads_partial_batches():
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    meshed = SuperResolver(model, variables, seed=3, mesh=mesh)
    y = np.random.default_rng(1).random((3, 8, 8, 4)).astype(np.float32)
    out = meshed.super_resolve(y)
    assert out.shape == (3, 16, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # uncertainty rounds the chunk up to the shard count and trims draws
    maps = meshed.uncertainty(y[0], samples=6, chunk=3)
    assert maps["mean"].shape == (16, 16, 4)
    assert np.isfinite(np.asarray(maps["std"])).all()


def test_sample_chunked_sharded_draws_match_unsharded():
    """Sharding the draw axis must not change the draws: same key, same
    chunk geometry -> identical samples (XLA partitions, values invariant)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh, replicate
    from simple_vae_rs_tpu.tasks import sample_chunked

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = jnp.asarray(
        np.random.default_rng(2).random((1, 8, 8, 4)).astype(np.float32)
    )
    key = jax.random.PRNGKey(11)
    a = sample_chunked(model, variables, y, key, samples=8, chunk=8)
    b = sample_chunked(
        model, replicate(mesh, variables), y, key, samples=8, chunk=8,
        sharding=NamedSharding(mesh, P("data")), mesh=mesh,
    )
    assert b.shape == (8, 16, 16, 4)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


def test_mesh_serving_int8_keeps_fused_routing_and_matches_single():
    """A >1-shard int8 resolver runs the quantized decode per-shard under
    shard_map (the fused kernels are NOT force-disabled by the topology)
    and produces identical results to the single-device int8 resolver."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(2).random((8, 8, 8, 4)).astype(np.float32)
    single = SuperResolver(model, variables, seed=5, int8=True)
    a = single.super_resolve(y)
    meshed = SuperResolver(model, variables, seed=5, int8=True, mesh=mesh)
    b = meshed.super_resolve(y)
    # int8 actually routed: differs from the f32 resolver's output
    f32 = SuperResolver(model, variables, seed=5)
    c = f32.super_resolve(y)
    # W8A8 activation scales are DYNAMIC (amax over the executing tile:
    # full batch on the XLA path, per program tile in the TPU kernel, per
    # shard under shard_map), so per-shard execution legitimately shifts
    # the activation quantization grid by up to one step (~amax/127).
    # The 1e-3 tolerance is that granularity on [0,1] sigmoid outputs —
    # far below the int8-vs-f32 gap asserted next.
    a, b, c = (np.asarray(t) for t in (a, b, c))
    np.testing.assert_allclose(a, b, atol=1e-3)
    assert not np.allclose(a, c, atol=1e-6), (
        "int8 resolver output should differ from full-precision"
    )


def test_int8_moments_route_quantized_decode():
    """``super_resolve_moments`` on an int8 resolver draws through the
    quantized decode (sums differ from the f32 resolver's at the same
    seed) and still yields valid statistics."""
    model, variables = _small_cond()
    y = np.random.default_rng(12).random((2, 8, 8, 4)).astype(np.float32)
    q1, q2 = SuperResolver(
        model, variables, seed=5, int8=True
    ).super_resolve_moments(y, 4)
    f1, _ = SuperResolver(model, variables, seed=5).super_resolve_moments(
        y, 4
    )
    q1, q2, f1 = (np.asarray(t) for t in (q1, q2, f1))
    mean = q1 / 4
    assert float((q2 / 4 - mean * mean).min()) >= -1e-5
    assert not np.allclose(q1, f1, atol=1e-6), (
        "int8 moments should differ from full-precision"
    )


def test_mixed_topology_resolvers_coexist():
    """Meshed and single-chip resolvers coexist in one process, each with
    per-call kernel routing — no warning, and the earlier resolver's
    outputs are unchanged by constructing the later one."""
    import warnings as _warnings

    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(7).random((8, 8, 8, 4)).astype(np.float32)
    with _warnings.catch_warnings():
        _warnings.simplefilter("error")
        single = SuperResolver(model, variables, seed=7)
        a1 = single.super_resolve(y)
        meshed = SuperResolver(model, variables, seed=7, mesh=mesh)
        b = meshed.super_resolve(y)
        single2 = SuperResolver(model, variables, seed=7)
        a2 = single2.super_resolve(y)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(a2), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a1), np.asarray(b), rtol=1e-5,
                               atol=1e-5)


# ------------------------------------------------ weights-only int8 mode
def test_int8_weights_mode_close_to_f32_and_quantized():
    """int8_weights=True: the round-4 measured-fastest serving formulation
    (weights quantized at load, dequantized by plain graph ops in-trace)
    brought live — seeded outputs track the f32 resolver closely but are
    NOT bitwise equal (proof the quantization actually engaged)."""
    model, variables = _small_cond()
    y = np.random.default_rng(21).random((3, 8, 8, 4)).astype(np.float32)
    f = SuperResolver(model, variables, seed=4)
    q = SuperResolver(model, variables, seed=4, int8_weights=True)
    assert q._pack_spec is not None
    assert "int8" in q._pack_spec[0], "no kernel was large enough to pack"
    a = np.asarray(f.super_resolve(y, seed=123))
    b = np.asarray(q.super_resolve(y, seed=123))
    assert a.shape == b.shape
    err = float(np.sqrt(np.mean((a - b) ** 2)))
    assert err < 5e-2, f"int8-weight decode drifted too far: rmse={err}"
    assert not np.array_equal(a, b)
    # per-request seeding: bitwise reproducible on repeat
    np.testing.assert_array_equal(
        b, np.asarray(q.super_resolve(y, seed=123))
    )


def test_int8_weights_moments_and_uncertainty():
    """The moments hook AND the chunked-draw uncertainty pipeline both
    ride the packed payload (pack_spec threads into sample_chunked) —
    defined, consistent, and actually quantized."""
    model, variables = _small_cond()
    y = np.random.default_rng(22).random((2, 8, 8, 4)).astype(np.float32)
    f = SuperResolver(model, variables, seed=6)
    q = SuperResolver(model, variables, seed=6, int8_weights=True)
    s1, s2 = q.super_resolve_moments(y, 4, seed=9)
    s1, s2 = np.asarray(s1), np.asarray(s2)
    mean = s1 / 4
    assert float((s2 / 4 - mean * mean).min()) >= -1e-5
    uq = q.uncertainty(y[:1], samples=4, chunk=4, seed=9)
    uf = f.uncertainty(y[:1], samples=4, chunk=4, seed=9)
    a, b = np.asarray(uq["mean"]), np.asarray(uf["mean"])
    assert np.all(np.isfinite(a))
    # same seed, same draws — close to f32 but NOT bitwise (the chunk
    # decodes really ran on dequantized-int8 weights)
    assert float(np.sqrt(np.mean((a - b) ** 2))) < 5e-2
    assert not np.array_equal(a, b)


def test_int8_weights_mesh_matches_single_device():
    """Meshed int8-weights serving == single-chip exactly (same packed
    payload replicated; eps drawn globally, decode per shard)."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    model, variables = _small_cond()
    mesh = make_mesh(MeshConfig(data=8, model=1))
    y = np.random.default_rng(23).random((8, 8, 8, 4)).astype(np.float32)
    single = SuperResolver(model, variables, seed=8, int8_weights=True)
    meshed = SuperResolver(model, variables, seed=8, int8_weights=True,
                           mesh=mesh)
    a = np.asarray(single.super_resolve(y, seed=55))
    b = np.asarray(meshed.super_resolve(y, seed=55))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)
    m1 = np.asarray(single.super_resolve_moments(y, 3, seed=55)[0])
    m2 = np.asarray(meshed.super_resolve_moments(y, 3, seed=55)[0])
    np.testing.assert_allclose(m1, m2, rtol=1e-5, atol=1e-5)


def test_int8_modes_mutually_exclusive():
    model, variables = _small_cond()
    with pytest.raises(ValueError, match="int8_weights"):
        SuperResolver(model, variables, int8=True, int8_weights=True)
