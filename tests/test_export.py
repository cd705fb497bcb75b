"""StableHLO serving artifacts: export -> deserialize -> serve parity."""

import json

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.export import (
    ExportedResolver,
    export_resolver,
    load_exported,
)
from simple_vae_rs_tpu.serve import SuperResolver


@pytest.fixture(scope="module")
def small_pair(tmp_path_factory):
    """A live resolver and its exported artifact (CPU-only lowering)."""
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    from simple_vae_rs_tpu.models import CondSRVAE

    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    resolver = SuperResolver(model, variables, seed=3)
    path = str(tmp_path_factory.mktemp("exp") / "model.svrs")
    export_resolver(resolver, path, batch=4, platforms=("cpu",))
    return resolver, path


def test_artifact_files_and_meta(small_pair):
    _, path = small_pair
    with open(path + ".meta.json") as fh:
        meta = json.load(fh)
    assert meta["format"] == "svrs-export/1"
    assert meta["model_type"] == "CondSRVAE"
    assert (meta["patch_size"], meta["channels"], meta["batch"]) == (16, 4, 4)
    assert meta["normalize"] is True
    assert meta["n_params"] > 0
    import os

    # the weights are baked in: the blob must at least hold the params
    assert os.path.getsize(path) >= 4 * meta["n_params"] * 0.5


def test_exported_matches_direct_graph(small_pair):
    """The artifact reproduces the un-exported generation graph for the
    same (input, key): serialization must not change the math. Tolerance
    is 1e-6, not bitwise: XLA:CPU compiles of the same graph can differ
    by 1 ulp depending on process history (observed when other test files
    run first in one process), which is compiler scheduling, not
    serialization."""
    resolver, path = small_pair
    from simple_vae_rs_tpu.export import _generation_fn

    esr = load_exported(path)
    y = np.random.default_rng(0).random((4, 8, 8, 4)).astype(np.float32) * 700
    key = jax.random.key_data(jax.random.key(42))
    direct = jax.jit(_generation_fn(resolver.model,
                                    jax.device_get(resolver.variables)))(
        jnp.asarray(y), key, jnp.asarray(True)
    )
    via_artifact = esr._call(jnp.asarray(y), key, jnp.asarray(True))
    np.testing.assert_allclose(np.asarray(direct),
                               np.asarray(via_artifact),
                               rtol=1e-6, atol=1e-6)


def test_super_resolve_shapes_rebatching_and_draws(small_pair):
    _, path = small_pair
    esr = load_exported(path, seed=5)
    rng = np.random.default_rng(1)
    # 3 < batch(4): padded+trimmed; 6 > batch: two dispatches
    for b in (3, 6):
        y = rng.random((b, 8, 8, 4)).astype(np.float32)
        out = np.asarray(esr.super_resolve(y))
        assert out.shape == (b, 16, 16, 4)
        assert np.isfinite(out).all()
    one = esr.super_resolve(rng.random((8, 8, 4)).astype(np.float32))
    assert np.asarray(one).shape == (1, 16, 16, 4)
    # fresh posterior draw per call
    y = rng.random((2, 8, 8, 4)).astype(np.float32)
    a, b = esr.super_resolve(y), esr.super_resolve(y)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    # shape guard
    with pytest.raises(ValueError, match="artifact serves"):
        esr.super_resolve(rng.random((2, 9, 9, 4)).astype(np.float32))


def test_rebatched_tail_padding_is_trimmed_consistently(small_pair):
    """Padding slots repeat the last window; their outputs must be
    dropped — row i of a short batch equals what a full batch that
    repeats row i would produce (same key)."""
    _, path = small_pair
    esr = load_exported(path)
    y = np.random.default_rng(2).random((1, 8, 8, 4)).astype(np.float32)
    key = jax.random.key_data(jax.random.key(7))
    full = esr._call(jnp.repeat(jnp.asarray(y), 4, axis=0), key,
                     jnp.asarray(True))
    esr2 = load_exported(path)
    esr2._next_key = lambda: key  # pin the key the endpoint uses
    short = esr2.super_resolve(y)
    assert np.asarray(short).shape == (1, 16, 16, 4)
    np.testing.assert_array_equal(np.asarray(short)[0], np.asarray(full)[0])


def test_normalize_flag_is_traced_not_baked(small_pair):
    """One artifact serves both normalize settings (the tile path sends
    pre-normalized windows with the flag off)."""
    _, path = small_pair
    esr = load_exported(path)
    y = np.random.default_rng(3).random((4, 8, 8, 4)).astype(np.float32)
    key = jax.random.key_data(jax.random.key(0))
    on = np.asarray(esr._call(jnp.asarray(y * 900), key, jnp.asarray(True)))
    off = np.asarray(esr._call(jnp.asarray(y), key, jnp.asarray(False)))
    # same key, scaled input: with normalization on, the scale cancels
    # and the pre-normalized flag-off call sees (almost) the same input
    assert np.allclose(on, off, atol=1e-2)
    # flag off really skips the in-graph normalization (untrained outputs
    # all sit near 0.5, so the check is bitwise, not approximate)
    raw = np.asarray(esr._call(jnp.asarray(y * 900), key, jnp.asarray(False)))
    assert not np.array_equal(on, raw)


def test_super_resolve_moments_rederives_from_sr_graph(small_pair):
    """The load-time scan (``_moments_over``) must equal a manual loop of
    the artifact's own generation graph over the documented key schedule:
    key = fold_in(rng, call#) split into ``samples`` per-draw keys."""
    _, path = small_pair
    esr = load_exported(path, seed=29)
    y = np.random.default_rng(9).random((4, 8, 8, 4)).astype(np.float32)
    s1, s2 = esr.super_resolve_moments(y, 3)
    assert s1.shape == (4, 16, 16, 4) and s2.shape == (4, 16, 16, 4)

    ref = load_exported(path, seed=29)
    key = jax.random.fold_in(jax.random.key(29), 1)
    e1 = np.zeros_like(s1)
    e2 = np.zeros_like(s2)
    flag = jnp.asarray(False, jnp.bool_)
    for key_i in jax.random.split(key, 3):
        out = np.asarray(
            ref._call(jnp.asarray(y), jax.random.key_data(key_i), flag),
            np.float32,
        )
        e1 += out
        e2 += out * out
    np.testing.assert_allclose(s1, e1, rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(s2, e2, rtol=1e-5, atol=1e-6)

    # re-batching: 3 windows pad to the artifact batch of 4 and trim back
    p1, p2 = esr.super_resolve_moments(y[:3], 2)
    assert p1.shape == (3, 16, 16, 4) and p2.shape == (3, 16, 16, 4)
    mean = p1 / 2
    assert float((p2 / 2 - mean * mean).min()) >= -1e-5
    with pytest.raises(ValueError, match="samples"):
        esr.super_resolve_moments(y, 0)
    with pytest.raises(ValueError, match="artifact serves"):
        esr.super_resolve_moments(np.zeros((2, 9, 9, 4), np.float32), 2)


def test_uncertainty_tile_off_artifact_uses_moments_hook(small_pair,
                                                         monkeypatch):
    """Whole-raster UQ from the portable file reduces draws on device:
    ``super_resolve`` is never consulted (no per-draw traffic)."""
    _, path = small_pair
    esr = load_exported(path, seed=31)
    monkeypatch.setattr(
        ExportedResolver, "super_resolve",
        lambda self, y, normalize=None: pytest.fail(
            "tile UQ fell back to per-draw super_resolve"
        ),
    )
    raster = np.random.default_rng(10).random((16, 16, 4)).astype(np.float32)
    maps = esr.uncertainty_tile(raster, samples=4, overlap=0, batch=4)
    assert maps["mean"].shape == (32, 32, 4)
    assert (maps["variance"] >= 0).all()


def test_uncertainty_and_mmse(small_pair):
    _, path = small_pair
    esr = load_exported(path, seed=9)
    y = np.random.default_rng(4).random((8, 8, 4)).astype(np.float32)
    maps = esr.uncertainty(y, samples=6)
    assert maps["mean"].shape == (16, 16, 4)
    assert (maps["variance"] >= 0).all()
    assert np.allclose(maps["std"] ** 2, maps["variance"], atol=1e-6)
    mmse = esr.mmse_estimate(y, samples=4)
    assert np.asarray(mmse).shape == (16, 16, 4)
    with pytest.raises(ValueError, match="samples"):
        esr.uncertainty(y, samples=1)


def test_tile_endpoints_run_off_the_artifact(small_pair):
    """The whole-raster stack (window grid + feathered stitch + streaming
    sweep) serves from the portable file alone."""
    _, path = small_pair
    esr = load_exported(path, seed=11)
    raster = np.random.default_rng(5).random((20, 26, 4)).astype(np.float32)
    sr = esr.super_resolve_tile(raster, batch=4)
    assert sr.shape == (40, 52, 4)
    assert np.isfinite(sr).all()
    maps = esr.uncertainty_tile(raster, samples=3, batch=4)
    assert maps["mean"].shape == (40, 52, 4)
    # streaming sweep covers every SR row exactly once, in order
    mn = raster.min(axis=(0, 1), keepdims=True)
    mx = raster.max(axis=(0, 1), keepdims=True)
    norm = (raster - mn) / (mx - mn + 1e-5)
    rows = []
    for r0, block in esr.iter_tile_rows(
        lambda a, b: norm[a:b], 20, 26, batch=4
    ):
        assert r0 == sum(x.shape[0] for x in rows)
        rows.append(block)
    whole = np.concatenate(rows)
    assert whole.shape == (40, 52, 4)


def test_missing_sidecar_and_bad_meta(small_pair, tmp_path):
    _, path = small_pair
    blob = open(path, "rb").read()
    orphan = tmp_path / "orphan.svrs"
    orphan.write_bytes(blob)
    with pytest.raises(FileNotFoundError, match="meta.json"):
        load_exported(str(orphan))
    from jax import export as jexport

    with pytest.raises(ValueError, match="svrs-export"):
        ExportedResolver(jexport.deserialize(bytearray(blob)),
                         {"format": "something-else"})


def test_http_server_serves_from_artifact(small_pair):
    """svrs-serve --artifact: the whole HTTP surface runs off the
    portable file — healthz reports artifact metadata and the model
    endpoints dispatch the exported graph."""
    import io
    import threading
    import urllib.request

    from simple_vae_rs_tpu.server import make_server

    esr = load_exported(small_pair[1], seed=13)
    srv = make_server(esr, port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/healthz", timeout=30) as resp:
            health = json.loads(resp.read())
        assert health["artifact"] is True
        assert health["model"] == "CondSRVAE"
        assert (health["patch_size"], health["channels"]) == (16, 4)
        assert health["platforms"] == ["cpu"]
        assert health["moments"] is True  # load-time scan over the graph

        from simple_vae_rs_tpu.client import Client

        s1, s2 = Client(url, timeout=120).super_resolve_moments(
            np.random.default_rng(30).random((2, 8, 8, 4)).astype(
                np.float32
            ),
            samples=3,
        )
        assert s1.shape == (2, 16, 16, 4)
        assert float((s2 / 3 - (s1 / 3) ** 2).min()) >= -1e-5

        y = np.random.default_rng(6).random((2, 8, 8, 4)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, y)
        req = urllib.request.Request(
            url + "/v1/super_resolve", data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            sr = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        assert sr.shape == (2, 16, 16, 4)

        raster = np.random.default_rng(7).random((18, 22, 4)).astype(np.float32)
        buf = io.BytesIO()
        np.save(buf, raster)
        req = urllib.request.Request(
            url + "/v1/uncertainty_tile?samples=3&batch=4",
            data=buf.getvalue(),
            headers={"Content-Type": "application/x-npy"},
        )
        with urllib.request.urlopen(req, timeout=120) as resp:
            maps = np.load(io.BytesIO(resp.read()), allow_pickle=False)
        assert maps["mean"].shape == (36, 44, 4)
        assert (maps["variance"] >= 0).all()
    finally:
        srv.shutdown()
        srv.server_close()


def test_server_cli_rejects_baked_flags_with_artifact(small_pair):
    from simple_vae_rs_tpu.server import main as server_main

    for extra in (["--int8"], ["--mesh_data", "2"], ["--patch_size", "16"]):
        with pytest.raises(SystemExit):
            server_main(["--artifact", small_pair[1], *extra])
    with pytest.raises(SystemExit):  # exactly one source required
        server_main(["--artifact", small_pair[1], "--model_ckpt", "x"])


def test_raster_stream_cli_against_artifact_server(small_pair, tmp_path):
    """Whole-scene streaming off the portable file: raster --stream --url
    drives an artifact-backed server — bounded-memory row bands on the
    client, the exported graph on the server, GeoTIFF in -> SR out."""
    import threading

    from simple_vae_rs_tpu import raster
    from simple_vae_rs_tpu.data.tiffio import read_tiff, write_tiff
    from simple_vae_rs_tpu.server import make_server

    srv = make_server(load_exported(small_pair[1], seed=17), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        lr = (np.random.default_rng(22).random((21, 19, 4)) * 900).astype(
            np.uint16
        )
        src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
        write_tiff(src, lr)
        raster.main([src, dst, "--url", url, "--batch", "4", "--stream"])
        out = read_tiff(dst)
        assert out.shape == (42, 38, 4)
        assert out.dtype == np.uint16
    finally:
        srv.shutdown()
        srv.server_close()


def test_export_checkpoint_cli_roundtrip(tmp_path):
    """End to end: checkpoint on disk -> CLI export -> verify pass."""
    from simple_vae_rs_tpu.config import TrainConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.train.checkpoint import save_checkpoint
    from simple_vae_rs_tpu.train.state import (
        create_train_state,
        make_optimizer,
    )

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
    ckpt = str(tmp_path / "model")
    save_checkpoint(
        ckpt, state, epoch=1,
        extra={"model": {"type": "Cond_SRVAE", "cr": 2.0, "patch_size": 16,
                         "channels": 4}},
    )
    out = str(tmp_path / "model.svrs")
    from simple_vae_rs_tpu.export import main

    assert main([ckpt, out, "--batch", "2", "--platforms", "cpu",
                 "--verify"]) == 0
    esr = load_exported(out)
    assert esr.batch == 2
    y = np.zeros((2, 8, 8, 4), np.float32)
    assert np.asarray(esr.super_resolve(y)).shape == (2, 16, 16, 4)


def test_rtn_numpy_matches_quantize_rtn():
    """The host-side packer must quantize exactly like ops/quantize's
    round-to-nearest kernel (same scales, same codes, zero-channel rule)."""
    from simple_vae_rs_tpu.export import _rtn_numpy
    from simple_vae_rs_tpu.ops.quantize import quantize_rtn

    w = np.random.default_rng(0).normal(size=(3, 3, 8, 16)).astype(
        np.float32
    )
    w[..., 5] = 0.0  # a dead channel must get scale 1
    q_np, s_np = _rtn_numpy(w)
    q_j, s_j = quantize_rtn(jnp.asarray(w))
    np.testing.assert_array_equal(q_np, np.asarray(q_j))
    np.testing.assert_allclose(s_np, np.asarray(s_j), rtol=0, atol=0)
    assert s_np[5] == 1.0 and not q_np[..., 5].any()


def test_weight_compressed_artifacts(small_pair, tmp_path):
    """--weights bf16/int8: smaller files, same graph contract, output
    within quantization noise of the f32 artifact for the same key."""
    import os

    resolver, f32_path = small_pair
    y = (np.random.default_rng(8).random((4, 8, 8, 4)) * 500).astype(
        np.float32
    )
    key = jax.random.key_data(jax.random.key(21))
    ref = np.asarray(
        load_exported(f32_path)._call(jnp.asarray(y), key, jnp.asarray(True))
    )
    span = float(ref.max() - ref.min()) or 1.0

    sizes = {"f32": os.path.getsize(f32_path)}
    psnr_floor = {"bf16": 45.0, "int8": 30.0}
    for mode in ("bf16", "int8"):
        path = str(tmp_path / f"model_{mode}.svrs")
        export_resolver(resolver, path, batch=4, platforms=("cpu",),
                        weights=mode)
        with open(path + ".meta.json") as fh:
            assert json.load(fh)["weights"] == mode
        sizes[mode] = os.path.getsize(path)
        out = np.asarray(
            load_exported(path)._call(jnp.asarray(y), key, jnp.asarray(True))
        )
        assert out.shape == ref.shape and np.isfinite(out).all()
        mse = float(np.mean((out - ref) ** 2))
        psnr = 10 * np.log10(span * span / max(mse, 1e-20))
        assert psnr > psnr_floor[mode], (mode, psnr)
    assert sizes["bf16"] < sizes["f32"]
    assert sizes["int8"] < sizes["bf16"]


def test_pack_variables_rejects_unknown_mode(small_pair):
    from simple_vae_rs_tpu.export import _pack_variables

    resolver, _ = small_pair
    with pytest.raises(ValueError, match="weights must be one of"):
        _pack_variables(jax.device_get(resolver.variables), "fp16")


def test_artifact_seeded_tile_reproducible(small_pair):
    """Per-request seeds reach the artifact's whole-raster endpoints: the
    TileEndpoints mixin derives subseed(seed, batch) per window batch and
    the deserialized graph is deterministic given (input, key), so a
    seeded tile product repeats bitwise."""
    import numpy as np

    _, path = small_pair
    esr = load_exported(path)
    raster = np.random.default_rng(3).random((12, 18, 4)).astype(np.float32)
    a = esr.super_resolve_tile(raster, overlap=2, batch=4, seed=7)
    b = esr.super_resolve_tile(raster, overlap=2, batch=4, seed=7)
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(
        a, esr.super_resolve_tile(raster, overlap=2, batch=4, seed=8)
    )
    ua = esr.uncertainty_tile(raster, samples=3, overlap=2, batch=4, seed=9)
    ub = esr.uncertainty_tile(raster, samples=3, overlap=2, batch=4, seed=9)
    np.testing.assert_array_equal(ua["std"], ub["std"])
