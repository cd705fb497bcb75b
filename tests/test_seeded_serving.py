"""Per-request reproducible seeds across the whole serving stack.

Contract (serve.SuperResolver class note): ``seed=N`` on any serving
endpoint derives that request's posterior draws purely from N — same
input + seed + options -> bitwise-identical output on repeat calls,
across processes, and on whichever side of the HTTP link runs the
windowing — while never advancing the resolver's rolling RNG (seeded
traffic cannot perturb concurrent unseeded traffic). The reference has
no serving stack at all (its inference is ``/root/reference/train.py:54-59``);
this is a production property the rebuild adds for auditable EO products.
"""

import threading

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.serve import SuperResolver
from simple_vae_rs_tpu.tiling import subseed


def _make_resolver(seed=0, **kw):
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    return SuperResolver(model, variables, seed=seed, **kw)


@pytest.fixture(scope="module")
def resolver():
    return _make_resolver(seed=0)


@pytest.fixture(scope="module")
def lr():
    return np.random.default_rng(5).random((3, 8, 8, 4)).astype(np.float32)


@pytest.fixture(scope="module")
def raster():
    return np.random.default_rng(6).random((12, 18, 4)).astype(np.float32)


def test_subseed_is_pinned():
    """The dispatch-seed derivation is part of the wire contract: a
    seeded remote tile request sends ``subseed(seed, j)`` for window
    batch j, and the server's own tile endpoint must derive the same
    value. numpy documents SeedSequence stability across versions; this
    pins our use of it so an accidental re-derivation shows up."""
    assert subseed(0, 0) == 3757552657
    assert subseed(0, 1) == 673228719
    assert subseed(7, 0) == 1201125462
    assert subseed(7, 3, 2) == 4014525388
    # the seed domain is non-negative ints; fail at the contract surface,
    # not deep inside SeedSequence mid-sweep
    with pytest.raises(ValueError, match="non-negative"):
        subseed(-3, 0)


def test_seeded_super_resolve_reproducible_and_isolated(resolver, lr):
    a = np.asarray(resolver.super_resolve(lr, seed=11))
    # interleave unseeded traffic: must not disturb the seeded result
    resolver.super_resolve(lr)
    b = np.asarray(resolver.super_resolve(lr, seed=11))
    c = np.asarray(resolver.super_resolve(lr, seed=12))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_seeded_calls_do_not_advance_rolling_state(lr):
    """Two resolvers with the same construction seed: one serves seeded
    requests between its unseeded calls, the other doesn't — their
    unseeded draw sequences must match exactly."""
    ra, rb = _make_resolver(seed=4), _make_resolver(seed=4)
    a1 = np.asarray(ra.super_resolve(lr))
    b1 = np.asarray(rb.super_resolve(lr))
    rb.super_resolve(lr, seed=99)
    rb.super_resolve_moments(lr, 3, seed=99)
    rb.uncertainty(lr[0], samples=2, chunk=2, seed=99)
    a2 = np.asarray(ra.super_resolve(lr))
    b2 = np.asarray(rb.super_resolve(lr))
    np.testing.assert_array_equal(a1, b1)
    np.testing.assert_array_equal(a2, b2)


def test_seeded_moments_and_uncertainty(resolver, lr):
    s1a, s2a = resolver.super_resolve_moments(lr, 4, seed=21)
    s1b, s2b = resolver.super_resolve_moments(lr, 4, seed=21)
    np.testing.assert_array_equal(np.asarray(s1a), np.asarray(s1b))
    np.testing.assert_array_equal(np.asarray(s2a), np.asarray(s2b))
    # explicit chunk: the chunk layout feeds the key schedule, so the
    # reproducibility contract includes it
    ua = resolver.uncertainty(lr[0], samples=4, chunk=2, seed=33)
    ub = resolver.uncertainty(lr[0], samples=4, chunk=2, seed=33)
    np.testing.assert_array_equal(np.asarray(ua["mean"]),
                                  np.asarray(ub["mean"]))
    np.testing.assert_array_equal(np.asarray(ua["std"]),
                                  np.asarray(ub["std"]))


def test_seeded_tile_endpoints_reproducible(resolver, raster):
    a = resolver.super_resolve_tile(raster, overlap=2, batch=4, seed=7)
    b = resolver.super_resolve_tile(raster, overlap=2, batch=4, seed=7)
    np.testing.assert_array_equal(a, b)
    other = resolver.super_resolve_tile(raster, overlap=2, batch=4, seed=8)
    assert not np.array_equal(a, other)
    ua = resolver.uncertainty_tile(raster, samples=3, overlap=2, batch=4,
                                   seed=7)
    ub = resolver.uncertainty_tile(raster, samples=3, overlap=2, batch=4,
                                   seed=7)
    np.testing.assert_array_equal(ua["mean"], ub["mean"])
    np.testing.assert_array_equal(ua["std"], ub["std"])


def test_seeded_stream_reproducible(resolver, raster):
    """Two seeded ``iter_tile_rows`` sweeps produce identical products —
    the property that makes an interrupted scene sweep resumable: a
    row band's draws depend only on (request seed, row index)."""
    mn = raster.min(axis=(0, 1), keepdims=True)
    norm = (raster - mn) / (raster.max(axis=(0, 1), keepdims=True) - mn + 1e-5)
    h, w = norm.shape[:2]

    def read_rows(r0, r1):
        return norm[r0:r1]

    def sweep():
        return np.concatenate([
            blk for _r0, blk in resolver.iter_tile_rows(
                read_rows, h, w, overlap=2, batch=4, seed=13)
        ])

    np.testing.assert_array_equal(sweep(), sweep())


@pytest.fixture(scope="module")
def server_pair():
    """A resolver and an HTTP server thread wrapping it (no batcher)."""
    from simple_vae_rs_tpu.server import make_server

    resolver = _make_resolver(seed=2)
    srv = make_server(resolver, port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield resolver, f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def test_remote_seeded_matches_local(server_pair, lr, raster):
    """A seeded HTTP request returns exactly what the in-process resolver
    returns for the same seed — the wire adds nothing to the draw."""
    from simple_vae_rs_tpu.client import Client

    resolver, url = server_pair
    c = Client(url, timeout=120)
    info = c.health()
    assert info["seed"] is True
    remote = c.super_resolve(lr, seed=41)
    local = np.asarray(resolver.super_resolve(lr, seed=41))
    np.testing.assert_array_equal(remote, local)
    # repeat over the wire: bitwise-stable
    np.testing.assert_array_equal(remote, c.super_resolve(lr, seed=41))
    # moments endpoint honors the seed too
    m1a, m2a = c.super_resolve_moments(lr, 3, seed=42)
    m1b, m2b = c.super_resolve_moments(lr, 3, seed=42)
    np.testing.assert_array_equal(m1a, m1b)
    np.testing.assert_array_equal(m2a, m2b)


def test_remote_tile_stitching_side_is_irrelevant(server_pair, raster):
    """The same seeded tile product comes out whether the windowing runs
    on the server (/v1/super_resolve_tile) or on the client
    (RemoteResolver + subseed per window batch) — the dispatch-seed
    derivation is shared, so replica and client agree bitwise."""
    from simple_vae_rs_tpu.client import Client

    _, url = server_pair
    c = Client(url, timeout=120)
    server_side = c.super_resolve_tile(raster, overlap=2, batch=4, seed=9)
    client_side = c.resolver().super_resolve_tile(
        raster, overlap=2, batch=4, seed=9)
    np.testing.assert_array_equal(server_side, client_side)
    # and the seeded uncertainty maps agree the same way
    s_maps = c.uncertainty_tile(raster, samples=3, overlap=2, batch=4, seed=9)
    c_maps = c.resolver().uncertainty_tile(
        raster, samples=3, overlap=2, batch=4, seed=9)
    np.testing.assert_array_equal(s_maps["mean"], c_maps["mean"])
    np.testing.assert_array_equal(s_maps["std"], c_maps["std"])


def test_old_server_guard():
    """A server that predates per-request seeds would silently ignore the
    param; the client-side resolver refuses instead of shipping a
    non-reproducible product."""
    from simple_vae_rs_tpu.client import Client, RemoteResolver, ServerError

    rr = RemoteResolver(Client("http://nowhere.invalid"), window=8,
                        moments=True, seed_support=False)
    with pytest.raises(ServerError, match="predates per-request seeds"):
        rr.super_resolve(np.zeros((1, 8, 8, 4), np.float32), seed=1)
    with pytest.raises(ServerError, match="predates per-request seeds"):
        rr.super_resolve_moments(np.zeros((1, 8, 8, 4), np.float32), 2,
                                 seed=1)


def test_batcher_bypass_keeps_seeded_requests_reproducible(lr):
    """With dynamic micro-batching ON, seeded requests dispatch privately
    (a merged batch shares one draw) and stay bitwise-reproducible."""
    from simple_vae_rs_tpu.client import Client
    from simple_vae_rs_tpu.server import make_server

    resolver = _make_resolver(seed=8)
    srv = make_server(resolver, port=0, dynamic_batch_ms=5.0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_address[1]}", timeout=120)
        a = c.super_resolve(lr, seed=77)
        b = c.super_resolve(lr, seed=77)
        np.testing.assert_array_equal(a, b)
        # unseeded requests still ride the batcher path and work
        assert c.super_resolve(lr).shape == a.shape
    finally:
        srv.shutdown()
        srv.server_close()


def test_artifact_seeded_reproducible(tmp_path):
    """ExportedResolver: seed pins the draws through the re-batching loop
    (B > exported batch exercises the per-dispatch fold_in) and seeded
    calls leave the rolling key untouched."""
    from simple_vae_rs_tpu.export import export_resolver, load_exported

    resolver = _make_resolver(seed=1)
    path = str(tmp_path / "m.svrs")
    export_resolver(resolver, path, batch=4, platforms=("cpu",))
    esr = load_exported(path, seed=0)
    y = np.random.default_rng(9).random((6, 8, 8, 4)).astype(np.float32)
    a = np.asarray(esr.super_resolve(y, seed=19))
    esr.super_resolve(y)  # unseeded traffic in between
    b = np.asarray(esr.super_resolve(y, seed=19))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, np.asarray(esr.super_resolve(y, seed=20)))
    m1a, m2a = esr.super_resolve_moments(y, 3, seed=23)
    m1b, m2b = esr.super_resolve_moments(y, 3, seed=23)
    np.testing.assert_array_equal(m1a, m1b)
    np.testing.assert_array_equal(m2a, m2b)
    ua = esr.uncertainty(y[0], samples=5, seed=29)
    ub = esr.uncertainty(y[0], samples=5, seed=29)
    np.testing.assert_array_equal(ua["mean"], ub["mean"])
    # rolling-state isolation: a twin that served no seeded traffic
    # produces the same unseeded sequence
    twin = load_exported(path, seed=0)
    twin_first = np.asarray(twin.super_resolve(y))
    fresh = load_exported(path, seed=0)
    fresh.super_resolve(y, seed=19)
    fresh_first = np.asarray(fresh.super_resolve(y))
    np.testing.assert_array_equal(twin_first, fresh_first)


def test_seeded_meshed_matches_single_chip(lr):
    """Seed + mesh: the reparameterization noise is drawn globally and
    each shard consumes its slice (serve._sr_call), so a seeded request
    answers identically on a meshed and a single-chip resolver — replicas
    of different topology agree on seeded products."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    single = SuperResolver(model, variables, seed=0)
    meshed = SuperResolver(model, variables, seed=123,  # seed must not matter
                           mesh=make_mesh(MeshConfig(data=8, model=1)))
    wins = np.random.default_rng(10).random((8, 8, 8, 4)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(single.super_resolve(wins, seed=51)),
        np.asarray(meshed.super_resolve(wins, seed=51)),
        rtol=0, atol=1e-6,
    )
    s1a, s2a = single.super_resolve_moments(wins, 3, seed=52)
    s1b, s2b = meshed.super_resolve_moments(wins, 3, seed=52)
    np.testing.assert_allclose(np.asarray(s1a), np.asarray(s1b),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(s2a), np.asarray(s2b),
                               rtol=0, atol=1e-6)
