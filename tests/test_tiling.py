"""Tile serving: grid placement, feathered stitch, SuperResolver tile path.

The reference has no whole-raster inference (patches only —
``/root/reference/dataset.py:60-77``, ``models/base.py:306-348``); these
tests pin the rebuild's tile path: exact reconstruction through the blend,
flush grid coverage, and the resolver endpoint on non-multiple sizes.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.ops.tiling import feather_profile, grid_starts, stitch
from simple_vae_rs_tpu.serve import SuperResolver


# ------------------------------------------------------------- pure logic
def test_grid_starts_covers_flush():
    starts = grid_starts(20, 8, 6)
    assert starts[0] == 0 and starts[-1] == 20 - 8
    covered = np.zeros(20, bool)
    for s in starts:
        covered[s:s + 8] = True
    assert covered.all()
    # exact fit -> no extra window
    assert grid_starts(16, 8, 8) == [0, 8]
    with pytest.raises(ValueError):
        grid_starts(4, 8, 8)  # patch larger than extent
    with pytest.raises(ValueError):
        grid_starts(16, 8, 0)


def test_feather_profile_seam_partition():
    # across a standard seam (stride = patch - overlap) the two ramps sum to 1
    p, ov = 12, 4
    w = feather_profile(p, ov)
    assert w.dtype == np.float32 and (w > 0).all()
    seam = w[p - ov:] + w[:ov]
    np.testing.assert_allclose(seam, 1.0, rtol=1e-6)
    assert (feather_profile(p, 0) == 1.0).all()


@pytest.mark.parametrize("overlap", [0, 2, 3])
def test_stitch_reconstructs_crops_exactly(overlap):
    """Windows that are crops of one image stitch back to that image,
    whatever the overlap — the blend only acts where windows disagree."""
    rng = np.random.default_rng(0)
    img = rng.random((22, 31, 3)).astype(np.float32)
    p = 8
    stride = p - overlap if overlap else p
    starts = [
        (a, b)
        for a in grid_starts(22, p, stride)
        for b in grid_starts(31, p, stride)
    ]
    wins = np.stack([img[a:a + p, b:b + p] for a, b in starts])
    out = stitch(wins, starts, (22, 31), overlap)
    np.testing.assert_allclose(out, img, rtol=1e-5, atol=1e-6)


def test_stitch_rejects_gaps_and_bad_shapes():
    wins = np.zeros((1, 8, 8, 3), np.float32)
    with pytest.raises(ValueError):
        stitch(wins, [(0, 0)], (20, 8), 0)  # rows 8..20 uncovered
    with pytest.raises(ValueError):
        stitch(wins, [(0, 4)], (8, 8), 0)  # window off the edge
    with pytest.raises(ValueError):
        stitch(np.zeros((1, 8, 4, 3), np.float32), [(0, 0)], (8, 4), 0)


# -------------------------------------------------------- resolver path
def _make_resolver(seed=0):
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    return SuperResolver(model, variables, seed=seed)


@pytest.fixture(scope="module")
def resolver():
    return _make_resolver()


def test_tile_shapes_and_range(resolver):
    lr = np.random.default_rng(3).random((20, 36, 4)).astype(np.float32) * 700
    out = resolver.super_resolve_tile(lr, overlap=2, batch=4)
    assert out.shape == (40, 72, 4)
    assert np.isfinite(out).all()
    assert 0.0 <= out.min() and out.max() <= 1.0


def test_tile_smaller_than_window_pads(resolver):
    lr = np.random.default_rng(4).random((6, 10, 4)).astype(np.float32)
    out = resolver.super_resolve_tile(lr, overlap=0)
    assert out.shape == (12, 20, 4)
    assert np.isfinite(out).all()


def test_tile_single_window_matches_direct_call():
    """A window-sized raster goes through tiling (tile-level normalize,
    one batch, trivial stitch) and must equal the plain endpoint."""
    lr = np.random.default_rng(5).random((8, 8, 4)).astype(np.float32) * 100
    direct = np.asarray(_make_resolver(seed=7).super_resolve(lr))[0]
    tiled = _make_resolver(seed=7).super_resolve_tile(lr, overlap=0, batch=1)
    np.testing.assert_allclose(tiled, direct, rtol=1e-5, atol=1e-6)


def test_tile_multi_sample_average_is_smoother(resolver):
    lr = np.random.default_rng(6).random((12, 12, 4)).astype(np.float32)
    one = resolver.super_resolve_tile(lr, overlap=2, samples=1)
    avg = resolver.super_resolve_tile(lr, overlap=2, samples=4)
    assert avg.shape == one.shape
    # averaged draws differ from any single draw and are finite
    assert np.isfinite(avg).all() and not np.allclose(avg, one)


def test_tile_meshed_matches_single_device():
    """Tile serving over the 8-virtual-device mesh: windows shard over
    ``data`` inside each batch call and the stitched raster equals the
    single-device resolver's exactly (globally-drawn eps)."""
    from simple_vae_rs_tpu.config import MeshConfig
    from simple_vae_rs_tpu.parallel.mesh import make_mesh

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    lr = np.random.default_rng(8).random((14, 22, 4)).astype(np.float32)
    single = SuperResolver(model, variables, seed=9)
    meshed = SuperResolver(
        model, variables, seed=9, mesh=make_mesh(MeshConfig(data=8, model=1))
    )
    a = single.super_resolve_tile(lr, overlap=2, batch=8)
    b = meshed.super_resolve_tile(lr, overlap=2, batch=8)
    assert b.shape == (28, 44, 4)
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


def test_tile_argument_validation(resolver):
    lr = np.zeros((12, 12, 4), np.float32)
    with pytest.raises(ValueError):
        resolver.super_resolve_tile(lr, overlap=7)  # > lr_window // 2
    with pytest.raises(ValueError):
        resolver.super_resolve_tile(lr, samples=0)
    with pytest.raises(ValueError):
        resolver.super_resolve_tile(np.zeros((2, 12, 12, 4), np.float32))
    with pytest.raises(ValueError):
        resolver.uncertainty_tile(lr, samples=1)  # variance needs >= 2
    with pytest.raises(ValueError):
        resolver.super_resolve_tile(lr, batch=0)


def test_uncertainty_tile_maps(resolver):
    lr = np.random.default_rng(9).random((14, 20, 4)).astype(np.float32) * 50
    maps = resolver.uncertainty_tile(lr, samples=6, overlap=2, batch=4)
    assert maps["mean"].shape == (28, 40, 4)
    assert maps["std"].shape == (28, 40, 4)
    assert (maps["variance"] >= 0).all()
    np.testing.assert_allclose(
        maps["std"], np.sqrt(maps["variance"]), rtol=1e-6
    )
    # posterior draws genuinely vary -> nonzero spread somewhere
    assert float(maps["std"].max()) > 0.0
    assert np.isfinite(maps["mean"]).all()


def test_uncertainty_tile_single_window_matches_moments():
    """On a window-sized raster the stitched moments reduce to plain
    per-pixel sample moments: the tile path's one hook dispatch is the
    window padded to the batch, so a fresh same-seed resolver's
    ``super_resolve_moments`` on exactly that batch reproduces the sums
    (the stitch over a single window must not perturb them)."""
    lr = np.random.default_rng(10).random((8, 8, 4)).astype(np.float32)
    a = _make_resolver(seed=11)
    maps = a.uncertainty_tile(lr, samples=5, overlap=0, batch=5)
    mn = lr.min((0, 1), keepdims=True)
    mx = lr.max((0, 1), keepdims=True)
    norm = (lr - mn) / (mx - mn + 1e-5)
    b = _make_resolver(seed=11)
    # the mixin pads the 1-window chunk to the batch by repeating it
    s1, s2 = b.super_resolve_moments(np.repeat(norm[None], 5, axis=0), 5)
    m1 = np.asarray(s1, np.float32)[0] / 5
    m2 = np.asarray(s2, np.float32)[0] / 5
    np.testing.assert_allclose(maps["mean"], m1, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(maps["variance"],
                               np.maximum(m2 - m1 * m1, 0.0),
                               rtol=1e-5, atol=1e-7)


def test_uncertainty_tile_one_dispatch_per_window_batch(resolver,
                                                        monkeypatch):
    """With the device-moments hook, 4 windows x 8 draws at batch=16 is
    ONE dispatch returning two moment maps — draws never cross the link
    and ``super_resolve`` is never consulted."""
    calls, sr_calls = [], []
    orig = type(resolver).super_resolve_moments

    def counting(self, y, samples, normalize=False):
        calls.append((np.asarray(y).shape, samples))
        return orig(self, y, samples, normalize=normalize)

    monkeypatch.setattr(type(resolver), "super_resolve_moments", counting)
    monkeypatch.setattr(
        type(resolver), "super_resolve",
        lambda self, y, normalize=None: sr_calls.append(1),
    )
    lr = np.random.default_rng(13).random((16, 16, 4)).astype(np.float32)
    maps = resolver.uncertainty_tile(lr, samples=8, overlap=0, batch=16)
    assert maps["mean"].shape == (32, 32, 4)
    assert calls == [((16, 8, 8, 4), 8)] and not sr_calls


def test_uncertainty_tile_fallback_packs_draws_into_batches(resolver,
                                                            monkeypatch):
    """Resolvers WITHOUT the moments hook (remote/artifact) pack
    (window, draw) pairs into shared batch slots: 4 windows x 8 draws at
    batch=16 is 2 dispatches, not 8 passes of 1."""
    calls = []
    orig = type(resolver).super_resolve

    def counting(self, y, normalize=None):
        calls.append(np.asarray(y).shape)
        return orig(self, y, normalize=normalize)

    monkeypatch.setattr(type(resolver), "super_resolve", counting)
    monkeypatch.setattr(type(resolver), "super_resolve_moments", None)
    lr = np.random.default_rng(13).random((16, 16, 4)).astype(np.float32)
    maps = resolver.uncertainty_tile(lr, samples=8, overlap=0, batch=16)
    assert maps["mean"].shape == (32, 32, 4)
    assert len(calls) == 2 and all(s == (16, 8, 8, 4) for s in calls)


def test_tile_default_overlap_adapts_to_small_windows():
    """overlap=None resolves to min(4, window//2), so defaults stay valid
    for small-patch models (window 8 -> overlap 4 allowed; explicit 5 not)."""
    r = _make_resolver()
    lr = np.random.default_rng(14).random((10, 12, 4)).astype(np.float32)
    out = r.super_resolve_tile(lr)  # default overlap must not raise
    assert out.shape == (20, 24, 4)
    with pytest.raises(ValueError):
        r.super_resolve_tile(lr, overlap=5)


def test_latent_override_rejects_negative():
    with pytest.raises(ValueError):
        CondSRVAEConfig(latent_size_override=-13568)
