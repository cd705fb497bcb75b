"""Pipelined remote posts: the RemoteResolver keeps window-batch POSTs in
flight so upload/serialization of batch k+1 overlaps server compute on
batch k (the relay link is the measured serving bottleneck — one blocking
POST per batch pays transfer + compute end-to-end).

Covers: overlap actually happens (latency-injected fake client), products
are identical to strictly-serial posts (seeded, against a real local
server), and the ``--no_moments`` masking contract still routes around the
async hooks. The reference has no serving client at all
(``/root/reference/train.py:54-59`` is its whole inference story).
"""

import threading
import time

import numpy as np
import pytest

from simple_vae_rs_tpu.client import RemoteResolver, _Deferred
from simple_vae_rs_tpu.tiling import TileEndpoints


class _SlowClient:
    """Fake ``client.Client``: fixed per-POST latency, zero compute.

    ``sleep`` stands in for the wire + server round trip; it releases the
    GIL exactly like socket IO does, so the overlap measured here is the
    overlap a real link sees. Tracks peak concurrency to prove posts
    genuinely run in parallel rather than merely being queued.
    """

    def __init__(self, delay: float) -> None:
        self.delay = delay
        self.calls = 0
        self.moments_calls = 0
        self._live = 0
        self.peak_live = 0
        self._lock = threading.Lock()

    def _enter(self):
        with self._lock:
            self._live += 1
            self.peak_live = max(self.peak_live, self._live)

    def _exit(self):
        with self._lock:
            self._live -= 1

    @staticmethod
    def _fake_sr(lr, seed):
        # deterministic function of input + seed so stitched outputs are
        # comparable across serial/pipelined runs
        b = np.asarray(lr, np.float32)
        up = np.repeat(np.repeat(b, 2, axis=1), 2, axis=2)
        return up + (0.0 if seed is None else 1e-3 * (seed % 97))

    def super_resolve(self, lr, normalize=None, seed=None):
        self._enter()
        try:
            with self._lock:
                self.calls += 1
            time.sleep(self.delay)
            return self._fake_sr(lr, seed)
        finally:
            self._exit()

    def super_resolve_moments(self, wins, samples, normalize=False,
                              seed=None):
        self._enter()
        try:
            with self._lock:
                self.moments_calls += 1
            time.sleep(self.delay)
            sr = self._fake_sr(wins, seed)
            return sr * samples, (sr ** 2) * samples
        finally:
            self._exit()


def _resolver(client, pipeline):
    return RemoteResolver(client, window=8, normalize=False, moments=True,
                          seed_support=True, pipeline=pipeline)


def test_pipelined_posts_overlap_and_match_serial():
    delay = 0.08
    raster = np.random.default_rng(0).random((16, 16, 4)).astype(np.float32)

    serial_client = _SlowClient(delay)
    t0 = time.perf_counter()
    serial = _resolver(serial_client, pipeline=0).super_resolve_tile(
        raster, batch=1, seed=5)
    t_serial = time.perf_counter() - t0

    piped_client = _SlowClient(delay)
    piped_resolver = _resolver(piped_client, pipeline=4)
    t0 = time.perf_counter()
    piped = piped_resolver.super_resolve_tile(raster, batch=1, seed=5)
    t_piped = time.perf_counter() - t0

    # identical window grid -> identical POST count; seeded dispatches are
    # position-derived so the stitched products are bitwise equal
    assert piped_client.calls == serial_client.calls == 9  # 3x3 windows
    np.testing.assert_array_equal(piped, serial)
    # overlap is real: posts ran concurrently and the sweep finished in
    # well under the serial sum (9 posts / 4 in flight ~= 3 rounds)
    assert piped_client.peak_live >= 3
    assert serial_client.peak_live == 1
    assert t_piped < 0.7 * t_serial, (t_piped, t_serial)
    piped_resolver.close()


def test_pipelined_moments_hook_overlap_and_masking():
    delay = 0.06
    raster = np.random.default_rng(1).random((16, 16, 4)).astype(np.float32)

    client = _SlowClient(delay)
    r = _resolver(client, pipeline=4)
    maps = r.uncertainty_tile(raster, samples=4, batch=1, seed=9)
    assert client.moments_calls == 9 and client.peak_live >= 3
    assert set(maps) == {"mean", "std", "variance"}

    serial = _resolver(_SlowClient(delay), pipeline=0).uncertainty_tile(
        raster, samples=4, batch=1, seed=9)
    for k in maps:
        np.testing.assert_allclose(maps[k], serial[k], atol=1e-6)

    # --no_moments masking: a None sync hook must silence the async
    # variant too (the capability switch is the sync attribute)
    masked_client = _SlowClient(delay)
    masked = _resolver(masked_client, pipeline=4)
    masked.super_resolve_moments = None
    masked.uncertainty_tile(raster, samples=2, batch=4, seed=9)
    assert masked.super_resolve_moments_async is not None  # still defined
    assert masked_client.moments_calls == 0  # ... but never used
    assert masked_client.calls > 0  # packing fallback carried the draws


def test_deferred_surfaces_post_errors_at_fetch():
    class Boom:
        def super_resolve(self, lr, normalize=None, seed=None):
            raise RuntimeError("post exploded")

    r = _resolver(Boom(), pipeline=2)
    pending = r.super_resolve_async(np.zeros((1, 8, 8, 4), np.float32))
    assert isinstance(pending, _Deferred)
    with pytest.raises(RuntimeError, match="post exploded"):
        np.asarray(pending)


def test_pipelined_equality_against_real_server():
    """Seeded whole-raster products are identical with and without
    pipelining against a real local server (ThreadingHTTPServer handles
    the concurrent posts; per-dispatch seeds make order irrelevant)."""
    import jax
    import jax.numpy as jnp

    from simple_vae_rs_tpu.client import Client
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.serve import SuperResolver
    from simple_vae_rs_tpu.server import make_server

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    srv = make_server(SuperResolver(model, variables, seed=3), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_address[1]}", timeout=120)
        raster = np.random.default_rng(2).random((20, 22, 4)).astype(
            np.float32)
        piped = c.resolver()
        assert isinstance(piped, RemoteResolver) and piped._pool is not None
        serial = c.resolver(pipeline=0)
        assert serial._pool is None
        np.testing.assert_array_equal(
            piped.super_resolve_tile(raster, batch=4, seed=11),
            serial.super_resolve_tile(raster, batch=4, seed=11),
        )
        a = piped.uncertainty_tile(raster, samples=3, batch=4, seed=11)
        b = serial.uncertainty_tile(raster, samples=3, batch=4, seed=11)
        for k in a:
            np.testing.assert_array_equal(a[k], b[k])
        piped.close()
    finally:
        srv.shutdown()


def test_local_resolver_has_no_async_hooks():
    """The mixin's dispatch resolution must leave local (JAX) resolvers on
    their plain methods — their async overlap comes from JAX dispatch."""
    class Plain(TileEndpoints):
        window = 8
        normalize = False

        def super_resolve(self, lr, normalize=None):
            b = np.asarray(lr, np.float32)
            return np.repeat(np.repeat(b, 2, axis=1), 2, axis=2)

    p = Plain()
    assert p._dispatch_fn() == p.super_resolve
    assert p._moments_hook() is None
    out = p.super_resolve_tile(np.zeros((16, 16, 4), np.float32), batch=4)
    assert out.shape == (32, 32, 4)
