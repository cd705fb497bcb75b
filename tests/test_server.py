"""HTTP model server: endpoints, both body encodings, error paths."""

import io
import json
import threading
import urllib.request
import urllib.error

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.serve import SuperResolver
from simple_vae_rs_tpu.server import make_server


@pytest.fixture(scope="module")
def server_url():
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    resolver = SuperResolver(model, variables, seed=4)
    srv = make_server(resolver, port=0)  # ephemeral port
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post(url, body, ctype):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers={"Content-Type": ctype})
    with urllib.request.urlopen(req, timeout=120) as resp:
        return resp.read(), resp.headers.get("Content-Type")


def test_client_roundtrip(server_url):
    """The stdlib Client drives every endpoint: binary npy bodies
    throughout (options ride the query string), error surfacing."""
    from simple_vae_rs_tpu.client import Client, ServerError

    c = Client(server_url, timeout=120)
    assert c.health()["status"] == "ok"
    lr = np.random.default_rng(11).random((2, 8, 8, 4)).astype(np.float32)
    sr = c.super_resolve(lr)  # npy body -> npy response
    assert sr.shape == (2, 16, 16, 4)
    raster = np.random.default_rng(12).random((10, 14, 4)).astype(np.float32)
    big = c.super_resolve_tile(raster, overlap=2, batch=4)  # npy + query opts
    assert big.shape == (20, 28, 4)
    maps = c.uncertainty(lr[0], samples=3, chunk=3)
    assert set(maps) == {"mean", "std", "variance"}
    assert maps["mean"].shape == (16, 16, 4)
    tile_maps = c.uncertainty_tile(raster, samples=3, overlap=2, batch=4)
    assert tile_maps["mean"].shape == (20, 28, 4)
    # option-less calls take the npy fast path end to end (npz decode
    # for the multi-array uncertainty response)
    big2 = c.super_resolve_tile(raster)
    assert big2.shape == (20, 28, 4)
    maps2 = c.uncertainty(lr[0])
    assert set(maps2) == {"mean", "std", "variance"}
    tile2 = c.uncertainty_tile(raster, samples=3)  # npy + one query opt
    assert set(tile2) == {"mean", "std", "variance"}
    with pytest.raises(ServerError, match="404"):
        c._request("/v1/nope", b"{}")


def test_metrics_endpoint_counts_requests():
    """GET /metrics exposes per-endpoint counters + latency histograms in
    the Prometheus text format (fresh server so counts are exact)."""
    import threading

    from simple_vae_rs_tpu.client import Client, ServerError

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    srv = make_server(SuperResolver(model, variables), port=0)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        c = Client(url, timeout=120, retries=0)
        lr = np.zeros((2, 8, 8, 4), np.float32)
        c.super_resolve(lr)
        c.super_resolve(lr)
        with pytest.raises(ServerError):  # malformed body -> 400
            c._request("/v1/super_resolve", b"not json", "application/json")
        with urllib.request.urlopen(url + "/metrics", timeout=30) as resp:
            assert resp.headers["Content-Type"].startswith("text/plain")
            text = resp.read().decode()
    finally:
        srv.shutdown()
    assert ('svrs_requests_total{endpoint="/v1/super_resolve",'
            'outcome="ok"} 2') in text
    assert ('svrs_requests_total{endpoint="/v1/super_resolve",'
            'outcome="error"} 1') in text
    assert ('svrs_request_duration_seconds_bucket{endpoint='
            '"/v1/super_resolve",le="+Inf"} 3') in text
    assert ('svrs_request_duration_seconds_count{endpoint='
            '"/v1/super_resolve"} 3') in text


def test_bearer_token_guards_model_endpoints():
    """--token requires Authorization on /v1/* (401 otherwise); healthz
    and metrics stay open for probes and scrapers."""
    import threading

    from simple_vae_rs_tpu.client import Client, ServerError

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    srv = make_server(SuperResolver(model, variables), port=0,
                      token="s3cret")
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        lr = np.zeros((1, 8, 8, 4), np.float32)
        anon = Client(url, timeout=60, retries=0)
        assert anon.health()["status"] == "ok"  # open
        with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
            assert r.status == 200  # open
        with pytest.raises(ServerError, match="401"):
            anon.super_resolve(lr)
        with pytest.raises(ServerError, match="401"):
            Client(url, timeout=60, retries=0,
                   token="wrong").super_resolve(lr)
        authed = Client(url, timeout=60, retries=0, token="s3cret")
        assert authed.super_resolve(lr).shape == (1, 16, 16, 4)
    finally:
        srv.shutdown()


def test_oversized_body_is_refused_with_413():
    """A body over --max_body_mb is refused BEFORE it is read (an
    oversized raster would OOM the host before the model ran)."""
    import threading

    from simple_vae_rs_tpu.client import Client, ServerError

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    srv = make_server(SuperResolver(model, variables), port=0, max_body_mb=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        c = Client(url, timeout=60, retries=0)
        small = np.zeros((1, 8, 8, 4), np.float32)
        assert c.super_resolve(small).shape == (1, 16, 16, 4)
        big = np.zeros((2000, 8, 8, 4), np.float32)  # ~2 MiB body
        with pytest.raises(ServerError, match="413 .*exceeds"):
            c.super_resolve(big)
    finally:
        srv.shutdown()


def test_client_retries_transient_failures():
    """One 500 (or connection reset) must not kill a scene sweep: the
    client retries with backoff and the second attempt serves the reply.
    4xx and exhausted retries surface as ServerError."""
    import threading
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from simple_vae_rs_tpu.client import Client, ServerError

    calls = {"n": 0}

    class Flaky(BaseHTTPRequestHandler):
        def do_GET(self):
            calls["n"] += 1
            if self.path != "/healthz":
                self.send_response(404)
                self.end_headers()
                self.wfile.write(b'{"error": "no such route"}')
                return
            if calls["n"] == 1:
                self.send_response(500)
                self.end_headers()
                self.wfile.write(b'{"error": "transient"}')
                return
            body = json.dumps({"status": "ok"}).encode()
            self.send_response(200)
            self.send_header("Content-Type", "application/json")
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):
            pass

    srv = ThreadingHTTPServer(("127.0.0.1", 0), Flaky)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        c = Client(f"http://127.0.0.1:{srv.server_address[1]}",
                   timeout=30, retries=2, backoff=0.01)
        assert c.health()["status"] == "ok"  # 500 then 200
        assert calls["n"] == 2
        # a 404 is the caller's bug: surfaced immediately, never retried
        before = calls["n"]
        with pytest.raises(ServerError, match="404"):
            c._request("/nope")
        assert calls["n"] == before + 1
    finally:
        srv.shutdown()
    # connection refused (nothing listening) exhausts retries quickly
    dead = Client("http://127.0.0.1:9", timeout=1, retries=1, backoff=0.01)
    with pytest.raises(ServerError, match="after 2 attempt"):
        dead.health()


def test_healthz(server_url):
    with urllib.request.urlopen(server_url + "/healthz", timeout=30) as resp:
        info = json.loads(resp.read())
    assert info["status"] == "ok"
    assert info["model"] == "CondSRVAE"
    assert info["patch_size"] == 16
    assert info["int8"] is False
    assert info["moments"] is True  # live resolver: device-moments hook


def test_super_resolve_moments_endpoint(server_url):
    """One POST returns a window batch's draw statistics as two moment
    maps (npz body both ways); per-pixel variance derived from them is
    non-negative."""
    from simple_vae_rs_tpu.client import Client

    c = Client(server_url, timeout=120)
    lr = np.random.default_rng(21).random((3, 8, 8, 4)).astype(np.float32)
    s1, s2 = c.super_resolve_moments(lr, samples=4)
    assert s1.shape == (3, 16, 16, 4) and s2.shape == (3, 16, 16, 4)
    mean = s1 / 4
    var = s2 / 4 - mean * mean
    assert float(var.min()) >= -1e-5 and np.isfinite(var).all()


def test_remote_resolver_streams_uq_via_moments(server_url):
    """``Client.resolver()`` picks the capability off ``/healthz``:
    whole-raster UQ posts ONE moments request per window batch — draws
    never cross the wire and ``/v1/super_resolve`` is never consulted.
    Without the capability the hook is masked (packing fallback)."""
    from simple_vae_rs_tpu.client import Client, RemoteResolver

    c = Client(server_url, timeout=120)
    rr = c.resolver()
    assert callable(rr.super_resolve_moments)

    moment_calls, sr_calls = [], []
    orig = c.super_resolve_moments

    def counting(lr, samples, normalize=False):
        moment_calls.append((np.asarray(lr).shape, samples))
        return orig(lr, samples, normalize=normalize)

    c.super_resolve_moments = counting
    c.super_resolve = lambda lr, normalize=None: sr_calls.append(1)
    lr = np.random.default_rng(22).random((16, 16, 4)).astype(np.float32)
    maps = rr.uncertainty_tile(lr, samples=6, overlap=0, batch=16)
    assert maps["mean"].shape == (32, 32, 4)
    assert (maps["variance"] >= 0).all()
    assert moment_calls == [((16, 8, 8, 4), 6)] and not sr_calls

    legacy = RemoteResolver(c, window=8, moments=False)
    assert legacy.super_resolve_moments is None


def test_super_resolve_json(server_url):
    lr = np.random.default_rng(0).random((2, 8, 8, 4)).tolist()
    out, ctype = _post(
        server_url + "/v1/super_resolve",
        json.dumps({"lr": lr}).encode(),
        "application/json",
    )
    assert ctype.startswith("application/json")
    sr = np.asarray(json.loads(out)["sr"])
    assert sr.shape == (2, 16, 16, 4)
    assert (sr >= 0).all() and (sr <= 1).all()


def test_super_resolve_npy(server_url):
    lr = np.random.default_rng(1).random((3, 8, 8, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, lr)
    out, ctype = _post(
        server_url + "/v1/super_resolve", buf.getvalue(), "application/x-npy"
    )
    assert ctype.startswith("application/x-npy")
    sr = np.load(io.BytesIO(out))
    assert sr.shape == (3, 16, 16, 4)


def test_super_resolve_tile_json(server_url):
    lr = np.random.default_rng(7).random((12, 20, 4)).tolist()
    out, ctype = _post(
        server_url + "/v1/super_resolve_tile",
        json.dumps({"lr": lr, "overlap": 2, "batch": 4}).encode(),
        "application/json",
    )
    assert ctype.startswith("application/json")
    sr = np.asarray(json.loads(out)["sr"])
    assert sr.shape == (24, 40, 4)
    assert np.isfinite(sr).all()


def test_uncertainty_tile_json(server_url):
    lr = np.random.default_rng(8).random((10, 14, 4)).tolist()
    out, ctype = _post(
        server_url + "/v1/uncertainty_tile",
        json.dumps({"lr": lr, "samples": 3, "overlap": 2, "batch": 4}).encode(),
        "application/json",
    )
    maps = json.loads(out)
    assert set(maps) == {"mean", "std", "variance"}
    mean = np.asarray(maps["mean"])
    assert mean.shape == (20, 28, 4)
    assert (np.asarray(maps["variance"]) >= 0).all()


def test_uncertainty_json(server_url):
    lr = np.random.default_rng(2).random((8, 8, 4)).tolist()
    out, _ = _post(
        server_url + "/v1/uncertainty",
        json.dumps({"lr": lr, "samples": 4, "chunk": 2}).encode(),
        "application/json",
    )
    maps = json.loads(out)
    assert set(maps) == {"mean", "std", "variance"}
    assert np.asarray(maps["mean"]).shape == (16, 16, 4)
    assert (np.asarray(maps["variance"]) >= 0).all()


def test_uncertainty_npz(server_url):
    lr = np.random.default_rng(3).random((8, 8, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, lr)
    out, ctype = _post(
        server_url + "/v1/uncertainty", buf.getvalue(), "application/x-npy"
    )
    assert ctype.startswith("application/x-npz")
    maps = np.load(io.BytesIO(out))
    assert maps["std"].shape == (16, 16, 4)


def test_error_paths(server_url):
    # bad JSON
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/super_resolve", b"{not json", "application/json")
    assert e.value.code == 400
    # missing field
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/super_resolve", b"{}", "application/json")
    assert e.value.code == 400
    # unknown route
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/nope", b"{}", "application/json")
    assert e.value.code == 404
    # negative seed: one rule on every endpoint (tile sweeps would reject
    # it deep inside subseed anyway) -> clean 400
    lr = np.random.default_rng(9).random((8, 8, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.save(buf, lr)
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/super_resolve?seed=-1", buf.getvalue(),
              "application/x-npy")
    assert e.value.code == 400


def test_query_string_options_with_npy_body(server_url):
    """Options on the query string compose with the binary npy body (the
    typed client's encoding for optioned calls); JSON body fields win
    over query params."""
    import io as _io

    lr = np.random.default_rng(31).random((8, 8, 4)).astype(np.float32)
    buf = _io.BytesIO()
    np.save(buf, lr)
    out, ctype = _post(
        server_url + "/v1/uncertainty?samples=3&chunk=3",
        buf.getvalue(), "application/x-npy",
    )
    assert ctype.startswith("application/x-npz")
    with np.load(_io.BytesIO(out)) as z:
        assert set(z.files) == {"mean", "std", "variance"}
        assert z["mean"].shape == (16, 16, 4)

    # JSON body value beats the query param: samples=2 in body is accepted
    # even with samples=9999 in the query (which would be slow/huge)
    body = json.dumps({"lr": lr.tolist(), "samples": 2, "chunk": 2}).encode()
    out, ctype = _post(
        server_url + "/v1/uncertainty?samples=4&chunk=2",
        body, "application/json",
    )
    maps = json.loads(out)
    assert np.asarray(maps["mean"]).shape == (16, 16, 4)


def test_raster_cli_remote_mode(server_url, tmp_path):
    """python -m simple_vae_rs_tpu.raster --url drives a live server:
    TIFF in -> SR TIFF out with no local model."""
    from simple_vae_rs_tpu import raster
    from simple_vae_rs_tpu.data.tiffio import read_tiff, write_tiff

    lr = (np.random.default_rng(21).random((12, 14, 4)) * 500).astype(
        np.uint16
    )
    src, dst = str(tmp_path / "lr.tif"), str(tmp_path / "sr.tif")
    write_tiff(src, lr)
    raster.main([src, dst, "--url", server_url, "--batch", "4"])
    out = read_tiff(dst)
    assert out.shape == (24, 28, 4)
    assert out.dtype == np.uint16


def test_concurrent_requests_serialize_cleanly(server_url):
    lr = json.dumps(
        {"lr": np.random.default_rng(4).random((1, 8, 8, 4)).tolist()}
    ).encode()
    results = []

    def hit():
        out, _ = _post(server_url + "/v1/super_resolve", lr, "application/json")
        results.append(np.asarray(json.loads(out)["sr"]).shape)

    threads = [threading.Thread(target=hit) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert results == [(1, 16, 16, 4)] * 4


# ------------------------------------------------------ device health probe
def test_device_prober_reports_ok_on_healthz_and_metrics():
    """--probe_device: the resident heartbeat lands on /healthz (device
    ok/latency/age) and /metrics (svrs_device_probe_*); healthy backend
    -> status stays 'ok'."""
    import time
    import urllib.request

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    resolver = SuperResolver(model, variables)
    srv = make_server(resolver, port=0, probe_device_s=0.2)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        health = None
        for _ in range(100):  # first heartbeat: one trivial CPU dispatch
            with urllib.request.urlopen(url + "/healthz", timeout=30) as r:
                health = json.loads(r.read())
            if health["device"]["latency_ms"] is not None:
                break
            time.sleep(0.1)
        assert health["status"] == "ok"
        assert health["device"]["ok"] is True
        assert health["device"]["latency_ms"] is not None
        with urllib.request.urlopen(url + "/metrics", timeout=30) as r:
            text = r.read().decode()
        assert "svrs_device_probe_ok 1" in text
        assert "svrs_device_probe_age_seconds" in text
    finally:
        srv.shutdown()
        srv.server_close()


def test_degraded_healthz_returns_503_with_parseable_body():
    """HTTP-code-based readiness probes (k8s httpGet: any 2xx = ready)
    must see a wedged replica: degraded /healthz answers 503 — and
    Client.health() still parses the body for capability discovery."""
    import urllib.error
    import urllib.request

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    resolver = SuperResolver(model, variables)
    srv = make_server(resolver, port=0)

    class Degraded:
        def status(self):
            return {"ok": False, "latency_ms": 1.0, "age_s": 99.0}

        def close(self):
            pass

    # reach the service through the bound handler class
    srv.RequestHandlerClass.service.prober = Degraded()
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(url + "/healthz", timeout=30)
        assert ei.value.code == 503
        body = json.loads(ei.value.read())
        assert body["status"] == "degraded"
        from simple_vae_rs_tpu.client import Client

        info = Client(url, retries=0).health()
        assert info["status"] == "degraded"
        assert info["device"]["ok"] is False
    finally:
        srv.shutdown()
        srv.server_close()


def test_device_prober_stale_heartbeat_degrades():
    """A wedged link blocks the probe dispatch forever; the heartbeat
    ages past stale_after and status() flips ok=False — the signal that
    turns /healthz 'degraded' so orchestrators rotate the replica out."""
    import time

    from simple_vae_rs_tpu.server import DeviceProber

    release = threading.Event()

    class Wedged(DeviceProber):
        def __init__(self):
            self._beats = 0
            super().__init__(0.05)
            self.stale_after = 0.5  # test-scale staleness

        def _dispatch(self):
            if self._beats == 0:
                self._beats = 1
                return  # one healthy heartbeat, then the link wedges
            release.wait()  # blocks the loop thread, like a wedged RPC

    p = Wedged()
    try:
        deadline = time.monotonic() + 10.0
        while time.monotonic() < deadline:
            st = p.status()
            if st["latency_ms"] is not None and not st["ok"]:
                break
            time.sleep(0.05)
        st = p.status()
        assert st["latency_ms"] is not None  # the healthy beat landed
        assert st["ok"] is False  # ...and then went stale
        assert st["age_s"] >= 0.5  # age_s rounds to 0.1 s
    finally:
        release.set()
        p.close()


def test_npz_missing_companions_is_400(server_url):
    """A u16-wire body that lost its __lo/__hi companions must 400, not
    feed 0..65535-valued integers to the model as a plausible batch."""
    lr = np.random.default_rng(3).random((2, 8, 8, 4)).astype(np.float32)
    from simple_vae_rs_tpu import wire as w

    enc = w.encode_arrays_u16({"lr": lr})
    for drop in (("lr__lo",), ("lr__lo", "lr__hi")):
        partial = {k: v for k, v in enc.items() if k not in drop}
        buf = io.BytesIO()
        np.savez(buf, **partial)
        with pytest.raises(urllib.error.HTTPError) as e:
            _post(server_url + "/v1/super_resolve", buf.getvalue(),
                  "application/x-npz")
        assert e.value.code == 400
        assert "companion" in e.value.read().decode()


def test_npz_duplicate_entries_are_rejected(server_url):
    """Duplicate 'lr.npy' zip entries would decode bytes other than the
    metadata the pre-check vetted — clean 400."""
    import zipfile

    lr = np.random.default_rng(4).random((2, 8, 8, 4)).astype(np.float32)
    one = io.BytesIO()
    np.save(one, lr)
    raw = one.getvalue()
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as zf:
        zf.writestr("lr.npy", raw)
        zf.writestr("lr.npy", raw)  # duplicate name
    with pytest.raises(urllib.error.HTTPError) as e:
        _post(server_url + "/v1/super_resolve", buf.getvalue(),
              "application/x-npz")
    assert e.value.code == 400
    assert "duplicate" in e.value.read().decode()
