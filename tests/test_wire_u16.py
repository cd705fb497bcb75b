"""u16 quantized wire: codec bounds, negotiation, end-to-end parity.

The serving links this framework targets are bandwidth-bound (BASELINE.md
tile/stream sections), so wire bytes are wall-clock; ``wire.py`` halves
them by shipping uint16 + per-channel extrema instead of float32. These
tests pin the codec's error bound, the client/server negotiation
(capability flag, old-server guard, bad-value 400), byte-level
reproducibility of seeded u16 requests, and closeness of u16-wire
products to the f32 wire on every endpoint family.
"""

import io
import json
import threading
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_vae_rs_tpu import wire
from simple_vae_rs_tpu.client import Client, ServerError
from simple_vae_rs_tpu.config import CondSRVAEConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.serve import SuperResolver
from simple_vae_rs_tpu.server import make_server


# ------------------------------------------------------------------ codec
def test_codec_roundtrip_error_bound():
    """Dequantized values sit within half a per-channel step of the
    original — the documented bound, on data with very unequal channel
    ranges (the case a single global scale would butcher)."""
    rng = np.random.default_rng(0)
    x = rng.random((3, 7, 5, 4)).astype(np.float32)
    x *= np.asarray([1.0, 100.0, 1e-3, 10.0], np.float32)
    q, lo, hi = wire.quantize_u16(x)
    assert q.dtype == np.uint16 and q.shape == x.shape
    assert lo.shape == (4,) and hi.shape == (4,)
    back = wire.dequantize_u16(q, lo, hi)
    assert back.dtype == np.float32
    step = (hi - lo) / wire.U16_MAX
    err = np.abs(back - x)
    # half a step plus float32 arithmetic slack
    assert (err <= step * 0.5 + np.abs(x) * 1e-6 + 1e-9).all()


def test_codec_flat_channel_and_errors():
    x = np.full((4, 4, 2), 3.25, np.float32)
    q, lo, hi = wire.quantize_u16(x)
    assert (q == 0).all()
    assert (wire.dequantize_u16(q, lo, hi) == 3.25).all()
    with pytest.raises(ValueError):
        wire.quantize_u16(np.array([[1.0, np.nan]]))
    with pytest.raises(ValueError):
        wire.quantize_u16(np.zeros((0, 3)))
    with pytest.raises(ValueError):
        wire.encode_arrays_u16({"sr__lo": x})


def test_sub_tiny_span_quantizes_like_flat():
    """A nonzero channel span below ~2e-34 would overflow 65535/span to
    inf in float32 (then 0*inf=NaN at the channel-min element, whose
    uint16 cast is platform-defined). Such spans are treated like flat
    channels: q=0 everywhere, bit-deterministic, error <= span."""
    tiny = np.float32(1e-36)
    x = np.zeros((4, 4, 2), np.float32)
    x[0, 0, 0] = tiny          # channel 0 span = 1e-36 (subnormal-tiny)
    x[:, :, 1] = np.linspace(0, 1, 16, np.float32).reshape(4, 4)
    q, lo, hi = wire.quantize_u16(x)
    assert (q[:, :, 0] == 0).all()          # no NaN-cast garbage
    back = wire.dequantize_u16(q, lo, hi)
    assert np.isfinite(back).all()
    assert np.abs(back[:, :, 0] - x[:, :, 0]).max() <= float(tiny)
    # the healthy channel still quantizes normally
    assert np.abs(back[:, :, 1] - x[:, :, 1]).max() <= 1.0 / wire.U16_MAX


def test_decode_arrays_mixed_passthrough():
    """One decoder serves both wires: quantized keys dequantize, plain
    entries pass through untouched."""
    x = np.linspace(0, 1, 24, dtype=np.float32).reshape(2, 3, 4)
    enc = wire.encode_arrays_u16({"a": x})
    enc["b"] = np.arange(3, dtype=np.float32)
    out = wire.decode_arrays(enc)
    assert set(out) == {"a", "b"}
    assert np.abs(out["a"] - x).max() <= 1.0 / wire.U16_MAX
    np.testing.assert_array_equal(out["b"], enc["b"])


# ------------------------------------------------------------- end-to-end
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
    srv = make_server(SuperResolver(model, variables, seed=4), port=0)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - b) ** 2))
    return 200.0 if mse == 0 else -10.0 * np.log10(mse)


def test_healthz_advertises_wire(server_url):
    assert Client(server_url).health().get("wire_u16") is True


def test_u16_bodies_halve_the_bytes(server_url):
    # realistic window-batch size (the zip container's fixed ~1 KB
    # overhead only matters on toy bodies)
    lr = np.random.default_rng(1).random((16, 32, 32, 4)).astype(np.float32)
    c16 = Client(server_url, wire="u16")
    f32_body = Client._npy(lr)
    u16_body, ctype = c16._body(lr)
    assert ctype == "application/x-npz"
    assert len(u16_body) < 0.55 * len(f32_body)


def test_super_resolve_u16_close_to_f32(server_url):
    """Same seeded draw through both wires: the only differences are the
    two quantization passes (~7.6e-6 in, half a step out)."""
    lr = np.random.default_rng(2).random((2, 8, 8, 4)).astype(np.float32)
    sr32 = Client(server_url).super_resolve(lr, seed=7)
    sr16 = Client(server_url, wire="u16").super_resolve(lr, seed=7)
    assert sr16.shape == sr32.shape and sr16.dtype == np.float32
    assert _psnr(sr16, sr32) > 55.0


def test_moments_u16_std_within_tolerance(server_url):
    """UQ fast path on the u16 wire: the derived std map stays well
    inside the 8-draw sampling noise of the estimate itself."""
    lr = np.random.default_rng(3).random((2, 8, 8, 4)).astype(np.float32)
    n = 8
    s1a, s2a = Client(server_url).super_resolve_moments(lr, n, seed=9)
    s1b, s2b = Client(server_url, wire="u16").super_resolve_moments(
        lr, n, seed=9)
    std = lambda s1, s2: np.sqrt(
        np.maximum(s2 / n - (s1 / n) ** 2, 0.0))
    sa, sb = std(np.asarray(s1a, np.float64), s2a), std(
        np.asarray(s1b, np.float64), s2b)
    assert _psnr(s1b / n, s1a / n) > 55.0
    # worst-case absolute bound from quantizing s1/s2: variance error
    # ~3 quantization steps of s/n (~5e-5 here), so std error at most
    # sqrt of that even under full cancellation (an untrained model's
    # near-zero std maps hit exactly that regime)
    assert float(np.mean(np.abs(sb - sa))) < 5e-3
    assert float(np.max(np.abs(sb - sa))) < 2e-2


def test_tile_endpoint_u16(server_url):
    raster = np.random.default_rng(4).random((10, 14, 4)).astype(np.float32)
    t32 = Client(server_url).super_resolve_tile(
        raster, overlap=2, batch=4, seed=11)
    t16 = Client(server_url, wire="u16").super_resolve_tile(
        raster, overlap=2, batch=4, seed=11)
    assert t16.shape == (20, 28, 4)
    assert _psnr(t16, t32) > 55.0


def test_uncertainty_endpoint_u16(server_url):
    lr = np.random.default_rng(5).random((8, 8, 4)).astype(np.float32)
    m32 = Client(server_url).uncertainty(lr, samples=4, seed=13)
    m16 = Client(server_url, wire="u16").uncertainty(lr, samples=4, seed=13)
    assert set(m16) == set(m32)
    assert _psnr(m16["mean"], m32["mean"]) > 55.0


def test_seeded_u16_requests_are_byte_identical(server_url):
    """The reproducibility contract survives the quantized wire: the
    same input + seed + options produces the same RESPONSE BYTES (both
    sides quantize deterministically)."""
    c = Client(server_url, wire="u16")
    lr = np.random.default_rng(6).random((1, 8, 8, 4)).astype(np.float32)
    body, ctype = c._body(lr)
    raw = []
    for _ in range(2):
        out, _t = c._request("/v1/super_resolve?wire=u16&seed=21",
                             body, ctype)
        raw.append(out)
    assert raw[0] == raw[1]


def test_remote_resolver_streams_on_u16_wire(server_url):
    """The client-side tile driver rides the quantized wire end to end
    (window posts AND moments responses), staying close to the f32
    product."""
    raster = np.random.default_rng(7).random((18, 20, 4)).astype(np.float32)
    r32 = Client(server_url).resolver(normalize=False)
    r16 = Client(server_url, wire="u16").resolver(normalize=False)
    t32 = r32.super_resolve_tile(raster, batch=4, seed=17)
    t16 = r16.super_resolve_tile(raster, batch=4, seed=17)
    assert _psnr(t16, t32) > 55.0
    u32 = r32.uncertainty_tile(raster, samples=4, batch=4, seed=19)
    u16_ = r16.uncertainty_tile(raster, samples=4, batch=4, seed=19)
    assert _psnr(u16_["mean"], u32["mean"]) > 55.0
    r32.close()
    r16.close()


def test_resolver_guard_refuses_pre_u16_server(server_url, monkeypatch):
    c = Client(server_url, wire="u16")
    real = c.health()
    assert real.pop("wire_u16") is True
    monkeypatch.setattr(Client, "health", lambda self: real)
    with pytest.raises(ServerError, match="wire_u16"):
        c.resolver()


def test_bad_wire_value_is_a_400(server_url):
    lr = np.random.default_rng(8).random((1, 8, 8, 4)).astype(np.float32)
    with pytest.raises(ServerError, match="400"):
        Client(server_url)._post_array("/v1/super_resolve", lr, wire="u8")
    with pytest.raises(ValueError, match="wire"):
        Client(server_url, wire="u8")


def test_json_requests_ignore_wire(server_url):
    """JSON stays the debugging path: a JSON body with wire=u16 still
    gets a JSON reply."""
    lr = np.zeros((1, 8, 8, 4), np.float32)
    body = json.dumps({"lr": lr.tolist(), "wire": "u16",
                       "seed": 3}).encode()
    req = urllib.request.Request(
        f"{server_url}/v1/super_resolve", data=body, method="POST",
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=120) as resp:
        assert resp.headers.get("Content-Type") == "application/json"
        out = json.loads(resp.read())
    assert np.asarray(out["sr"]).shape == (1, 16, 16, 4)


@pytest.fixture(scope="module")
def small_body_url():
    """A server with a 1 MB body limit — bomb tests stay tiny."""
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    srv = make_server(SuperResolver(model, variables, seed=4), port=0,
                      max_body_mb=1)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _npz_body(**entries):
    import zipfile

    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as zf:
        for name, arr in entries.items():
            inner = io.BytesIO()
            np.save(inner, arr)
            zf.writestr(f"{name}.npy", inner.getvalue())
    return buf.getvalue()


def test_npz_decompression_bomb_is_refused(small_body_url):
    """Content-Length cannot bound a DEFLATED npz body — a zip of zeros
    inflates ~1000x. The server charges DECOMPRESSED bytes against
    --max_body_mb and refuses with a 400 before materializing them."""
    body = _npz_body(lr=np.zeros((4, 1024, 1024), np.uint16))  # 8 MB > 1 MB
    assert len(body) < 1 << 20  # compressed body sails past the 413 check
    with pytest.raises(ServerError, match="400.*decompress"):
        Client(small_body_url)._request(
            "/v1/super_resolve", body, "application/x-npz", )


def test_unexpected_npz_entries_never_decompress(small_body_url):
    """Entries the protocol doesn't expect are skipped at the NAME check
    (never decompressed, never charged) — the body still serves from its
    'lr' entry even with an over-budget stowaway alongside."""
    lr = np.random.default_rng(10).random((1, 8, 8, 4)).astype(np.float32)
    body = _npz_body(lr=lr, evil=np.zeros((4, 1024, 1024), np.uint16))
    out, ctype = Client(small_body_url)._request(
        "/v1/super_resolve?seed=5", body, "application/x-npz")
    assert ctype.startswith("application/x-npy")
    assert np.load(io.BytesIO(out)).shape == (1, 16, 16, 4)


def test_nonfinite_output_is_a_server_error():
    """A NaN/inf MODEL OUTPUT on the u16 wire is the server's condition
    (500, retried by clients), never a 400 blamed on the caller."""
    from simple_vae_rs_tpu.server import ModelService

    with pytest.raises(RuntimeError, match="u16-encode"):
        ModelService._encode(
            {"sr": np.array([[np.inf]], np.float32)},
            "application/x-npy", "u16")


def test_plain_f32_npz_body_accepted(server_url):
    """The npz request encoding works unquantized too (wire negotiation
    is per-direction: body encoding is self-describing)."""
    lr = np.random.default_rng(9).random((1, 8, 8, 4)).astype(np.float32)
    buf = io.BytesIO()
    np.savez(buf, lr=lr)
    out, ctype = Client(server_url)._request(
        "/v1/super_resolve?seed=5", buf.getvalue(), "application/x-npz")
    assert ctype.startswith("application/x-npy")
    sr = np.load(io.BytesIO(out), allow_pickle=False)
    ref = Client(server_url).super_resolve(lr, seed=5)
    np.testing.assert_array_equal(sr, ref)
