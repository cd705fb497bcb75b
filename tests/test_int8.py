"""Int8 quantization + W8A8 fused conv kernels.

Covers the stochastic-rounding quantizer contract (unbiased, sub-ulp error,
safe scales), the three int8 Pallas kernels in interpret mode vs their
host references, torch convT geometry with dequantized weights, and the
quantization-error envelope vs the float kernels.

The quantizer's Pallas path needs the TPU PRNG primitives (no CPU lowering)
— on this CPU harness `quantize_stochastic` transparently falls back to the
pure-JAX emulation; the TPU kernel itself is exercised by the serving bench
(scripts/bench_uq.py --int8) on hardware.
"""

import numpy as np
import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.ops.quantize import (
    channel_scales,
    dequantize,
    quantize_rtn,
    quantize_stochastic,
    quantize_stochastic_ref,
)
from simple_vae_rs_tpu.ops.pallas_int8 import (
    int8_conv3x3_bn_relu,
    int8_conv4x4s2_bn_relu,
    int8_convT4x4s2_bn_relu,
    int8_reference3,
    int8_reference4,
    int8_referenceT,
)


def _w(shape=(3, 3, 4, 8), seed=0, scale=0.3):
    rng = np.random.default_rng(seed)
    return jnp.array(rng.standard_normal(shape).astype(np.float32) * scale)


# ------------------------------------------------------------------ quantizer
def test_channel_scales_absmax_and_zero_channel():
    w = jnp.stack(
        [jnp.full((3, 3, 4), 2.54), jnp.zeros((3, 3, 4))], axis=-1
    )
    s = channel_scales(w)
    np.testing.assert_allclose(np.asarray(s), [2.54 / 127.0, 1.0], rtol=1e-6)


def test_quantize_rtn_error_below_half_scale():
    w = _w(seed=1)
    q, s = quantize_rtn(w)
    assert q.dtype == jnp.int8
    err = np.abs(np.asarray(dequantize(q, s) - w))
    assert err.max() <= np.asarray(s).max() * 0.5 + 1e-7


def test_quantize_stochastic_ref_error_below_one_scale():
    w = _w(seed=2)
    q, s = quantize_stochastic_ref(w, jax.random.PRNGKey(0))
    err = np.abs(np.asarray(dequantize(q, s) - w))
    # stochastic rounding moves to one of the two adjacent grid points
    assert err.max() <= np.asarray(s).max() + 1e-7
    assert int(np.abs(np.asarray(q)).max()) <= 127


def test_quantize_stochastic_ref_is_unbiased():
    """E[dequant] == w: averaging over keys must beat round-to-nearest's
    systematic error on a near-tie value."""
    # per-channel absmax 1.0 sets grid 1/127; the 0.123 mass sits mid-cell
    # (0.123 * 127 = 15.62), where round-to-nearest is systematically biased
    w = jnp.full((4, 4, 4, 4), 0.123).at[0, 0].set(1.0)
    draws = []
    for i in range(400):
        q, s = quantize_stochastic_ref(w, jax.random.PRNGKey(i))
        draws.append(np.asarray(dequantize(q, s)))
    mean = np.stack(draws).mean(0)
    grid = float(np.asarray(channel_scales(w))[0])
    bias = np.abs(mean - np.asarray(w)).max()
    # MC noise: max over 256 elements of a 400-draw Bernoulli mean —
    # ~3.3 sigma = 0.08 grid; 0.15 leaves slack while staying far under
    # round-to-nearest's 0.38-grid systematic error checked below
    assert bias < 0.15 * grid
    # round-to-nearest of a mid-cell value has bias ~= its distance to the
    # grid point, which is much larger than the MC noise here
    q_rtn, s_rtn = quantize_rtn(w)
    rtn_bias = np.abs(np.asarray(dequantize(q_rtn, s_rtn)) - np.asarray(w)).max()
    assert bias < rtn_bias


def test_quantize_dispatch_runs_on_cpu():
    w = _w(seed=3)
    q, s = quantize_stochastic(w, jax.random.PRNGKey(0))
    assert q.shape == w.shape and q.dtype == jnp.int8
    assert s.shape == (w.shape[-1],)


# -------------------------------------------------------------- int8 kernels
def _case(b=2, h=8, w=8, c=4, o=8, k=3, seed=0):
    rng = np.random.default_rng(seed)
    x = jnp.array(rng.standard_normal((b, h, w, c)).astype(np.float32))
    kern = _w((k, k, c, o), seed=seed + 1)
    kq, ks = quantize_rtn(kern)
    scale = jnp.array(rng.random(o).astype(np.float32) + 0.5)
    shift = jnp.array(rng.standard_normal(o).astype(np.float32) * 0.1)
    return x, kern, kq, ks, scale, shift


def test_int8_conv3_interpret_matches_reference():
    x, _, kq, ks, s, t = _case()
    got = int8_conv3x3_bn_relu(x, kq, ks, s, t, interpret=True)
    want = int8_reference3(x, kq, ks, s, t, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_int8_conv3_no_relu():
    x, _, kq, ks, s, t = _case(seed=4)
    got = int8_conv3x3_bn_relu(x, kq, ks, s, t, relu=False, interpret=True)
    want = int8_reference3(x, kq, ks, s, t, relu=False)
    assert float(jnp.min(got)) < 0
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_int8_conv4_interpret_matches_reference():
    x, _, kq, ks, s, t = _case(b=2, h=10, w=6, k=4, seed=5)
    got = int8_conv4x4s2_bn_relu(x, kq, ks, s, t, interpret=True)
    want = int8_reference4(x, kq, ks, s, t, relu=True)
    assert got.shape == (2, 5, 3, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_int8_convT_interpret_matches_reference():
    x, _, kq, ks, s, t = _case(b=2, h=5, w=7, k=4, seed=6)
    got = int8_convT4x4s2_bn_relu(x, kq, ks, s, t, interpret=True)
    want = int8_referenceT(x, kq, ks, s, t, relu=True)
    assert got.shape == (2, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_int8_convT_matches_torch_geometry_dequantized():
    """ConvT int8 path == torch conv_transpose2d run on dequantized weights
    and host-quantized activations (geometry + scale bookkeeping)."""
    import torch

    x, _, kq, ks, s, t = _case(b=1, h=6, w=6, c=3, o=5, k=4, seed=7)
    got = int8_convT4x4s2_bn_relu(
        x, kq, ks, jnp.ones_like(s), jnp.zeros_like(t), relu=False,
        interpret=True,
    )
    # reproduce the reference's act quantization on the host
    amax = float(jnp.max(jnp.abs(x)))
    a_scale = max(amax / 127.0, 1e-12)
    qx = np.clip(np.round(np.asarray(x) / a_scale), -127, 127)
    deq_w = np.asarray(dequantize(kq, ks))
    w_t = torch.tensor(deq_w[::-1, ::-1].copy()).permute(2, 3, 0, 1)
    x_t = torch.tensor(qx * a_scale).float().permute(0, 3, 1, 2)
    want = torch.nn.functional.conv_transpose2d(x_t, w_t, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-4
    )


def test_int8_error_envelope_vs_float_kernel():
    """W8A8 output must stay within the analytic quantization envelope of
    the float conv (weight err <= ks/2 per tap, act err <= a_scale/2)."""
    from simple_vae_rs_tpu.ops.pallas_conv import _reference3

    x, kern, kq, ks, s, t = _case(b=2, h=16, w=16, c=8, o=16, seed=8)
    got = np.asarray(
        int8_conv3x3_bn_relu(x, kq, ks, s, t, relu=False, interpret=True)
    )
    want = np.asarray(_reference3(x, kern, s, t, relu=False))
    a_scale = float(jnp.max(jnp.abs(x))) / 127.0
    # per-output-element bound: sum over 9*c taps of (|w|*da + |x|*dw + da*dw)
    xmax = float(jnp.max(jnp.abs(x)))
    wmax = float(jnp.max(jnp.abs(kern)))
    smax = float(jnp.max(s))
    taps = 9 * x.shape[-1]
    bound = taps * (wmax * a_scale / 2 + xmax * float(ks.max()) / 2) * smax * 1.1
    assert np.abs(got - want).max() <= bound
    # and in practice it is far tighter than the worst case
    assert np.abs(got - want).max() < 0.25 * np.abs(want).max()


# ---------------------------------------------------------------- model path
def test_quantize_params_tree_covers_decoders_only():
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops.quantize import quantize_params_tree

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    x = jnp.zeros((1, 16, 16, 4))
    y = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1),
        train=False,
    )
    quant = quantize_params_tree(variables["params"], jax.random.PRNGKey(2))
    names = set(quant)
    assert all(n.startswith(("dx_", "dy_")) for n in names)
    assert "dx_up1" in names and "dy_conv4" in names
    assert "ex_down1" not in names and "ey_head" not in names
    # blocks carry both conv kernels; plain convs carry one
    assert set(quant["dx_up1"]) == {"conv", "upsample"}
    assert set(quant["dx_up1"]["conv"]) == {"kernel_q", "kernel_s"}
    assert quant["dx_conv1"]["kernel_q"].dtype == jnp.int8
    # shapes mirror the param kernels
    assert (
        quant["dx_up1"]["upsample"]["kernel_q"].shape
        == variables["params"]["dx_up1"]["upsample"]["kernel"].shape
    )


def test_int8_block_eval_close_to_float_block():
    """DownBlock/UpBlock eval through the W8A8 tail must stay close to the
    float path (quantization error envelope), and shapes must match."""
    from simple_vae_rs_tpu.ops import quantize as qz
    from simple_vae_rs_tpu.ops.conv_blocks import DownBlock, UpBlock
    from simple_vae_rs_tpu.ops.quantize import quantize_params_tree

    for Block, h, oshape in (
        (DownBlock, 16, (2, 8, 8, 12)),
        (UpBlock, 8, (2, 16, 16, 12)),
    ):
        block = Block(in_features=8, features=12)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, 8))
        variables = block.init(
            {"params": jax.random.PRNGKey(1)}, x, train=False
        )
        want = np.asarray(block.apply(variables, x, train=False))
        # quantize this block's convs (prefix match on the empty path fails,
        # so pass a prefix that matches everything here)
        quant = quantize_params_tree(
            variables["params"], jax.random.PRNGKey(2), prefixes=("",)
        )
        v2 = dict(variables)
        v2["quant"] = quant
        got = np.asarray(block.apply(v2, x, train=False))
        assert got.shape == oshape
        err = np.abs(got - want).max()
        ref = np.abs(want).max()
        assert 0 < err < 0.2 * ref, f"{Block.__name__}: err={err} ref={ref}"
        # no quant collection in scope -> float path (presence IS the switch)
        off = np.asarray(block.apply(variables, x, train=False))
        np.testing.assert_allclose(off, want, rtol=1e-6, atol=1e-6)


def test_int8_superresolver_end_to_end_quality():
    """SuperResolver(int8=True) must produce outputs close to the float
    resolver (high PSNR between the two) through the full serving path,
    including the chunked uncertainty endpoint."""
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.serve import SuperResolver

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    y0 = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y0, jax.random.PRNGKey(1),
        train=False,
    )
    lr = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 4))
    )
    ref = SuperResolver(model, variables, seed=7)
    out_f = np.asarray(ref.super_resolve(lr))
    q = SuperResolver(model, variables, seed=7, int8=True)
    assert "quant" in q.variables
    out_q = np.asarray(q.super_resolve(lr))
    assert out_q.shape == out_f.shape == (2, 16, 16, 4)
    mse = float(np.mean((out_q - out_f) ** 2))
    psnr = 10 * np.log10(1.0 / max(mse, 1e-12))
    assert psnr > 30.0, f"int8 vs float serving PSNR too low: {psnr:.1f} dB"
    # chunked uncertainty endpoint runs through nn.scan with the quant
    # collection broadcast
    maps = q.uncertainty(lr[0], samples=4, chunk=2)
    assert maps["mean"].shape == (16, 16, 4)
    assert np.isfinite(np.asarray(maps["std"])).all()


def test_int8_conv3_strip_tiled_matches_reference(monkeypatch):
    """Spatial strip tiling: when the full-image tile exceeds the VMEM
    budget, the 3x3 kernel splits into halo'd row strips with a GLOBAL
    activation scale — numerics exactly int8_reference3's regardless of
    the strip height (round 2 fell back to XLA here)."""
    from simple_vae_rs_tpu.ops import pallas_int8 as p8

    rng = np.random.default_rng(9)
    x = jnp.array(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    kq, ks = quantize_rtn(_w((3, 3, 8, 8), seed=9))
    s = jnp.array(rng.random(8).astype(np.float32) + 0.5)
    t = jnp.array(rng.standard_normal(8).astype(np.float32))

    # budget low enough that the full 32-row tile fails but a strip fits;
    # strips are measured-off by default (SVRS_INT8_STRIPS) — force on
    monkeypatch.setattr(p8, "_VMEM_BUDGET", 2_000_000)
    monkeypatch.setattr(p8, "_STRIPS_ENABLED", True)
    assert not p8.fits_vmem3_int8(32, 16, 8, 8)
    th = p8._strip3_rows(32, 16, 8, 8, 4)
    assert th and th < 32 and 32 % th == 0

    got = int8_conv3x3_bn_relu(x, kq, ks, s, t, interpret=True)
    want = int8_reference3(x, kq, ks, s, t, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)

    # no-relu variant through the same strip path
    got2 = int8_conv3x3_bn_relu(x, kq, ks, s, t, relu=False, interpret=True)
    want2 = int8_reference3(x, kq, ks, s, t, relu=False)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2),
                               rtol=1e-4, atol=1e-5)


def test_int8_convT_channel_floor_routing():
    """Measured routing floor: the int8 convT loses to plain XLA below
    ~192 input channels (128ch: 2.01 vs 1.30 ms at the B250 serving
    chunk), so shallow UpBlocks must fall through to the float path even
    with int8 enabled; deeper ones take the quantized kernel."""
    from simple_vae_rs_tpu.ops import quantize as qz
    from simple_vae_rs_tpu.ops.conv_blocks import UpBlock

    def outputs(c_in):
        rng = np.random.default_rng(11)
        x = jnp.array(rng.standard_normal((2, 4, 4, c_in)).astype(np.float32))
        model = UpBlock(in_features=c_in, features=8)
        vs = model.init(jax.random.PRNGKey(0), x, train=False)
        quant = qz.quantize_params_tree(
            vs["params"], jax.random.PRNGKey(1), prefixes=("upsample",)
        )
        assert "upsample" in quant  # quant tail actually attached
        tree = dict(vs)
        tree["quant"] = quant
        with_int8 = model.apply(tree, x, train=False)
        without = model.apply(vs, x, train=False)
        return np.asarray(with_int8), np.asarray(without)

    # 128 input channels: below the floor -> identical to the float path
    a, b = outputs(128)
    np.testing.assert_array_equal(a, b)

    # 256 input channels: above the floor -> quantized kernel (differs)
    a, b = outputs(256)
    assert np.abs(a - b).max() > 0


def test_int8_and_f32_resolvers_coexist_both_orders():
    """Routing is driven purely by the ``quant`` collection in scope — no
    process-global switch — so int8 and f32 resolvers of the same model
    class coexist in one process regardless of construction order, and a
    later int8 resolver cannot change an earlier f32 resolver's outputs
    (round-2/3 verdict item: the one-way ``enable_int8`` global is gone)."""
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.serve import SuperResolver

    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    y0 = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y0, jax.random.PRNGKey(1),
        train=False,
    )
    lr = np.asarray(jax.random.uniform(jax.random.PRNGKey(3), (2, 8, 8, 4)))

    # per-request seeds make draws a pure function of the request, so
    # resolver construction order is the only variable under test
    # order A: f32 first, then int8
    f32_a = SuperResolver(model, variables, seed=7)
    out_f32_before = np.asarray(f32_a.super_resolve(lr, seed=3))
    q_a = SuperResolver(model, variables, seed=7, int8=True)
    out_q_a = np.asarray(q_a.super_resolve(lr, seed=3))
    # the f32 resolver built BEFORE the int8 one still serves float
    out_f32_after = np.asarray(f32_a.super_resolve(lr, seed=3))
    np.testing.assert_array_equal(out_f32_before, out_f32_after)

    # order B: int8 first, then f32 — fresh model instance, same class
    model_b = CondSRVAE(cfg)
    q_b = SuperResolver(model_b, variables, seed=7, int8=True)
    out_q_b = np.asarray(q_b.super_resolve(lr, seed=3))
    f32_b = SuperResolver(model_b, variables, seed=7)
    out_f32_b = np.asarray(f32_b.super_resolve(lr, seed=3))

    # both orders agree arm-for-arm
    np.testing.assert_array_equal(out_q_a, out_q_b)
    np.testing.assert_array_equal(out_f32_before, out_f32_b)
    # and int8 genuinely routed (differs from float)
    assert not np.allclose(out_q_a, out_f32_before, atol=1e-6)
