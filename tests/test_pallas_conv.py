"""Fused conv+BN+ReLU Pallas kernels vs lax.conv references.

Covers all three block kernels (3x3/s1, 4x4/s2, convT4x4/s2) in interpret
mode, the analytic custom VJPs, BN folding, batch tiling, and the
block-level fused eval path (DownBlock/UpBlock with the switch on).
"""

import numpy as np
import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.ops.pallas_conv import (
    _reference3,
    _reference4,
    _referenceT,
    fits_vmem,
    fold_conv_bn,
    fused_conv3x3_bn_relu,
    fused_conv3x3_bn_relu_grad,
    fused_conv4x4s2_bn_relu,
    fused_conv4x4s2_bn_relu_grad,
    fused_convT4x4s2_bn_relu,
    fused_convT4x4s2_bn_relu_grad,
)


def _data(b=2, h=8, w=8, c=4, o=8, k=3, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.standard_normal((b, h, w, c)).astype(np.float32)
    kern = rng.standard_normal((k, k, c, o)).astype(np.float32) * 0.2
    scale = rng.standard_normal(o).astype(np.float32)
    shift = rng.standard_normal(o).astype(np.float32)
    return jnp.array(x), jnp.array(kern), jnp.array(scale), jnp.array(shift)


def test_fused3_matches_lax_conv_interpret():
    x, k, s, t = _data()
    got = fused_conv3x3_bn_relu(x, k, s, t, interpret=True)
    want = _reference3(x, k, s, t, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fused3_no_relu():
    x, k, s, t = _data(seed=1)
    got = fused_conv3x3_bn_relu(x, k, s, t, relu=False, interpret=True)
    want = _reference3(x, k, s, t, relu=False)
    assert float(jnp.min(got)) < 0  # relu really off
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fused3_batch_tiled_grid():
    """b=8 divides into multi-image tiles; result identical to per-image."""
    x, k, s, t = _data(b=8, seed=7)
    got = fused_conv3x3_bn_relu(x, k, s, t, interpret=True)
    want = _reference3(x, k, s, t, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fused4_matches_lax_strided_conv_interpret():
    x, k, s, t = _data(b=3, h=10, w=6, c=4, o=8, k=4, seed=2)
    got = fused_conv4x4s2_bn_relu(x, k, s, t, interpret=True)
    want = _reference4(x, k, s, t, relu=True)
    assert got.shape == (3, 5, 3, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fusedT_matches_lax_dilated_conv_interpret():
    x, k, s, t = _data(b=3, h=5, w=7, c=4, o=8, k=4, seed=3)
    got = fused_convT4x4s2_bn_relu(x, k, s, t, interpret=True)
    want = _referenceT(x, k, s, t, relu=True)
    assert got.shape == (3, 10, 14, 8)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_fusedT_matches_torch_convT_geometry():
    """The dilated-conv parametrization must equal torch ConvT(4, 2, 1)."""
    import torch

    x, k, s, t = _data(b=1, h=6, w=6, c=3, o=5, k=4, seed=4)
    got = fused_convT4x4s2_bn_relu(x, k, jnp.ones_like(s), jnp.zeros_like(t),
                                   relu=False, interpret=True)
    # dilated-conv kernel (kh, kw, C, O) -> torch convT weight (C, O, kh, kw)
    # is the spatial flip (see ops/conv_blocks.torch_conv_transpose)
    w_t = torch.tensor(np.asarray(k)[::-1, ::-1].copy()).permute(2, 3, 0, 1)
    x_t = torch.tensor(np.asarray(x)).permute(0, 3, 1, 2)
    want = torch.nn.functional.conv_transpose2d(x_t, w_t, stride=2, padding=1)
    np.testing.assert_allclose(
        np.asarray(got), want.permute(0, 2, 3, 1).numpy(), rtol=1e-4, atol=1e-5
    )


def test_fold_conv_bn_equals_separate_ops():
    rng = np.random.default_rng(2)
    o = 6
    x, k, _, _ = _data(c=4, o=o, seed=3)
    bias = jnp.array(rng.standard_normal(o).astype(np.float32))
    gamma = jnp.array(rng.random(o).astype(np.float32) + 0.5)
    beta = jnp.array(rng.standard_normal(o).astype(np.float32))
    mean = jnp.array(rng.standard_normal(o).astype(np.float32))
    var = jnp.array(rng.random(o).astype(np.float32) + 0.5)

    kernel, s, t = fold_conv_bn(k, bias, gamma, beta, mean, var)
    fused = fused_conv3x3_bn_relu(x, kernel, s, t, relu=True, interpret=True)

    conv = jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC")
    ) + bias
    bn = (conv - mean) / jnp.sqrt(var + 1e-5) * gamma + beta
    want = jnp.maximum(bn, 0.0)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(want), rtol=1e-4,
                               atol=1e-5)


def test_custom_vjp_grads_match_reference():
    """Analytic backward (saved-output mask, linear_transpose convs) must
    equal autodiff of the reference expression — for all three kernels."""
    cases = [
        (fused_conv3x3_bn_relu_grad, _reference3, 3),
        (fused_conv4x4s2_bn_relu_grad, _reference4, 4),
        (fused_convT4x4s2_bn_relu_grad, _referenceT, 4),
    ]
    for fused_op, ref, ksize in cases:
        x, k, s, t = _data(b=2, h=6, w=6, c=4, o=4, k=ksize, seed=5)
        for relu in (True, False):
            def loss_fused(x, k, s, t):
                return jnp.sum(fused_op(x, k, s, t, relu) ** 2)

            def loss_ref(x, k, s, t):
                return jnp.sum(ref(x, k, s, t, relu) ** 2)

            gf = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(x, k, s, t)
            gr = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(x, k, s, t)
            for a, b in zip(gf, gr):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                    err_msg=f"k={ksize} relu={relu}",
                )


def test_model_forward_unchanged_by_switch_on_cpu():
    """With the global switch on, CPU execution takes the reference path —
    model outputs must be unchanged (wiring smoke for the drop-in conv)."""
    from simple_vae_rs_tpu.config import VAEConfig
    from simple_vae_rs_tpu.models import VAE
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(1)}, x, jax.random.PRNGKey(2), train=False
    )
    off = model.apply(variables, x, jax.random.PRNGKey(3), train=False)
    pc.enable(True)
    try:
        on = model.apply(variables, x, jax.random.PRNGKey(3), train=False)
    finally:
        pc.enable(False)
    np.testing.assert_allclose(np.asarray(off[0]), np.asarray(on[0]), rtol=1e-5,
                               atol=1e-5)


def test_block_fused_eval_tail_matches_unfused():
    """DownBlock/UpBlock eval with the switch on (conv+folded-BN+ReLU as one
    fused call) must numerically equal the separate conv->BN->ReLU path."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.ops.conv_blocks import DownBlock, UpBlock

    for Block, h in ((DownBlock, 16), (UpBlock, 8)):
        block = Block(in_features=8, features=12)
        x = jax.random.normal(jax.random.PRNGKey(0), (2, h, h, 8))
        variables = block.init(
            {"params": jax.random.PRNGKey(1)}, x, train=False
        )
        # make batch_stats non-trivial so the folding is actually tested
        variables = jax.tree.map(lambda a: a, variables)
        bs = variables["batch_stats"]["bn"]
        variables["batch_stats"]["bn"] = {
            "mean": bs["mean"] + 0.3,
            "var": bs["var"] * 1.7 + 0.1,
        }
        want = block.apply(variables, x, train=False)
        pc.enable(True)
        try:
            got = block.apply(variables, x, train=False)
        finally:
            pc.enable(False)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-5,
            err_msg=Block.__name__,
        )
        # training path must be unaffected by the switch (stats can't fold)
        pc.enable(True)
        try:
            tr_on, _ = block.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
        finally:
            pc.enable(False)
        tr_off, _ = block.apply(variables, x, train=True, mutable=["batch_stats"])
        np.testing.assert_allclose(
            np.asarray(tr_on), np.asarray(tr_off), rtol=1e-5, atol=1e-5
        )


def test_vmem_guard_falls_back():
    assert not fits_vmem(256, 256, 128, 128)
    x, k, s, t = _data(b=1, h=8, w=8)
    # oversize path goes through the lax reference, still correct
    out = fused_conv3x3_bn_relu(x, k, s, t)
    assert out.shape == (1, 8, 8, 8)


def test_conv4s2_dx_pallas_matches_xla_transpose():
    """The Pallas input-gradient of the strided conv (= convT of the
    flipped/swapped kernel, the dilated pattern) must equal XLA's
    linear_transpose — interpret mode exercises the kernel lowering."""
    from simple_vae_rs_tpu.ops.pallas_conv import (
        _conv4_samedtype,
        conv4x4s2_dx,
    )

    rng = np.random.default_rng(9)
    g = jnp.asarray(rng.standard_normal((2, 4, 4, 24)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((4, 4, 16, 24)) * 0.2, jnp.float32)
    want = jax.linear_transpose(
        lambda x_: _conv4_samedtype(x_, kern),
        jax.ShapeDtypeStruct((2, 8, 8, 16), jnp.float32),
    )(g)[0]
    got = conv4x4s2_dx(g, kern, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_conv4s2_pdx_grads_match_autodiff():
    """conv4x4s2_pdx (XLA forward, Pallas-capable dx) must be a faithful
    custom VJP: value and all grads equal plain conv+bias autodiff."""
    from simple_vae_rs_tpu.ops.pallas_conv import (
        _conv4_samedtype,
        conv4x4s2_pdx,
    )

    rng = np.random.default_rng(10)
    x = jnp.asarray(rng.standard_normal((2, 8, 8, 16)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((4, 4, 16, 8)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)

    def loss_op(x, k, b):
        return jnp.sum(conv4x4s2_pdx(x, k, b) ** 2)

    def loss_ref(x, k, b):
        return jnp.sum((_conv4_samedtype(x, k) + b) ** 2)

    np.testing.assert_allclose(loss_op(x, kern, bias), loss_ref(x, kern, bias),
                               rtol=1e-5)
    go = jax.grad(loss_op, argnums=(0, 1, 2))(x, kern, bias)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(x, kern, bias)
    for a, b in zip(go, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def test_strided_modules_are_dropin_for_nn_conv():
    """PallasGradConv4x4s2 / PallasCapableConvT4x4s2 keep the exact param
    tree of the nn.Conv they replace and the same forward values — with the
    switch OFF and (on CPU, where Pallas falls back) with it ON; training
    gradients agree through the custom-VJP paths too."""
    from flax import linen as nn

    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.ops.conv_blocks import (
        PallasCapableConvT4x4s2,
        PallasGradConv4x4s2,
        _torch_kernel_init,
        _uniform_init,
    )
    import math

    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 8, 8, 16))

    fan_in = 16 * 16
    ref_conv = nn.Conv(
        8, (4, 4), strides=(2, 2), padding=[(1, 1), (1, 1)],
        kernel_init=_torch_kernel_init,
        bias_init=_uniform_init(1.0 / math.sqrt(fan_in)),
        param_dtype=jnp.float32,
    )
    fan_t = 8 * 16
    ref_convt = nn.Conv(
        8, (4, 4), strides=(1, 1), input_dilation=(2, 2),
        padding=[(2, 2), (2, 2)],
        kernel_init=_uniform_init(1.0 / math.sqrt(fan_t)),
        bias_init=_uniform_init(1.0 / math.sqrt(fan_t)),
        param_dtype=jnp.float32,
    )
    for new_mod, ref_mod in (
        (PallasGradConv4x4s2(8, 16), ref_conv),
        (PallasCapableConvT4x4s2(8, 16), ref_convt),
    ):
        v_new = new_mod.init(jax.random.PRNGKey(1), x)
        v_ref = ref_mod.init(jax.random.PRNGKey(1), x)
        assert jax.tree_util.tree_structure(v_new) == jax.tree_util.tree_structure(v_ref)
        for a, b in zip(jax.tree_util.tree_leaves(v_new),
                        jax.tree_util.tree_leaves(v_ref)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b))

        def loss(v, mod):
            return jnp.sum(mod.apply(v, x) ** 2)

        want_val = loss(v_ref, ref_mod)
        want_grad = jax.grad(lambda v: loss(v, ref_mod))(v_ref)
        for switch in (False, True):
            pc.enable(switch)
            try:
                got_val = loss(v_new, new_mod)
                got_grad = jax.grad(lambda v: loss(v, new_mod))(v_new)
            finally:
                pc.enable(False)
            np.testing.assert_allclose(got_val, want_val, rtol=1e-5,
                                       err_msg=f"{type(new_mod).__name__}")
            for a, b in zip(jax.tree_util.tree_leaves(got_grad),
                            jax.tree_util.tree_leaves(want_grad)):
                np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4,
                    err_msg=f"{type(new_mod).__name__} switch={switch}",
                )


def test_conv4s2_pdx_handles_odd_spatial_sizes():
    """Odd inputs floor in the strided forward, so the custom VJP must
    rebuild the cotangent at the ORIGINAL size (regression: the dx path
    hard-coded (2*ho, 2*wo) and grad raised a shape TypeError)."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.ops.pallas_conv import (
        _conv4_samedtype,
        conv4x4s2_pdx,
    )

    rng = np.random.default_rng(12)
    x = jnp.asarray(rng.standard_normal((2, 9, 7, 16)), jnp.float32)
    kern = jnp.asarray(rng.standard_normal((4, 4, 16, 8)) * 0.2, jnp.float32)
    bias = jnp.asarray(rng.standard_normal(8), jnp.float32)
    pc.enable(True)
    try:
        go = jax.grad(lambda x: jnp.sum(conv4x4s2_pdx(x, kern, bias) ** 2))(x)
    finally:
        pc.enable(False)
    gr = jax.grad(lambda x: jnp.sum((_conv4_samedtype(x, kern) + bias) ** 2))(x)
    assert go.shape == x.shape
    np.testing.assert_allclose(np.asarray(go), np.asarray(gr), rtol=1e-4,
                               atol=1e-4)


def test_conv3_strip_tiled_matches_reference(monkeypatch):
    """Spatial strip tiling for the 3x3 kernel: with the full-image tile
    over the VMEM budget, halo'd row strips produce identical values and
    gradients to the reference (f32 accumulation unchanged per element)."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    rng = np.random.default_rng(11)
    x = jnp.array(rng.standard_normal((2, 32, 16, 8)).astype(np.float32))
    k = jnp.array(rng.standard_normal((3, 3, 8, 8)).astype(np.float32) * 0.2)
    s = jnp.array(rng.random(8).astype(np.float32) + 0.5)
    t = jnp.array(rng.standard_normal(8).astype(np.float32))

    monkeypatch.setattr(pc, "_VMEM_BUDGET", 1_500_000)
    monkeypatch.setattr(pc, "_STRIPS_ENABLED", True)  # measured-off default
    assert not pc.fits_vmem(32, 16, 8, 8)
    th = pc._strip3_rows(32, 16, 8, 8, 4)
    assert th and th < 32 and 32 % th == 0
    assert pc.can_fuse3(32, 16, 8, 8)

    got = pc.fused_conv3x3_bn_relu(x, k, s, t, relu=True, interpret=True)
    want = pc._reference3(x, k, s, t, relu=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)

    # gradient through the custom-VJP wrapper with the strip forward
    def loss_pallas(xx, kk):
        return jnp.sum(
            pc.fused_conv3x3_bn_relu_grad(xx, kk, s, t, True) ** 2
        )

    def loss_ref(xx, kk):
        return jnp.sum(pc._reference3(xx, kk, s, t, True) ** 2)

    interp = jax.jit(jax.grad(loss_pallas, argnums=(0, 1)))
    # the grad wrapper calls the fused fn without interpret; on the CPU
    # harness that dispatches the reference path, which shares the exact
    # strip numerics — assert equality through it
    ga = interp(x, k)
    gb = jax.jit(jax.grad(loss_ref, argnums=(0, 1)))(x, k)
    for a, b in zip(ga, gb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-4)


def _chain_case(seed=13, b=2, h=32, w=16, chans=(8, 8, 16, 4)):
    rng = np.random.default_rng(seed)
    x = jnp.array(rng.standard_normal((b, h, w, chans[0])).astype(np.float32))
    ks = tuple(
        jnp.array(
            rng.standard_normal((3, 3, chans[i], chans[i + 1])).astype(np.float32)
            * 0.3
        )
        for i in range(len(chans) - 1)
    )
    bs = tuple(
        jnp.array(rng.standard_normal(chans[i + 1]).astype(np.float32))
        for i in range(len(chans) - 1)
    )
    return x, ks, bs


def test_chain_kernel_interpret_matches_reference():
    """The fused linear-chain kernel (whole decoder tail in one strip
    pass) matches the sequential SAME-conv chain exactly, including the
    per-layer zero-padding border semantics."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    x, ks, bs = _chain_case()
    got = pc.fused_conv3x3_chain(x, ks, bs, interpret=True)
    want = pc._chain_reference(x, ks, bs)
    assert got.shape == want.shape == (2, 32, 16, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_chain_kernel_multi_strip_matches(monkeypatch):
    """Forcing several row strips (lowered VMEM budget) must not change
    values — halo rows reproduce the full-image chain at strip seams."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    x, ks, bs = _chain_case(seed=14)
    want = pc._chain_reference(x, ks, bs)
    monkeypatch.setattr(pc, "_VMEM_BUDGET", 2_000_000)
    th = pc._chain_strip_rows(32, 16, [8, 8, 16, 4], 4)
    assert th and th < 32, f"expected multiple strips, got th={th}"
    got = pc.fused_conv3x3_chain(x, ks, bs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-4,
                               atol=1e-4)


def test_model_tail_chain_routing_matches_module_path(monkeypatch):
    """tail_chain wiring: with the chain gate forced on, the decoders
    produce the same outputs as the per-module path (validates the
    parameter plumbing from the flax scope into the chain kernel)."""
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    rng = np.random.default_rng(15)
    x = jnp.array(rng.random((2, 16, 16, 4)).astype(np.float32))
    y = jnp.array(rng.random((2, 8, 8, 4)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1),
        train=False,
    )
    key = jax.random.PRNGKey(7)

    monkeypatch.setattr(pc, "chain_wanted", lambda: False)
    plain = model.apply(variables, x, y, key, train=False)
    monkeypatch.setattr(pc, "chain_wanted", lambda: True)
    chained = model.apply(variables, x, y, key, train=False)
    # full 8-tuple: decoder tails AND encoder-head chains route through
    for a, b in zip(plain, chained):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-5)


def test_convT_deep_channel_dispatch_region():
    """The measured deep-channel convT exception: up1-like shapes route to
    the fused kernel; shallower or larger-spatial shapes keep the generic
    caps (which reject them at serving scale)."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    # up1.convT at the serving chunk: B250, out 16x16, c_in=424 -> fused
    assert pc.deep_channel_T(250, 16, 16, 424)
    assert pc.wins_over_xla_T(250, 16, 16, 424)
    # up2.convT: c=256 out 32x32 -> measured parity/loss, not routed
    assert not pc.deep_channel_T(250, 32, 32, 256)
    assert not pc.wins_over_xla_T(250, 32, 32, 256)
    # way past the measured row count: not routed
    assert not pc.deep_channel_T(4096, 16, 16, 424)
    # channels unknown -> no exception
    assert not pc.deep_channel_T(250, 16, 16, None)


def test_tail_chain_defers_to_int8_quant(monkeypatch):
    """SVRS_CHAIN=1 must not silently de-quantize int8 serving: when the
    int8 switch is on and the scope carries quant variables, tail_chain
    defers to the per-module path (which dispatches the W8A8 kernels)."""
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.ops import quantize as qz

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    rng = np.random.default_rng(16)
    x = jnp.array(rng.random((1, 16, 16, 4)).astype(np.float32))
    y = jnp.array(rng.random((1, 8, 8, 4)).astype(np.float32))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1),
        train=False,
    )
    calls = []
    orig = pc.fused_conv3x3_chain
    monkeypatch.setattr(pc, "chain_wanted", lambda: True)
    monkeypatch.setattr(
        pc, "fused_conv3x3_chain",
        lambda *a, **k: (calls.append(1), orig(*a, **k))[1],
    )
    key = jax.random.PRNGKey(9)

    # float serving: the chain runs
    model.apply(variables, x, y, key, train=False)
    assert calls

    # int8 serving: quant collection present -> chain defers
    calls.clear()
    qvars = dict(variables)
    qvars["quant"] = qz.quantize_params_tree(
        variables["params"], jax.random.PRNGKey(2)
    )
    model.apply(qvars, x, y, key, train=False)
    assert not calls


def test_wl_chain_interpret_matches_reference():
    """Width-in-lanes chain (spatial lanes, channels in sublanes — the
    redesign the round-3 chain postmortem prescribed) matches the
    sequential SAME-conv chain exactly: lane rolls + edge masks must
    reproduce zero padding, halo rows the strip seams."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    x, ks, bs = _chain_case()
    got = pc.fused_conv3x3_chain_wl(x, ks, bs, interpret=True)
    want = pc._chain_reference(x, ks, bs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )


def test_wl_chain_multi_strip_and_small_outputs():
    """Multi-strip grids and the canonical tail's tiny output channels
    (16/4) both stay exact — the shapes the old chain starved on."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    x, ks, bs = _chain_case(seed=15, b=2, h=32, w=32, chans=(16, 16, 4))
    got = pc.fused_conv3x3_chain_wl(x, ks, bs, interpret=True)
    want = pc._chain_reference(x, ks, bs)
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=1e-4, atol=1e-4
    )
