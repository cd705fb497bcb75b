"""Unit tests for the conv building blocks (ops/conv_blocks.py, ops/attention.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_vae_rs_tpu.ops.attention import SelfAttention2D
from simple_vae_rs_tpu.ops.conv_blocks import (
    DownBlock,
    UpBlock,
    calculate_output_size,
    calculate_padding,
    torch_conv,
    torch_conv_transpose,
)
from simple_vae_rs_tpu.ops.reshape import depth_to_space, space_to_depth


def n_params(variables):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(variables["params"]))


def test_down_block_halves_spatial_and_param_count():
    x = jnp.ones((2, 16, 16, 4))
    blk = DownBlock(in_features=4, features=16)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(v, x, train=False)
    assert y.shape == (2, 8, 8, 16)
    # conv 4->4 3x3 (148) + conv 4->16 4x4 (1040) + bn (32): reference layout
    assert n_params(v) == 1220


def test_up_block_doubles_spatial():
    x = jnp.ones((2, 8, 8, 16))
    blk = UpBlock(in_features=16, features=8)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y, _ = blk.apply(v, x, train=True, mutable=["batch_stats"])
    assert y.shape == (2, 16, 16, 8)


def test_blocks_relu_bn_flags():
    x = jnp.linspace(-1, 1, 2 * 8 * 8 * 4).reshape(2, 8, 8, 4)
    blk = DownBlock(in_features=4, features=8, with_relu=False, with_bn=False)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    assert "batch_stats" not in v
    y = blk.apply(v, x, train=False)
    assert float(jnp.min(y)) < 0  # no ReLU applied


def test_batchnorm_train_vs_eval():
    x = jax.random.normal(jax.random.PRNGKey(1), (8, 8, 8, 4)) * 3 + 1
    blk = DownBlock(in_features=4, features=8)
    v = blk.init(jax.random.PRNGKey(0), x, train=False)
    y_train, mutated = blk.apply(v, x, train=True, mutable=["batch_stats"])
    # running stats move toward batch stats with momentum 0.1
    rm = jax.tree.leaves(mutated["batch_stats"])
    assert any(float(jnp.abs(leaf).max()) > 0 for leaf in rm)
    y_eval = blk.apply(v, x, train=False)
    assert y_train.shape == y_eval.shape
    assert not np.allclose(np.asarray(y_train), np.asarray(y_eval))


def test_conv_transpose_matches_torch_geometry_and_values():
    """Fractionally-strided conv == torch ConvTranspose2d(k=4, s=2, p=1)."""
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(0)
    x = rng.standard_normal((1, 6, 5, 3)).astype(np.float32)  # NHWC
    w = rng.standard_normal((3, 2, 4, 4)).astype(np.float32)  # torch (in,out,kh,kw)

    tconv = torch.nn.ConvTranspose2d(3, 2, 4, stride=2, padding=1, bias=False)
    with torch.no_grad():
        tconv.weight.copy_(torch.tensor(w))
    t_out = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()

    mod = torch_conv_transpose(2, 3, 4, 2, 1)
    v = mod.init(jax.random.PRNGKey(0), jnp.array(x))
    # torch convT kernel (in,out,kh,kw) == flax conv kernel flipped spatially,
    # laid out (kh,kw,in,out)
    kernel = jnp.array(w.transpose(2, 3, 0, 1)[::-1, ::-1])
    j_out = mod.apply(
        {"params": {"kernel": kernel, "bias": jnp.zeros((2,))}}, jnp.array(x)
    )
    assert v["params"]["kernel"].shape == kernel.shape
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-4
    )


def test_conv_matches_torch_values():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 9, 9, 3)).astype(np.float32)
    w = rng.standard_normal((5, 3, 3, 3)).astype(np.float32)  # torch (out,in,kh,kw)
    b = rng.standard_normal((5,)).astype(np.float32)

    tc = torch.nn.Conv2d(3, 5, 3, stride=1, padding=1)
    with torch.no_grad():
        tc.weight.copy_(torch.tensor(w))
        tc.bias.copy_(torch.tensor(b))
    t_out = tc(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()

    mod = torch_conv(5, 3, 3, 1, 1)
    kernel = jnp.array(w.transpose(2, 3, 1, 0))  # (kh,kw,in,out)
    j_out = mod.apply({"params": {"kernel": kernel, "bias": jnp.array(b)}}, jnp.array(x))
    np.testing.assert_allclose(
        np.asarray(j_out).transpose(0, 3, 1, 2), t_out, rtol=1e-4, atol=1e-4
    )


def test_torch_init_distribution_bounds():
    """kaiming_uniform(a=sqrt(5)): |w| <= 1/sqrt(fan_in), non-degenerate."""
    mod = torch_conv(32, 16, 3, 1, 1)
    v = mod.init(jax.random.PRNGKey(0), jnp.ones((1, 8, 8, 16)))
    k = np.asarray(v["params"]["kernel"])
    bound = 1.0 / np.sqrt(16 * 9)
    assert np.abs(k).max() <= bound + 1e-7
    assert np.abs(k).max() > 0.5 * bound  # actually spread over the range
    b = np.asarray(v["params"]["bias"])
    assert np.abs(b).max() <= bound + 1e-7


def test_self_attention_shape_and_param_count():
    x = jnp.ones((2, 8, 8, 32))
    attn = SelfAttention2D(features=32, num_heads=8)
    v = attn.init(jax.random.PRNGKey(0), x)
    y = attn.apply(v, x)
    assert y.shape == x.shape
    # 4x (1x1 conv 32->32 + bias) = 4 * (1024 + 32), reference layers.py:316-319
    assert n_params(v) == 4 * (32 * 32 + 32)


def test_space_depth_roundtrip():
    x = jnp.arange(2 * 8 * 8 * 12, dtype=jnp.float32).reshape(2, 8, 8, 12)
    s = space_to_depth(x, 2)
    assert s.shape == (2, 4, 4, 48)
    np.testing.assert_array_equal(np.asarray(depth_to_space(s, 2)), np.asarray(x))


def test_padding_helpers():
    # reference models/layers.py:7-22 formulas
    assert calculate_padding(32, 16, 4, 2) == 1
    assert calculate_output_size(32, 4, 2, 1) == 16
    assert calculate_output_size(calculate_output_size(64, 3, 1, 1), 4, 2, 1) == 32
