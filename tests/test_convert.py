"""Torch-checkpoint converter: mapping completeness and shape correctness.

A reference-shaped ``state_dict`` is synthesized (keys and torch tensor
layouts per the documented reference architecture) and converted; the
result must drop into our models' variable trees exactly.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig, VAEConfig
from simple_vae_rs_tpu.models import VAE, CondSRVAE
from simple_vae_rs_tpu.utils import convert as cv


def _torch_shape(our_name: str, leaf_name: str, shape):
    """Invert our layout to the torch tensor layout for synthesis."""
    if leaf_name == "kernel":
        kh, kw, cin, cout = shape
        if "upsample" in our_name:
            return (cin, cout, kh, kw)  # ConvTranspose2d
        return (cout, cin, kh, kw)  # Conv2d
    return shape  # bias / bn vectors


def _synthesize_state_dict(mapping, variables):
    rng = np.random.default_rng(0)
    sd = {}
    ours_to_theirs = {ours: theirs for ours, theirs, _, _ in mapping}
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    for ours, theirs, is_block, is_up in mapping:
        mod = params[ours]
        if is_block:
            for sub in ("conv", "upsample" if is_up else "downsample"):
                k = mod[sub]["kernel"]
                sd[f"{theirs}.{sub}.weight"] = rng.standard_normal(
                    _torch_shape(sub, "kernel", k.shape)
                ).astype(np.float32)
                sd[f"{theirs}.{sub}.bias"] = rng.standard_normal(
                    mod[sub]["bias"].shape
                ).astype(np.float32)
            if "bn" in mod:
                c = mod["bn"]["scale"].shape[0]
                for nm in ("weight", "bias", "running_mean", "running_var"):
                    sd[f"{theirs}.bn.{nm}"] = rng.standard_normal(c).astype(np.float32)
        else:
            k = mod["kernel"]
            sd[f"{theirs}.weight"] = rng.standard_normal(
                _torch_shape("conv", "kernel", k.shape)
            ).astype(np.float32)
            sd[f"{theirs}.bias"] = rng.standard_normal(mod["bias"].shape).astype(
                np.float32
            )
    return sd


def _assert_same_tree(converted, variables):
    conv_p = jax.tree.map(np.shape, converted["params"])
    init_p = jax.tree.map(np.shape, jax.device_get(variables["params"]))
    assert conv_p == init_p
    conv_s = jax.tree.map(np.shape, converted["batch_stats"])
    init_s = jax.tree.map(np.shape, jax.device_get(variables["batch_stats"]))
    assert conv_s == init_s


def test_convert_vae_complete_and_loadable():
    cfg = VAEConfig(cr=2.0, patch_size=16)
    model = VAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, jax.random.PRNGKey(1),
                           train=False)
    sd = _synthesize_state_dict(cv._VAE_ENCODER + cv._VAE_DECODER, variables)
    converted = cv.convert_vae_state_dict(sd)
    _assert_same_tree(converted, variables)
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        x, jax.random.PRNGKey(2), train=False,
    )
    assert out[0].shape == (1, 16, 16, 4)
    assert float(converted["params"]["gamma"]) == 1.0


def test_convert_cond_complete_and_loadable():
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    y = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1), train=False
    )
    sd = _synthesize_state_dict(cv._COND_MAP, variables)
    converted = cv.convert_cond_state_dict(sd)
    _assert_same_tree(converted, variables)
    out = model.apply(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        x, y, jax.random.PRNGKey(2), train=False,
    )
    assert out[0].shape == (1, 16, 16, 4)


def test_convtranspose_conversion_value_parity():
    """Converted ConvT weights must reproduce torch outputs exactly."""
    torch = pytest.importorskip("torch")
    from simple_vae_rs_tpu.ops.conv_blocks import torch_conv_transpose

    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    tconv = torch.nn.ConvTranspose2d(3, 2, 4, stride=2, padding=1)
    want = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()

    sd = {"m.weight": tconv.weight.detach().numpy(), "m.bias": tconv.bias.detach().numpy()}
    p = cv._conv(sd, "m", transpose=True)
    mod = torch_conv_transpose(2, 3, 4, 2, 1)
    got = mod.apply({"params": {"kernel": jnp.array(p["kernel"]),
                                "bias": jnp.array(p["bias"])}}, jnp.array(x))
    np.testing.assert_allclose(
        np.asarray(got).transpose(0, 3, 1, 2), want, rtol=1e-4, atol=1e-5
    )


def test_load_torch_state_dict_handles_numpy_pickles(tmp_path):
    """torch>=2.6 defaults weights_only=True, which rejects checkpoints
    whose leaves pickled as numpy arrays — the legacy unpickler (arbitrary
    code execution) requires the explicit allow_pickle=True opt-in and
    still warns; without it the loader refuses with a clear error."""
    import warnings

    import numpy as np
    import pytest
    import torch

    from simple_vae_rs_tpu.utils.convert import load_torch_state_dict

    p = str(tmp_path / "np.pth")
    torch.save({"w": np.ones((2, 3), np.float32)}, p)
    with pytest.raises(ValueError, match="allow_pickle"):
        load_torch_state_dict(p)
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        sd = load_torch_state_dict(p, allow_pickle=True)
    assert sd["w"].shape == (2, 3)
    assert any("weights_only" in str(w.message) for w in rec)

    # plain tensor state_dicts stay on the safe path (no warning)
    p2 = str(tmp_path / "t.pth")
    torch.save({"w": torch.ones(2, 3)}, p2)
    with warnings.catch_warnings(record=True) as rec2:
        warnings.simplefilter("always")
        sd2 = load_torch_state_dict(p2)
    assert sd2["w"].shape == (2, 3)
    assert not any("weights_only" in str(w.message) for w in rec2)
