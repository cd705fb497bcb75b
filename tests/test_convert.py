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


def test_export_vae_roundtrips_exactly():
    """torch sd -> our tree -> torch sd must reproduce every tensor
    bit-exactly, with only the BN ``num_batches_tracked`` buffers added
    (torch's strict load requires those keys; the reference's own
    state_dicts contain them)."""
    cfg = VAEConfig(cr=2.0, patch_size=16)
    model = VAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           jax.random.PRNGKey(1), train=False)
    sd = _synthesize_state_dict(cv._VAE_ENCODER + cv._VAE_DECODER, variables)
    back = cv.export_vae_state_dict(cv.convert_vae_state_dict(sd))
    extras = set(back) - set(sd)
    assert extras and all(k.endswith("num_batches_tracked") for k in extras)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)


def test_export_cond_roundtrips_exactly():
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    y = jnp.zeros((1, 8, 8, 4))
    variables = model.init(
        {"params": jax.random.PRNGKey(0)}, x, y, jax.random.PRNGKey(1),
        train=False
    )
    sd = _synthesize_state_dict(cv._COND_MAP, variables)
    back = cv.export_cond_state_dict(cv.convert_cond_state_dict(sd))
    extras = set(back) - set(sd)
    assert extras and all(k.endswith("num_batches_tracked") for k in extras)
    for k in sd:
        np.testing.assert_array_equal(back[k], sd[k], err_msg=k)
    # gammas stay out of the exported dict by default (reference
    # checkpoints never contain them — SURVEY §2.2-7) ...
    assert not any("gamma" in k for k in back)
    # ... but include_gammas makes the roundtrip lossless
    tree = cv.convert_cond_state_dict(sd)
    tree["params"]["gammax"] = np.float32(0.5)
    sd2 = cv.export_cond_state_dict(tree, include_gammas=True)
    again = cv.convert_cond_state_dict(sd2)
    assert float(again["params"]["gammax"]) == 0.5
    assert float(again["params"]["gammay"]) == 1.0


def test_export_convtranspose_value_parity(tmp_path):
    """An exported ConvT kernel must reproduce OUR outputs when run through
    torch's ConvTranspose2d — the serving-stack handoff in miniature."""
    torch = pytest.importorskip("torch")
    from simple_vae_rs_tpu.ops.conv_blocks import torch_conv_transpose

    rng = np.random.default_rng(3)
    x = rng.standard_normal((1, 5, 5, 3)).astype(np.float32)
    mod = torch_conv_transpose(2, 3, 4, 2, 1)
    params = mod.init(jax.random.PRNGKey(0), jnp.array(x))["params"]
    ours = mod.apply({"params": params}, jnp.array(x))

    sd = cv._conv_export(jax.device_get(params), "m", transpose=True)
    p = str(tmp_path / "w.pth")
    cv.save_torch_state_dict(p, sd)
    loaded = torch.load(p, weights_only=True)
    tconv = torch.nn.ConvTranspose2d(3, 2, 4, stride=2, padding=1)
    tconv.load_state_dict({"weight": loaded["m.weight"],
                           "bias": loaded["m.bias"]})
    got = tconv(torch.tensor(x.transpose(0, 3, 1, 2))).detach().numpy()
    np.testing.assert_allclose(
        got, np.asarray(ours).transpose(0, 3, 1, 2), rtol=1e-4, atol=1e-5
    )


def test_converter_script_exports_latent_override_checkpoints(tmp_path):
    """The converter script must rebuild its template model with the
    checkpoint's --latent_size (CLAUDE.md's documented large-patch path);
    without it the orbax restore fails on head-shape mismatch."""
    import importlib.util
    import os
    import sys

    from simple_vae_rs_tpu.config import TrainConfig
    from simple_vae_rs_tpu.train.checkpoint import save_checkpoint
    from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer

    cfg = VAEConfig(cr=2.0, patch_size=16, latent_size_override=128)
    model = VAE(cfg)
    x = jnp.zeros((1, 16, 16, 4))
    variables = model.init({"params": jax.random.PRNGKey(0)}, x,
                           jax.random.PRNGKey(1), train=False)
    state = create_train_state(variables, make_optimizer(TrainConfig()),
                               jax.random.PRNGKey(0))
    src = str(tmp_path / "trained")
    save_checkpoint(src, state, epoch=0)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    spec = importlib.util.spec_from_file_location(
        "convert_checkpoint", os.path.join(repo, "scripts",
                                           "convert_checkpoint.py")
    )
    script = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(script)
    dst = str(tmp_path / "out.pth")
    argv = ["convert_checkpoint.py", src, dst, "--to_torch",
            "--model_type", "VAE", "-cr", "2.0", "--patch_size", "16",
            "--latent_size", "128"]
    old = sys.argv
    sys.argv = argv
    try:
        script.main()
    finally:
        sys.argv = old
    sd = cv.load_torch_state_dict(dst)
    # the latent head carries the override's channel count (128//64 * 2)
    assert sd["encoder.5.weight"].shape[0] == 2 * (128 // 64)


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
