"""CLI semantics: flag surface and --test behavior.

Parity target: reference ``train.py:54-68`` — ``--test`` skips training
entirely; here it additionally requires a checkpoint (testing random
weights is never what the user meant).
"""

import pytest

from simple_vae_rs_tpu.cli import main, parse_args


def test_flag_surface_defaults():
    args = parse_args([])
    assert args.epochs == 200
    assert args.batch_size == 16
    assert args.patch_size == 64
    assert args.compression_ratio == 1.5
    assert args.model_type == "Cond_SRVAE"
    assert args.val_metrics_every == 5
    assert args.pre_epochs == 0
    assert not args.test


def test_test_flag_without_ckpt_raises():
    args = parse_args(["--test", "--dataset", "synthetic"])
    with pytest.raises(ValueError, match="--test requires --model_ckpt"):
        main(args)


def test_negative_cr_raises():
    args = parse_args(["-cr", "-1"])
    with pytest.raises(ValueError, match="Compression ratio"):
        main(args)


def test_new_flags_parse_with_safe_defaults():
    args = parse_args([])
    assert args.backend == ""          # no override by default
    assert args.accum_steps == 1       # no accumulation by default
    assert not args.async_ckpt
    assert not args.tensorboard
    args = parse_args(["--backend", "cpu", "--accum_steps", "4",
                       "--async_ckpt", "--tensorboard"])
    assert (args.backend, args.accum_steps) == ("cpu", 4)
    assert args.async_ckpt and args.tensorboard


def test_config_drift_warnings():
    """Resume/--test with flags that disagree with the checkpoint's
    embedded model config warns per differing key and stays silent on a
    match (and on legacy checkpoints with no recorded config)."""
    from simple_vae_rs_tpu.cli import _config_drift

    rec = {"type": "Cond_SRVAE", "cr": 1.2, "patch_size": 64}
    cur = {"type": "Cond_SRVAE", "cr": 2.0, "patch_size": 64,
           "channels": 4}
    lines = _config_drift(rec, cur)
    assert lines == ["warning: cr=2.0 differs from the checkpoint's "
                     "recorded cr=1.2"]
    assert _config_drift(rec, dict(rec)) == []
    assert _config_drift({}, cur) == []  # legacy checkpoint: silent


def test_init_multihost_calls_distributed_initialize(monkeypatch):
    """--multihost runs jax.distributed.initialize() exactly once, before
    any device use; without the flag it is never called."""
    import argparse

    import jax

    from simple_vae_rs_tpu.cli import _init_multihost

    calls = []
    monkeypatch.setattr(jax.distributed, "initialize",
                        lambda *a, **k: calls.append(1))
    monkeypatch.setattr(jax, "process_index", lambda: 0)
    monkeypatch.setattr(jax, "process_count", lambda: 4)
    monkeypatch.setattr(jax, "local_device_count", lambda: 8)
    args = argparse.Namespace(multihost=True)
    _init_multihost(args)
    _init_multihost(args)  # idempotent
    assert calls == [1]
    _init_multihost(argparse.Namespace(multihost=False))
    assert calls == [1]


def test_apply_backend_is_idempotent(monkeypatch):
    """_apply_backend must config-update exactly once per Namespace — a
    second call (entrypoint then main) must not touch jax again, which
    would raise after the backend has initialized."""
    import simple_vae_rs_tpu.cli as cli

    calls = []
    monkeypatch.setattr(
        cli.jax.config, "update",
        lambda k, v: calls.append((k, v)),
    )
    args = parse_args(["--backend", "cpu"])
    cli._apply_backend(args)
    cli._apply_backend(args)
    assert calls == [("jax_platforms", "cpu")]
    # no override -> no update at all
    calls.clear()
    cli._apply_backend(parse_args([]))
    assert calls == []


def test_model_flags_resolve_from_checkpoint_meta(tmp_path):
    """Unset model-shape flags resolve from the checkpoint's embedded
    config (path-alone --test/resume, matching the serve/raster CLIs);
    explicit flags win."""
    import json

    ckpt = tmp_path / "job"
    (tmp_path / "job.meta.json").write_text(json.dumps({
        "epoch": 7,
        "model": {"type": "Cond_SRVAE", "cr": 2.0, "patch_size": 32,
                  "channels": 4, "latent_size_override": 0,
                  "torch_regroup": True},
    }))
    args = parse_args(["--test", "--model_ckpt", str(ckpt)])
    assert args.model_type == "Cond_SRVAE"
    assert args.compression_ratio == 2.0
    assert args.patch_size == 32
    assert args.latent_size == 0
    assert args.torch_regroup is True  # converted-ckpt wiring carried over
    # explicit flag beats the recorded config (drift warning fires later)
    args = parse_args(["--test", "--model_ckpt", str(ckpt),
                       "--patch_size", "64"])
    assert args.patch_size == 64
    assert args.compression_ratio == 2.0


def test_vae_patch_size_resolution_undoes_lr_halving(tmp_path):
    """The recorded patch size is the MODEL's; the plain VAE trains on the
    LR stream at --patch_size // 2, so the flag reconstructs doubled."""
    import json

    ckpt = tmp_path / "vae_job"
    (tmp_path / "vae_job.meta.json").write_text(json.dumps({
        "model": {"type": "VAE", "cr": 1.28, "patch_size": 32},
    }))
    args = parse_args(["--test", "--model_ckpt", str(ckpt)])
    assert args.model_type == "VAE"
    assert args.patch_size == 64
    assert args.compression_ratio == 1.28


def test_model_flags_without_ckpt_keep_reference_defaults():
    args = parse_args([])
    assert (args.model_type, args.compression_ratio, args.patch_size,
            args.latent_size) == ("Cond_SRVAE", 1.5, 64, 0)
    assert args.torch_regroup is False
