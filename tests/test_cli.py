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
