"""Tests for the quality-parity reporting tools (scripts/quality_parity.py).

The training arms themselves are long-running measurement jobs exercised
out-of-band (BASELINE.md records their archives); these tests pin the
cheap, deterministic layer on top — archive discovery, seed parsing, and
the spread-vs-gap arithmetic of ``report_seeds``.
"""

import importlib.util
import json
import os
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture()
def qp():
    spec = importlib.util.spec_from_file_location(
        "quality_parity", os.path.join(REPO, "scripts", "quality_parity.py")
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules["quality_parity"] = mod
    spec.loader.exec_module(mod)
    yield mod
    del sys.modules["quality_parity"]


def _archive(path, side, seed, finals, ssim_key="ssim_sr"):
    data = {
        "side": side, "n_params": 4504892, "seed": seed,
        "epochs": [
            {"epoch": i + 1, "train_loss": v, "val_loss": v,
             ssim_key: 0.7, "psnr_sr": 20.0, "seconds": 1.0}
            for i, v in enumerate(finals)
        ],
    }
    with open(path, "w") as fh:
        json.dump(data, fh)


def test_report_seeds_spread_vs_gap(qp, tmp_path, monkeypatch, capsys):
    """Verdict compares the cross-side gap against the WIDEST within-side
    spread, parsing seeds out of the _sN-suffixed archive names."""
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-100.0, -4000.0])
    _archive(tmp_path / "quality_parity_reference_ps32_s1_e40.json",
             "reference_ps32_s1", 1, [-100.0, -4100.0])
    _archive(tmp_path / "quality_parity_tpu_ps32_e40.json",
             "tpu_ps32", 0, [-100.0, -3900.0])
    _archive(tmp_path / "quality_parity_tpu_ps32_s2_e40.json",
             "tpu_ps32_s2", 2, [-100.0, -3700.0])
    # the wiring arm must NOT count as a seed replicate
    _archive(tmp_path / "quality_parity_tpu_torchwire_ps32_e40.json",
             "tpu_torchwire_ps32", 0, [-100.0, -1000.0])
    qp.report_seeds(2)
    out = capsys.readouterr().out
    # per-seed rows present, torchwire excluded
    assert "reference       0      -4000.0" in out
    assert "tpu             2      -3700.0" in out
    assert "-1000.0" not in out
    # spreads: ref 100, tpu 200; gap |(-4050)-(-3800)| = 250 -> 1.2x widest
    assert "reference 100.0" in out and "tpu 200.0" in out
    assert "cross-side gap of means: 250.0" in out
    assert "1.2x the widest within-side spread" in out


def test_report_seeds_within_noise_verdict(qp, tmp_path, monkeypatch, capsys):
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-4000.0])
    _archive(tmp_path / "quality_parity_reference_ps32_s1_e40.json",
             "reference_ps32_s1", 1, [-3600.0])
    _archive(tmp_path / "quality_parity_tpu_ps32_e40.json",
             "tpu_ps32", 0, [-3900.0])
    _archive(tmp_path / "quality_parity_tpu_ps32_s1_e40.json",
             "tpu_ps32_s1", 1, [-3750.0])
    qp.report_seeds(1)
    out = capsys.readouterr().out
    assert "WITHIN seed noise" in out


def test_report_seeds_vae_family(qp, tmp_path, monkeypatch, capsys):
    """The vae family reads the _vae archives (ssim_recon metric) and
    compares e80 and e40 replicates at the same truncation epoch; cond
    ps32 archives in the same directory must not leak in."""
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    # seed-0 replicates ran to e80; later seeds stopped at e40
    _archive(tmp_path / "quality_parity_reference_vae_e80.json",
             "reference_vae", 0, [-100.0] + [-2000.0] * 79, "ssim_recon")
    _archive(tmp_path / "quality_parity_reference_vae_s1_e40.json",
             "reference_vae_s1", 1, [-100.0, -2200.0], "ssim_recon")
    _archive(tmp_path / "quality_parity_tpu_vae_e80.json",
             "tpu_vae", 0, [-100.0] + [-1900.0] * 79, "ssim_recon")
    _archive(tmp_path / "quality_parity_tpu_vae_s1_e40.json",
             "tpu_vae_s1", 1, [-100.0, -2100.0], "ssim_recon")
    # a cond-family archive must not be picked up by the vae pattern
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-100.0, -9000.0])
    qp.report_seeds(2, family="vae")
    out = capsys.readouterr().out
    assert "ssim_recon" in out
    # e80 archives truncate to the comparison epoch (value at epoch 2)
    assert "reference       0      -2000.0" in out
    assert "tpu             1      -2100.0" in out
    assert "-9000.0" not in out
    # ref mean -2100, tpu mean -2000 -> gap 100; spreads 200 each
    assert "cross-side gap of means: 100.0" in out
    assert "WITHIN seed noise" in out


def test_report_seeds_requires_both_sides(qp, tmp_path, monkeypatch):
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-4000.0])
    with pytest.raises(FileNotFoundError):
        qp.report_seeds(1)


def test_report_seeds_requires_two_seeds_per_side(qp, tmp_path, monkeypatch):
    """One replicate per side has no within-side spread — the verdict
    must refuse cleanly (a 0-width spread would divide by zero)."""
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-4000.0])
    _archive(tmp_path / "quality_parity_tpu_ps32_e40.json",
             "tpu_ps32", 0, [-3900.0])
    with pytest.raises(FileNotFoundError, match=">=2"):
        qp.report_seeds(1)


def test_seed_replicates_drops_smoke_runs(qp, tmp_path, monkeypatch):
    """Archives shorter than min_epochs (aborted/smoke runs) are not
    replicates — one must not shrink the comparison range for everyone
    (the plot takes the min length across the group)."""
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    _archive(tmp_path / "quality_parity_reference_ps32_e40.json",
             "reference_ps32", 0, [-1.0] * 40)
    _archive(tmp_path / "quality_parity_tpu_ps32_e40.json",
             "tpu_ps32", 0, [-1.0] * 40)
    _archive(tmp_path / "quality_parity_tpu_ps32_s4_e2.json",
             "tpu_ps32_s4", 4, [-1.0, -2.0])
    groups = qp.seed_replicates("cond", min_epochs=40)
    assert sorted(groups["tpu"]) == [0]
    assert sorted(groups["reference"]) == [0]


def test_cli_rejects_small_preset_for_vae(qp, monkeypatch):
    """--preset small only rewrites the Cond CFG; a VAE run would be
    archived under a misleading _ps32 name the cond globs pick up."""
    monkeypatch.setattr(
        sys, "argv",
        ["quality_parity.py", "--model", "vae", "--preset", "small",
         "--side", "tpu"],
    )
    with pytest.raises(SystemExit):
        qp.main()


def test_bicubic_baseline_and_hf_dataset_arm(qp):
    """The shared bicubic baseline helper scores the same arrays both
    sides see; the hf dataset arm flows through build_dataset and keeps
    LR/HR extrema consistent (the PSF-stable anchor property the round-4
    study established — per-image min-max must not scramble the pair)."""
    import numpy as np

    qp.CFG.update(dataset="hf", n_tiles=8, patch_size=32)
    (lr_tr, hr_tr), (lr_va, hr_va) = qp.build_dataset()
    assert lr_va.shape[1:] == (16, 16, 4) and hr_va.shape[1:] == (32, 32, 4)
    # normalized to [0,1] per image
    assert float(lr_va.min()) >= 0.0 and float(lr_va.max()) <= 1.0
    metric_sums = qp.make_metric_fns(force_cpu=True)
    s, p = qp.bicubic_baseline(lr_va, hr_va, metric_sums)
    assert 0.4 < s < 1.0 and 10.0 < p < 40.0
    # determinism: same numbers on a second call
    s2, p2 = qp.bicubic_baseline(lr_va, hr_va, metric_sums)
    assert s == s2 and p == p2


def test_report_prints_mmse_and_baseline_columns(qp, tmp_path, monkeypatch,
                                                 capsys):
    """--report renders the MMSE product and bicubic-bar columns when an
    archive carries them (and dashes when it doesn't)."""
    import json as _json

    data = {
        "side": "tpu_hf", "n_params": 1, "seed": 0,
        "ssim_baseline": 0.71, "psnr_baseline": 20.96,
        "epochs": [{"epoch": 1, "train_loss": 0.0, "val_loss": -1.0,
                    "ssim_sr": 0.62, "psnr_sr": 18.1,
                    "ssim_mmse": 0.63, "psnr_mmse": 18.2,
                    "seconds": 1.0}],
    }
    with open(tmp_path / "quality_parity_tpu_hf_e1.json", "w") as fh:
        _json.dump(data, fh)
    monkeypatch.setattr(qp, "OUT_DIR", str(tmp_path))
    qp.report(None)
    out = capsys.readouterr().out
    assert "0.6300" in out and "0.7100" in out and "20.96" in out
