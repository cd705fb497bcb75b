"""Logger implementations: JSONL records, PNG image dumps, null logger."""

import json
import os

import numpy as np

from simple_vae_rs_tpu.utils.logging import JsonlLogger, NullLogger, make_logger


def test_jsonl_logger_records(tmp_path):
    lg = JsonlLogger(str(tmp_path / "run"))
    lg.log({"Loss/loss": 1.5, "Loss/mse": np.float32(0.5)}, step=3)
    lg.log({"Metrics/SSIM": 0.9}, step=4)
    lg.finish()
    lines = [
        json.loads(ln)
        for ln in open(tmp_path / "run" / "metrics.jsonl").read().splitlines()
    ]
    assert lines[0]["_step"] == 3
    assert lines[0]["Loss/loss"] == 1.5
    assert abs(lines[0]["Loss/mse"] - 0.5) < 1e-6
    assert lines[1]["Metrics/SSIM"] == 0.9


def test_jsonl_logger_images(tmp_path):
    lg = JsonlLogger(str(tmp_path / "run"))
    imgs = np.random.default_rng(0).random((2, 8, 8, 4)).astype(np.float32)
    lg.log_images({"Images/HR_Input": imgs}, step=1)
    lg.finish()
    files = os.listdir(tmp_path / "run" / "images")
    assert len(files) == 2
    assert all(f.endswith(".png") for f in files)


def test_null_logger_noops():
    lg = NullLogger()
    lg.log({"a": 1})
    lg.log_images({})
    lg.finish()


def test_make_logger_falls_back_to_jsonl(tmp_path, monkeypatch):
    # wandb is not installed in this environment -> JSONL fallback
    lg = make_logger("proj", "name", {}, run_dir=str(tmp_path))
    assert isinstance(lg, JsonlLogger)
    lg.finish()
