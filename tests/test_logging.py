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


# ----------------------------------------------------------- tensorboard
def test_tensorboard_logger_roundtrip(tmp_path):
    """Scalars written by TensorBoardLogger parse back (tags, values, steps)
    through the CRC-verifying reader; first record is the file version."""
    from simple_vae_rs_tpu.utils.tensorboard import (
        TensorBoardLogger,
        read_tfevents,
    )

    lg = TensorBoardLogger(str(tmp_path))
    lg.log({"Loss/loss": 1.5, "Loss/kld": -2.25}, step=1)
    lg.log({"Loss/loss": 0.75}, step=2)
    lg.log_images({"Images/SR_Output": np.random.rand(2, 8, 8, 4)}, step=2)
    lg.finish()

    (fname,) = os.listdir(tmp_path)
    events = read_tfevents(str(tmp_path / fname))
    assert events[0]["file_version"] == "brain.Event:2"
    assert events[1]["step"] == 1
    assert events[1]["Loss/loss"] == 1.5
    assert events[1]["Loss/kld"] == -2.25
    assert events[2]["step"] == 2 and events[2]["Loss/loss"] == 0.75
    assert events[3]["Images/SR_Output/0"] == "<image>"
    assert events[3]["Images/SR_Output/1"] == "<image>"


def test_tensorboard_record_framing_is_tfrecord(tmp_path):
    """Byte-level check of the TFRecord contract: length header, masked
    CRC32C of header and payload (what stock TensorBoard validates)."""
    import struct

    from simple_vae_rs_tpu.utils.tensorboard import (
        TensorBoardLogger,
        _masked_crc,
    )

    lg = TensorBoardLogger(str(tmp_path))
    lg.log({"a": 1.0}, step=0)
    lg.finish()
    (fname,) = os.listdir(tmp_path)
    data = (tmp_path / fname).read_bytes()
    i = 0
    n_records = 0
    while i < len(data):
        header = data[i:i + 8]
        (ln,) = struct.unpack("<Q", header)
        assert struct.unpack("<I", data[i + 8:i + 12])[0] == _masked_crc(header)
        rec = data[i + 12:i + 12 + ln]
        assert struct.unpack("<I", data[i + 12 + ln:i + 16 + ln])[0] == _masked_crc(rec)
        i += 16 + ln
        n_records += 1
    assert n_records == 2  # file-version event + one scalar event
    # corrupting a payload byte must fail the CRC check loudly
    from simple_vae_rs_tpu.utils.tensorboard import read_tfevents
    import pytest

    bad = bytearray(data)
    bad[13] ^= 0xFF
    (tmp_path / "bad").write_bytes(bytes(bad))
    with pytest.raises(ValueError, match="crc"):
        read_tfevents(str(tmp_path / "bad"))


def test_crc32c_known_vectors():
    """CRC32C against published test vectors (RFC 3720 appendix B.4)."""
    from simple_vae_rs_tpu.utils.tensorboard import _crc32c

    assert _crc32c(b"") == 0x0
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA
    assert _crc32c(b"\xff" * 32) == 0x62A8AB43
    assert _crc32c(bytes(range(32))) == 0x46DD794E
    assert _crc32c(b"123456789") == 0xE3069283


def test_make_logger_tensorboard_tee(tmp_path, monkeypatch):
    """tensorboard=True tees JSONL + event file under the same run dir."""
    import builtins

    real_import = builtins.__import__

    def no_wandb(name, *a, **k):
        if name == "wandb":
            raise ImportError
        return real_import(name, *a, **k)

    monkeypatch.setattr(builtins, "__import__", no_wandb)
    lg = make_logger("P", "N", config={}, run_dir=str(tmp_path),
                     tensorboard=True)
    lg.log({"Loss/loss": 3.0}, step=4)
    lg.finish()
    run = tmp_path / "P-N"
    assert (run / "metrics.jsonl").exists()
    from simple_vae_rs_tpu.utils.tensorboard import read_tfevents

    (ev,) = os.listdir(run / "tb")
    events = read_tfevents(str(run / "tb" / ev))
    assert events[1]["Loss/loss"] == 3.0 and events[1]["step"] == 4
