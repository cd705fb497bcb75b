"""Config sanity (parity with reference ``tests/test_env.py``)."""

import json
from pathlib import Path

import tomllib


def test_pyproject_toml_parses():
    p = Path(__file__).parent.parent / "pyproject.toml"
    cfg = tomllib.loads(p.read_text())
    assert "project" in cfg
    assert cfg["project"]["name"] == "simple-vae-rs-tpu"


def test_renovate_json_parses():
    p = Path(__file__).parent.parent / "renovate.json"
    cfg = json.loads(p.read_text())
    assert "extends" in cfg


def test_ruff_toml_parses():
    p = Path(__file__).parent.parent / "ruff.toml"
    cfg = tomllib.loads(p.read_text())
    assert "lint" in cfg
