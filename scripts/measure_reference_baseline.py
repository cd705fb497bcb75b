#!/usr/bin/env python
"""Measure the PyTorch reference's CPU training throughput.

BASELINE.md's "to be measured" row: the reference publishes no numbers, so
the rebuild's ``vs_baseline`` denominator is measured here by *running* the
reference implementation (not copying it) on this machine's CPU under the
canonical config (Cond_SRVAE, ps=64, bs=8, cr=1.2 — reference
``script.sh:20``), timing its hot loop (zero_grad -> train_step -> backward
-> clip -> step, reference ``models/base.py:97-116``).

Writes ``BASELINE_MEASURED.json`` at the repo root; ``bench.py`` reads it.
"""

import json
import os
import sys
import time
import types

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def _stub_missing_modules():
    """The reference imports wandb/lpips/skimage at module scope; stub the
    ones not installed so the model classes import for timing."""

    class _NoopLPIPS:
        def __init__(self, *a, **k):
            pass

        def to(self, device):
            return self

        def eval(self):
            return self

        def __call__(self, *a, **k):
            import torch

            return torch.tensor(0.0)

    if "lpips" not in sys.modules:
        try:
            import lpips  # noqa: F401
        except ImportError:
            sys.modules["lpips"] = types.SimpleNamespace(LPIPS=_NoopLPIPS)
    try:
        import skimage  # noqa: F401
    except ImportError:
        met = types.SimpleNamespace(structural_similarity=lambda *a, **k: 0.0)
        sys.modules["skimage"] = types.SimpleNamespace(metrics=met)
        sys.modules["skimage.metrics"] = met
    try:
        import wandb  # noqa: F401
    except ImportError:
        sys.modules["wandb"] = types.SimpleNamespace(
            init=lambda *a, **k: None, Image=lambda *a, **k: None
        )


def main(batch_size=8, patch_size=64, cr=1.2, warmup=2, steps=10):
    _stub_missing_modules()
    sys.path.insert(0, REFERENCE)
    import torch

    import models  # reference package

    torch.manual_seed(0)
    model = models.Cond_SRVAE(cr, patch_size=patch_size)
    model.train()
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-4)

    x = torch.rand(batch_size, 4, patch_size, patch_size)
    y = torch.rand(batch_size, 4, patch_size // 2, patch_size // 2)
    batch = (y, x)

    def step():
        optimizer.zero_grad()
        loss, _ = model.train_step(batch, "cpu")
        loss.backward()
        torch.nn.utils.clip_grad_norm_(model.parameters(), 1.0)
        optimizer.step()

    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(steps):
        step()
    dt = time.perf_counter() - t0

    patches_per_sec = batch_size * steps / dt
    result = {
        "model": "Cond_SRVAE",
        "config": {"batch_size": batch_size, "patch_size": patch_size, "cr": cr},
        "device": "cpu",
        "torch_threads": torch.get_num_threads(),
        "seconds_per_step": dt / steps,
        "patches_per_sec": patches_per_sec,
        "steps_timed": steps,
    }
    out = os.path.join(REPO, "BASELINE_MEASURED.json")
    with open(out, "w") as fh:
        json.dump(result, fh, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
