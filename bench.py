#!/usr/bin/env python
"""Headline benchmark: Cond_SRVAE training throughput, 64px patches/sec/chip.

Grid-mode flagship config (BASELINE.json metric): one jitted, donated train
step of the canonical Cond_SRVAE (cr=1.2, ps=64, 48.9M params) over
grid-patchified synthetic tiles. Prints ONE JSON line:

    {"metric": ..., "value": N, "unit": "patches/sec/chip", "vs_baseline": R}

``vs_baseline`` divides by the measured PyTorch-reference CPU throughput
(``BASELINE_MEASURED.json``, produced by
``scripts/measure_reference_baseline.py``; reference publishes no numbers —
SURVEY §6).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


# v5e peak dense bf16 matmul throughput, per chip (public spec: 197 TFLOP/s
# bf16; 394 TOPS int8)
_V5E_PEAK_BF16 = 197e12

_PROBED = False


def _probe_backend(budget_s: float) -> bool:
    """True once the backend is up and a trivial jit completes on it.

    A wedged axon tunnel hangs even backend initialization, which would
    otherwise hang this whole benchmark (the driver runs it unattended).
    Deadline logic lives in ``utils/health.probe_backend`` (shared with
    ``python -m simple_vae_rs_tpu.doctor``); on exhaustion the caller
    aborts fast — an honest failure beats a silent hang (and no number
    is fabricated). CPU backends pass instantly.
    """
    from simple_vae_rs_tpu.utils.health import probe_backend

    return probe_backend(budget_s) is not None


def main(
    tiles_per_batch: int = 32,  # sweep-verified knee: throughput saturates here
    patch_size: int = 64,
    cr: float = 1.2,
    warmup: int = 3,
    steps: int = 20,
    bf16: bool = True,
    pallas_conv: bool = False,
    bf16_moments: bool = False,
    scan_steps="1",
) -> None:
    from simple_vae_rs_tpu.config import CondSRVAEConfig, MeshConfig, TrainConfig
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    global _PROBED
    if not _PROBED:
        budget = float(os.environ.get("SVRS_BENCH_PROBE_BUDGET_S", "900"))
        if not _probe_backend(budget):
            print(
                "bench: TPU tunnel unresponsive for the whole probe budget; "
                "aborting without a number — re-run when the tunnel recovers "
                "(SVRS_BENCH_PROBE_BUDGET_S tunes the budget)",
                file=sys.stderr,
            )
            # the leaked probe thread is a daemon but the wedged runtime's
            # own threads may not be; _exit guarantees the driver gets
            # control back
            os._exit(2)
    _PROBED = True

    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops.patchify import grid_sr_batch
    from simple_vae_rs_tpu.parallel.mesh import make_mesh
    from simple_vae_rs_tpu.train.engine import Trainer

    if pallas_conv:
        from simple_vae_rs_tpu.ops import pallas_conv as pc

        pc.enable(True)

    n_chips = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n_chips, model=1))

    cfg = CondSRVAEConfig(cr=cr, patch_size=patch_size)
    dtype = jnp.bfloat16 if bf16 else None
    model = CondSRVAE(cfg, dtype=dtype)
    trainer = Trainer(
        model,
        TrainConfig(use_bfloat16=bf16, bf16_moments=bf16_moments),
        mesh=mesh,
    )

    # synthetic 256px tile batch -> on-device grid patchify (the real data
    # path: 1 tile -> 16 patches, crop+normalize inside jit)
    rng = np.random.default_rng(0)
    lr_tiles = rng.random((tiles_per_batch, 128, 128, 4), dtype=np.float32) * 1000
    hr_tiles = rng.random((tiles_per_batch, 256, 256, 4), dtype=np.float32) * 1000

    patch_fn = jax.jit(lambda lr, hr: grid_sr_batch(lr, hr, patch_size))
    batch = patch_fn(jnp.asarray(lr_tiles), jnp.asarray(hr_tiles))
    batch = jax.block_until_ready(trainer._device_batch(batch))
    patches = batch[1].shape[0]

    state = trainer.init_state(batch)
    lr = jnp.float32(1e-4)

    # --scan_steps k: dispatch-fusion arm — k full optimizer steps per jit
    # call (lax.scan in trainer._train_multi_step). Amortizes per-dispatch
    # launch latency; steps rounds down to a whole number of fused calls
    # so the patches/step accounting stays exact.
    # --scan_steps auto: the engine's probe policy decides — time a short
    # unfused window, probe the warm dispatch round trip, fuse k=2 only
    # when the link is dispatch-bound (utils.health.choose_scan_steps;
    # the same rule a default `fit` applies after epoch 1).
    auto = str(scan_steps) in ("auto", "0")
    auto_info = None
    if auto:
        from simple_vae_rs_tpu.utils import health

        state, terms = trainer._train_step(state, batch, lr)  # compile+warm
        float(jax.device_get(terms["loss"]))
        t0 = time.perf_counter()
        probe_steps = 3
        for _ in range(probe_steps):
            state, terms = trainer._train_step(state, batch, lr)
        float(jax.device_get(terms["loss"]))
        per_step = (time.perf_counter() - t0) / probe_steps
        latency = health.dispatch_latency()
        k = health.choose_scan_steps(per_step, latency)
        auto_info = {
            "per_step_ms": round(per_step * 1e3, 2),
            "dispatch_ms": round(latency * 1e3, 2) if latency else None,
        }
    else:
        k = max(1, int(scan_steps))
    if k > 1:
        host = tuple(np.asarray(a) for a in batch)
        fused = trainer._device_batch_stack([host] * k)
        step_call = lambda st: trainer._train_multi_step(st, fused, lr)
        n_calls = max(1, steps // k)
        steps = n_calls * k
    else:
        step_call = lambda st: trainer._train_step(st, batch, lr)
        n_calls = steps

    for _ in range(max(1, warmup // k)):
        state, terms = step_call(state)
    # fetch a value, not just block_until_ready: the final loss depends on
    # every previous step's optimizer update, and a host read cannot
    # complete before the device work (block_until_ready proved unreliable
    # on the experimental tunneled backend).
    float(jax.device_get(terms["loss"]))

    t0 = time.perf_counter()
    for _ in range(n_calls):
        state, terms = step_call(state)
    float(jax.device_get(terms["loss"]))
    dt = time.perf_counter() - t0

    patches_per_sec_per_chip = patches * steps / dt / n_chips

    # MFU: XLA's own FLOP count for the compiled train step against the
    # chip's peak bf16 matmul rate (backs BASELINE.md's roofline claim).
    # Always normalized by the SINGLE-step graph's flops x steps: XLA's
    # cost_analysis counts a lax.scan body once, not x trip-count, so the
    # fused multi-step executable under-reports by exactly scan_steps
    # (measured on the v5e: k=2/4/8 reported 0.26/0.13/0.065 for a true
    # ~0.52 — this normalization makes all arms comparable).
    mfu = None
    try:
        cost = trainer._train_step.lower(
            state, batch, lr).compile().cost_analysis()
        step_flops = float(cost.get("flops", 0.0))
        if step_flops > 0:
            mfu = step_flops * steps / dt / n_chips / _V5E_PEAK_BF16
    except Exception:
        pass

    baseline = None
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE_MEASURED.json")
    if os.path.exists(path):
        with open(path) as fh:
            baseline = json.load(fh).get("patches_per_sec")
    vs_baseline = (
        patches_per_sec_per_chip / baseline if baseline else None
    )

    record = {
        "metric": "cond_srvae_train_64px_patches_per_sec_per_chip",
        "value": round(patches_per_sec_per_chip, 2),
        "unit": "patches/sec/chip",
        "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
    }
    if mfu is not None:
        record["mfu"] = round(mfu, 4)
    if k > 1 or auto:
        record["scan_steps"] = k
    if auto_info is not None:
        record["scan_auto"] = auto_info
    print(json.dumps(record))


def sweep() -> None:
    """Throughput sweep over tile-batch sizes (prints one line per point)."""
    for tiles in (2, 4, 8, 16, 32):
        try:
            main(tiles_per_batch=tiles)
        except Exception as e:  # e.g. HBM exhaustion at the top end
            print(json.dumps({"tiles": tiles, "error": str(e)[:120]}))


if __name__ == "__main__":
    if "--sweep" in sys.argv:
        sweep()
    else:
        scan = "1"
        if "--scan_steps" in sys.argv:
            scan = sys.argv[sys.argv.index("--scan_steps") + 1]
        main(
            pallas_conv="--pallas_conv" in sys.argv,
            bf16_moments="--bf16_moments" in sys.argv,
            scan_steps=scan,
        )
