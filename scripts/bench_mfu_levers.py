#!/usr/bin/env python
"""MFU levers beyond 0.52: scan-fused multi-step training + XLA flag sweep.

BASELINE.md's decomposition puts the train step at 76.9% conv time at ~66%
of MXU peak with a bandwidth-bound elementwise tail. The two untried
levers from the roadmap are measured here, each against the same baseline
step as bench.py (canonical Cond_SRVAE, cr=1.2, ps=64, bf16, grid batch):

1. ``--scan K``: one jitted ``lax.scan`` over K train steps on K
   pre-staged batches — amortizes per-dispatch overhead (the tunnel's
   dispatch latency in this environment; host overhead on a real TPU
   host) and lets XLA schedule across step boundaries.
2. ``--flags``: recompile the SAME lowered step under candidate XLA:TPU
   compiler options (``.compile(compiler_options=...)``) and time each.

Prints one JSON line per measurement. Results are recorded in BASELINE.md
either way (win or negative result).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

_V5E_PEAK_BF16 = 197e12

FLAG_SETS = {
    "baseline": None,
    "vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "no_lhs": {"xla_tpu_enable_latency_hiding_scheduler": "false"},
    "flm_licm": {"xla_tpu_licm_size_inflation_ratio": "2"},
}


def _setup(tiles_per_batch=32, patch_size=64, cr=1.2):
    from simple_vae_rs_tpu.config import CondSRVAEConfig, MeshConfig, TrainConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops.patchify import grid_sr_batch
    from simple_vae_rs_tpu.parallel.mesh import make_mesh
    from simple_vae_rs_tpu.train.engine import Trainer
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    n_chips = len(jax.devices())
    mesh = make_mesh(MeshConfig(data=n_chips, model=1))
    model = CondSRVAE(CondSRVAEConfig(cr=cr, patch_size=patch_size),
                      dtype=jnp.bfloat16)
    trainer = Trainer(model, TrainConfig(use_bfloat16=True), mesh=mesh)
    rng = np.random.default_rng(0)
    lr_tiles = rng.random((tiles_per_batch, 128, 128, 4), dtype=np.float32) * 1000
    hr_tiles = rng.random((tiles_per_batch, 256, 256, 4), dtype=np.float32) * 1000
    patch_fn = jax.jit(lambda lr, hr: grid_sr_batch(lr, hr, patch_size))
    batch = patch_fn(jnp.asarray(lr_tiles), jnp.asarray(hr_tiles))
    batch = jax.block_until_ready(trainer._device_batch(batch))
    state = trainer.init_state(batch)
    return trainer, state, batch, batch[1].shape[0], n_chips


def _report(name, patches, steps, dt, n_chips, flops=None):
    rec = {
        "lever": name,
        "patches_per_sec_per_chip": round(patches * steps / dt / n_chips, 2),
        "seconds_per_step": round(dt / steps, 5),
    }
    if flops:
        rec["mfu"] = round(flops * steps / dt / n_chips / _V5E_PEAK_BF16, 4)
    print(json.dumps(rec), flush=True)
    return rec


def bench_scan(K=8, steps=16, warmup=2):
    """One dispatch per K fused steps vs one per step."""
    trainer, state, batch, patches, n_chips = _setup()
    lr = jnp.float32(1e-4)

    # baseline: K dispatches (same executable bench.py times)
    for _ in range(warmup * K):
        state, terms = trainer._train_step(state, batch, lr)
    float(jax.device_get(terms["loss"]))
    t0 = time.perf_counter()
    for _ in range(steps * K):
        state, terms = trainer._train_step(state, batch, lr)
    float(jax.device_get(terms["loss"]))
    base = _report("per_step_dispatch", patches, steps * K,
                   time.perf_counter() - t0, n_chips)

    # scan-fused: stage K copies of the batch (simulating K loader steps
    # resident on device) and run one scan per dispatch
    big = tuple(jnp.broadcast_to(b[None], (K,) + b.shape) for b in batch)
    big = jax.block_until_ready(big)

    def k_steps(state, batches):
        def body(s, b):
            s2, terms = trainer._step_fn(s, b, lr)
            return s2, terms["loss"]
        return jax.lax.scan(body, state, batches)

    k_steps_jit = jax.jit(k_steps, donate_argnums=(0,))
    for _ in range(warmup):
        state, losses = k_steps_jit(state, big)
    float(jax.device_get(losses[-1]))
    t0 = time.perf_counter()
    for _ in range(steps):
        state, losses = k_steps_jit(state, big)
    float(jax.device_get(losses[-1]))
    scan = _report(f"scan_{K}_steps", patches, steps * K,
                   time.perf_counter() - t0, n_chips)
    ratio = scan["patches_per_sec_per_chip"] / base["patches_per_sec_per_chip"]
    print(json.dumps({"lever": "scan_speedup", "ratio": round(ratio, 4)}))


def bench_flags(steps=12, warmup=2):
    trainer, state, batch, patches, n_chips = _setup()
    lr = jnp.float32(1e-4)
    lowered = jax.jit(
        trainer._step_fn, donate_argnums=(0,)
    ).lower(state, batch, lr)
    for name, opts in FLAG_SETS.items():
        try:
            compiled = (lowered.compile() if opts is None
                        else lowered.compile(compiler_options=opts))
            cost = compiled.cost_analysis()
            flops = float((cost or {}).get("flops", 0.0)) or None
            s = state
            for _ in range(warmup):
                s, terms = compiled(s, batch, lr)
            float(jax.device_get(terms["loss"]))
            t0 = time.perf_counter()
            for _ in range(steps):
                s, terms = compiled(s, batch, lr)
            float(jax.device_get(terms["loss"]))
            _report(f"flags:{name}", patches, steps,
                    time.perf_counter() - t0, n_chips, flops)
        except Exception as e:
            print(json.dumps({"lever": f"flags:{name}",
                              "error": str(e)[:160]}), flush=True)


if __name__ == "__main__":
    import sys

    if "--flags" in sys.argv:
        # CLAUDE.md ("Environment gotchas"): on the tunneled TPU a single
        # custom-flag recompile ran >50 min and wedged the remote compile
        # service for over an hour. Require an explicit confirmation so
        # nobody wedges the shared tunnel from the docstring alone.
        if "--i_know_this_can_wedge_the_tunnel" not in sys.argv:
            print(
                "--flags recompiles the train step under custom XLA "
                "compiler options. On THIS machine's tunneled TPU that "
                "has wedged the remote compile service for >1 h (see "
                "CLAUDE.md). The negative result is already recorded in "
                "BASELINE.md; re-run only on a locally attached TPU with "
                "--i_know_this_can_wedge_the_tunnel."
            )
            sys.exit(2)
        bench_flags()
    else:
        k = 8
        if "--scan" in sys.argv:
            k = int(sys.argv[sys.argv.index("--scan") + 1])
        bench_scan(K=k)
