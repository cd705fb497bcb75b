#!/usr/bin/env python
"""Whole-raster serving throughput on the real TPU.

Times ``SuperResolver.super_resolve_tile`` (and optionally
``uncertainty_tile``) at the canonical Cond_SRVAE config over an
arbitrary-size LR raster. Weights are random-init — tile throughput is
shape-dependent only — so no checkpoint is needed.

    python scripts/bench_tile.py                 # 256x256 LR, bf16-ish f32
    python scripts/bench_tile.py --hw 512 --int8 # 512x512 LR, int8 decode
    python scripts/bench_tile.py --uncertainty --samples 32
    python scripts/bench_tile.py --hw 512 --batch 64  # amortize dispatches

Prints one JSON line per measurement. On this machine the tunnel's
per-dispatch latency dominates (one compiled dispatch per window batch);
a locally attached v5e sees the device-time story.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=256, help="LR raster side")
    ap.add_argument("-cr", type=float, default=1.2)
    ap.add_argument("--patch_size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--overlap", type=int, default=None)
    ap.add_argument("--samples", type=int, default=32,
                    help="draws for --uncertainty")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--uncertainty", action="store_true")
    ap.add_argument("--no_moments", action="store_true",
                    help="mask the device-moments hook so --uncertainty "
                    "times the (window, draw)-packing fallback — the A/B "
                    "for the hook's dispatch/transfer win")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--backend", default="",
                    help="JAX platform override (e.g. 'cpu'); same "
                    "semantics as train.py --backend")
    ap.add_argument("--probe_budget", type=float, default=float(
        os.environ.get("SVRS_BENCH_PROBE_BUDGET_S", "900")))
    args = ap.parse_args()

    from simple_vae_rs_tpu.utils.backend import apply_backend

    apply_backend(args.backend)
    import jax

    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache
    from simple_vae_rs_tpu.utils.health import probe_backend

    enable_compilation_cache()
    if probe_backend(args.probe_budget) is None:
        print("accelerator unreachable within the probe budget; aborting",
              file=sys.stderr)
        # hard exit: the stuck probe thread aborts normal interpreter
        # teardown in the native runtime (SIGABRT would mask the 2)
        sys.stderr.flush()
        os._exit(2)
    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops.tiling import grid_starts
    from simple_vae_rs_tpu.serve import SuperResolver

    cfg = CondSRVAEConfig(cr=args.cr, patch_size=args.patch_size)
    model = CondSRVAE(cfg)
    ps = args.patch_size
    variables = jax.jit(
        lambda r: model.init(
            {"params": r},
            jnp.zeros((1, ps, ps, 4)),
            jnp.zeros((1, ps // 2, ps // 2, 4)),
            jax.random.PRNGKey(1),
            train=False,
        )
    )(jax.random.PRNGKey(0))
    resolver = SuperResolver(model, variables, int8=args.int8)
    if args.no_moments:
        resolver.super_resolve_moments = None  # packing fallback

    rng = np.random.default_rng(0)
    lr = rng.random((args.hw, args.hw, 4), np.float32)
    p = ps // 2
    overlap = min(4, p // 2) if args.overlap is None else args.overlap
    stride = p - overlap if overlap else p
    n_win = len(grid_starts(args.hw, p, stride)) ** 2

    def call():
        if args.uncertainty:
            out = resolver.uncertainty_tile(
                lr, samples=args.samples, overlap=args.overlap,
                batch=args.batch,
            )["mean"]
        else:
            out = resolver.super_resolve_tile(
                lr, overlap=args.overlap, batch=args.batch
            )
        assert out.shape == (2 * args.hw, 2 * args.hw, 4)
        return out

    call()  # compile + warm
    t0 = time.perf_counter()
    for _ in range(args.reps):
        call()
    dt = (time.perf_counter() - t0) / args.reps

    draws = n_win * (args.samples if args.uncertainty else 1)
    print(json.dumps({
        "metric": ("uncertainty_tile" if args.uncertainty
                   else "super_resolve_tile"),
        "lr_raster": f"{args.hw}x{args.hw}x4",
        "windows": n_win,
        "batch": args.batch,
        "int8": args.int8,
        **({"samples": args.samples,
            "moments_hook": not args.no_moments}
           if args.uncertainty else {}),
        "s_per_raster": round(dt, 4),
        "window_draws_per_sec": round(draws / dt, 1),
        "mpix_sr_per_sec": round((2 * args.hw) ** 2 * 4 / dt / 1e6, 2),
    }))


if __name__ == "__main__":
    main()
