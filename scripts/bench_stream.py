#!/usr/bin/env python
"""Whole-scene streaming SR throughput (local resolver, no HTTP).

Measures the bounded-memory sweep (`SuperResolver.iter_tile_rows`) on a
synthetic scene: LR megapixels/s, SR windows/s, and wall time — the
compute-path number for scene products, free of the HTTP relay that
bounds `scripts/bench_tile.py` on this box.

    python scripts/bench_stream.py [--hw 1024] [--patch_size 64] [--int8]
        [--samples 1] [--batch 32] [--backend cpu]

Fails fast on a wedged tunneled accelerator via the doctor's bounded
probe (exit 2), like bench.py.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, default=1024,
                    help="LR scene side (pixels)")
    ap.add_argument("--patch_size", type=int, default=64)
    ap.add_argument("-cr", "--compression_ratio", type=float, default=1.2)
    ap.add_argument("--channels", type=int, default=4)
    ap.add_argument("--batch", type=int, default=32,
                    help="windows per dispatch")
    ap.add_argument("--samples", type=int, default=1)
    ap.add_argument("--uncertainty", action="store_true",
                    help="stream the mean/std moments instead")
    ap.add_argument("--no_moments", action="store_true",
                    help="mask the device-moments hook so --uncertainty "
                    "times the (window, draw)-packing fallback")
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--backend", default="")
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

    import numpy as np

    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.serve import SuperResolver

    cfg = CondSRVAEConfig(cr=args.compression_ratio,
                          patch_size=args.patch_size,
                          channels=args.channels)
    model = CondSRVAE(cfg)
    import jax.numpy as jnp

    variables = jax.jit(lambda r: model.init(
        {"params": r},
        jnp.zeros((1, args.patch_size, args.patch_size, args.channels)),
        jnp.zeros((1, args.patch_size // 2, args.patch_size // 2,
                   args.channels)),
        jax.random.PRNGKey(1), train=False,
    ))(jax.random.PRNGKey(0))
    vars_ = {"params": variables["params"]}
    if "batch_stats" in variables:
        vars_["batch_stats"] = variables["batch_stats"]
    r = SuperResolver(model, vars_, normalize=False, int8=args.int8)
    if args.no_moments:
        r.super_resolve_moments = None  # packing fallback

    rng = np.random.default_rng(0)
    h = w = args.hw
    scene = rng.random((h, w, args.channels), dtype=np.float32)

    def read(a, b):
        return scene[a:b]

    def sweep():
        n = 0
        for _base, block in r.iter_tile_rows(
            read, h, w, batch=args.batch, samples=args.samples,
            moments=args.uncertainty,
        ):
            blk = block["mean"] if args.uncertainty else block
            n += blk.shape[0]
        assert n == 2 * h
        return n

    p = r.window
    overlap = min(4, p // 2)
    stride = p - overlap
    n_wins = len(range(0, h - p + 1, stride)) ** 2  # approximate
    print(f"warmup (compiles the {args.batch}-window batch)...")
    warm = np.zeros((args.batch, p, p, args.channels), np.float32)
    np.asarray(r.super_resolve(warm, normalize=False))
    if args.uncertainty and not args.no_moments:
        np.asarray(r.super_resolve_moments(warm, max(2, args.samples))[0])

    t0 = time.perf_counter()
    sweep()
    dt = time.perf_counter() - t0
    mpix = h * w / 1e6
    draws = max(1, args.samples)
    print(
        f"scene {h}x{w}x{args.channels} ps={args.patch_size} "
        f"batch={args.batch} samples={args.samples} "
        f"int8={args.int8} uncertainty={args.uncertainty}"
        f"{' (packing fallback)' if args.uncertainty and args.no_moments else ''}: "
        f"{dt:.2f} s | {mpix / dt:.2f} LR Mpix/s | "
        f"~{n_wins * draws / dt:.0f} window-draws/s"
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
