#!/usr/bin/env python
"""What a StableHLO artifact loses vs live int8 serving — paired window.

Round-3 verdict weak-spot 2: ``--weights int8`` artifacts store int8 +
per-channel scales but dequantize to float ON ENTRY (the graph stays
custom-call-free for portability), so a pod serving from an artifact
loses the measured 1.2-1.7x deep-channel W8A8 kernels that a live
``SuperResolver(int8=True)`` gets. That cost was never measured. This
script times, in ONE session on the same checkpoint and batch:

- ``live_f32``      — SuperResolver, full-precision decode
- ``live_int8``     — SuperResolver(int8=True), fused W8A8 kernels
- ``live_int8w``    — SuperResolver(int8_weights=True): the artifact's
                      winning weights-only formulation served LIVE
                      (round-5, VERDICT r4 item 2)
- ``artifact_f32``  — ExportedResolver from an f32-weight artifact
- ``artifact_int8w``— ExportedResolver from an int8-WEIGHT artifact
                      (storage compression; compute is float)

One JSON line per arm + a summary with the live-int8-vs-artifact gap.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=250,
                    help="serving chunk (the UQ draw batch)")
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--patch_size", type=int, default=64)
    ap.add_argument("--cr", type=float, default=1.2)
    ap.add_argument("--ckpt", default="",
                    help="checkpoint to serve (default: fresh random init)")
    args = ap.parse_args()

    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache
    from simple_vae_rs_tpu.utils.health import probe_backend

    enable_compilation_cache()
    budget = float(os.environ.get("SVRS_BENCH_PROBE_BUDGET_S", "900"))
    if probe_backend(budget) is None:
        print("bench_artifact_int8: backend unresponsive; aborting",
              file=sys.stderr)
        os._exit(2)

    import jax
    import numpy as np

    from simple_vae_rs_tpu import export as ex
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.serve import SuperResolver
    from simple_vae_rs_tpu.utils.benchtime import timeit

    ps, B = args.patch_size, args.batch
    if args.ckpt:
        live_f32 = SuperResolver.from_checkpoint(args.ckpt, seed=3)
        live_i8 = SuperResolver.from_checkpoint(args.ckpt, seed=3, int8=True)
        live_i8w = SuperResolver.from_checkpoint(args.ckpt, seed=3,
                                                 int8_weights=True)
        model = live_f32.model
        variables = live_f32.variables
    else:
        import jax.numpy as jnp

        cfg = CondSRVAEConfig(cr=args.cr, patch_size=ps)
        model = CondSRVAE(cfg)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, ps, ps, 4)), jnp.zeros((1, ps // 2, ps // 2, 4)),
            jax.random.PRNGKey(1), train=False,
        )
        live_f32 = SuperResolver(model, variables, seed=3)
        live_i8 = SuperResolver(model, variables, seed=3, int8=True)
        live_i8w = SuperResolver(model, variables, seed=3, int8_weights=True)

    rng = np.random.default_rng(7)
    y = rng.random((B, ps // 2, ps // 2, 4)).astype(np.float32)

    tmp = tempfile.mkdtemp(prefix="svrs_art_")
    arts = {}
    for wmode in ("f32", "int8"):
        path = os.path.join(tmp, f"art_{wmode}.svrs")
        ex.export_resolver(live_f32, path, batch=B, weights=wmode)
        arts[wmode] = ex.load_exported(path)
        sz = os.path.getsize(path) / 1e6
        print(json.dumps({"artifact": wmode, "mb": round(sz, 1)}), flush=True)

    arms = {
        "live_f32": lambda b: live_f32.super_resolve(b, seed=5),
        "live_int8": lambda b: live_i8.super_resolve(b, seed=5),
        "live_int8w": lambda b: live_i8w.super_resolve(b, seed=5),
        "artifact_f32": lambda b: arts["f32"].super_resolve(b, seed=5),
        "artifact_int8w": lambda b: arts["int8"].super_resolve(b, seed=5),
    }
    # two interleaved passes (A..E, A..E): a mid-session relay/tunnel
    # drift shows up as per-arm disagreement instead of silently faking
    # an arm difference (the elbo_ab guard, applied here after round 4's
    # live_int8 number failed to replicate across sessions)
    outs = {}
    passes = {name: [] for name in arms}
    for _ in range(2):
        for name, fn in arms.items():
            if name not in outs:
                outs[name] = np.asarray(fn(y))  # warm + quality check
            passes[name].append(timeit(fn, y, args.iters))
    res = {}
    for name, (s1, s2) in passes.items():
        res[name] = (s1 + s2) / 2
        print(json.dumps({
            "arm": name, "ms": round(res[name] * 1e3, 3),
            "patches_per_sec": round(B / res[name], 1),
            "drift": round(abs(s1 - s2) / max(s1, s2), 4),
        }), flush=True)

    def psnr(a, b):
        mse = float(np.mean((a - b) ** 2))
        return round(10 * np.log10(1.0 / max(mse, 1e-12)), 1)

    print(json.dumps({
        "summary": "artifact_vs_live_int8",
        "int8_speedup_live": round(res["live_f32"] / res["live_int8"], 3),
        "int8w_speedup_live": round(res["live_f32"] / res["live_int8w"], 3),
        "artifact_cost_vs_live_int8":
            round(res["artifact_f32"] / res["live_int8"], 3),
        "artifact_int8w_vs_f32":
            round(res["artifact_f32"] / res["artifact_int8w"], 3),
        "psnr_live_int8_vs_f32": psnr(outs["live_int8"], outs["live_f32"]),
        "psnr_live_int8w_vs_f32": psnr(outs["live_int8w"], outs["live_f32"]),
        "psnr_art_int8w_vs_f32": psnr(outs["artifact_int8w"],
                                      outs["artifact_f32"]),
    }), flush=True)


if __name__ == "__main__":
    main()
