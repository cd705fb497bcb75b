"""Environment self-check: ``python -m simple_vae_rs_tpu.doctor``.

One screen that answers "is this machine ready to train/serve, and if
not, what exactly is wrong?" — versions, accelerator reachability (with
a hard deadline, because a wedged tunneled backend hangs even backend
init — see ``utils/health.py``), compile cache, data codecs, optional
metric/migration dependencies.

Part of the failure-detection story (SURVEY §5.c); the reference has no
equivalent (it assumes one healthy local GPU). Exit code 0 when the
accelerator answered the probe, 2 when it did not — scriptable as a
readiness gate, e.g. ``python -m simple_vae_rs_tpu.doctor --budget 60
&& python train.py ...``.
"""

from __future__ import annotations

import argparse
import os
import sys


def _line(status: str, name: str, detail: str) -> None:
    print(f"  [{status:^4}] {name:<22} {detail}")


def run_checks(budget_s: float = 120.0, backend: str = "") -> bool:
    """Print the report; True iff the accelerator probe succeeded."""
    import jax

    from simple_vae_rs_tpu.utils.backend import apply_backend

    apply_backend(backend)

    print("simple-vae-rs-tpu doctor")

    # -- versions (no backend init: safe even when the tunnel is wedged)
    import flax
    import numpy as np
    import optax

    _line("ok", "python", sys.version.split()[0])
    _line("ok", "jax", jax.__version__)
    _line("ok", "flax / optax / numpy",
          f"{flax.__version__} / {optax.__version__} / {np.__version__}")

    # -- compile cache (configure BEFORE the probe so the probe's compile
    #    itself lands in — and warms from — the persistent cache)
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cache_dir = jax.config.jax_compilation_cache_dir or "(unset)"
    if os.path.isdir(cache_dir):
        entries = os.listdir(cache_dir)
        size = sum(
            os.path.getsize(os.path.join(cache_dir, f))
            for f in entries
            if os.path.isfile(os.path.join(cache_dir, f))
        )
        _line("ok", "compile cache",
              f"{cache_dir} ({len(entries)} entries, {size / 1e6:.0f} MB)")
    else:
        _line("warn", "compile cache", f"{cache_dir} (missing — cold compiles)")

    # -- accelerator probe (the one check that can hang; hard deadline)
    from simple_vae_rs_tpu.utils.health import probe_backend

    latency = probe_backend(budget_s)
    if latency is None:
        _line("FAIL", "accelerator",
              f"backend unresponsive after {budget_s:.0f}s "
              "(tunneled TPU wedged? retry later, or --backend cpu)")
        ok = False
    else:
        devs = jax.devices()
        _line("ok", "accelerator",
              f"{jax.default_backend()} x{len(devs)} ({devs[0].device_kind}); "
              f"trivial jit round trip {latency * 1e3:.0f} ms")
        ok = True

    # -- data codecs
    try:
        import tifffile  # noqa: F401

        _line("ok", "tiff reader", "tifffile installed")
    except ImportError:
        _line("ok", "tiff reader",
              "built-in codec (raw/deflate/LZW + predictor)")
    from simple_vae_rs_tpu.data.lzw_native import get_lib

    _line("ok" if get_lib() is not None else "warn", "native LZW decoder",
          "built (data/lzw.c)" if get_lib() is not None
          else "C build failed — Python fallback (slower decode)")

    # -- optional subsystems
    from simple_vae_rs_tpu.ops.lpips import load_weights, weights_path
    from simple_vae_rs_tpu.utils.lpips_optional import (
        lpips_available,
        lpips_backend,
    )

    if load_weights() is not None:
        _line("ok", "LPIPS", f"native JAX weights at {weights_path()}")
    elif lpips_available():
        _line("ok", "LPIPS", f"via the '{lpips_backend()}' backend")
    else:
        _line("warn", "LPIPS",
              "no weights npz and no torch lpips package — metric skipped "
              "(SVRS_LPIPS_WEIGHTS / scripts/export_lpips_weights.py)")
    try:
        import torch

        _line("ok", "checkpoint migration", f"torch {torch.__version__}")
    except ImportError:
        _line("warn", "checkpoint migration",
              "torch not installed — .pth import/export unavailable")

    print(("all checks passed" if ok else "accelerator UNREACHABLE") +
          f" (probe budget {budget_s:.0f}s)")
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(
        prog="python -m simple_vae_rs_tpu.doctor",
        description="environment self-check (readiness gate)",
    )
    ap.add_argument("--budget", type=float, default=120.0,
                    help="accelerator probe deadline, seconds (default 120)")
    ap.add_argument("--backend", default="",
                    help="force a jax platform (e.g. cpu) before probing")
    args = ap.parse_args(argv)
    if run_checks(args.budget, args.backend):
        return 0
    # A failed probe leaves a daemon thread stuck inside native backend
    # init; normal interpreter teardown then aborts in the C++ runtime
    # (SIGABRT, exit 134) and breaks the documented exit-2 contract.
    # Skip teardown entirely.
    sys.stdout.flush()
    sys.stderr.flush()
    os._exit(2)


if __name__ == "__main__":
    raise SystemExit(main())
