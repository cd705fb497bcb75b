"""Backend health probing with a hard deadline.

The tunneled-TPU deployments this framework targets can wedge in a way
that hangs even backend *initialization* (``make_c_api_client`` never
returns), so any unattended entry point that touches the accelerator
needs a bounded probe before it commits — a clean, fast failure beats an
indefinite hang. ``bench.py`` and ``python -m simple_vae_rs_tpu.doctor``
both build on :func:`probe_backend`.

The reference has no equivalent (single local GPU, nothing to probe);
this is part of the failure-detection story (SURVEY §5.c).
"""

from __future__ import annotations

import sys
import time
from typing import Optional


def probe_backend(
    budget_s: float,
    progress: bool = True,
    out=None,
) -> Optional[float]:
    """Round-trip latency (seconds) of one trivial jit, or None on timeout.

    Backend init plus one trivial dispatch run in a daemon thread while
    the caller waits out ``budget_s``; a single thread with one shared
    event on purpose — JAX serializes backend init under a lock, so a
    second attempt would only queue behind the first, while a late RPC
    completion still flips the event. CPU backends answer instantly
    (the dispatch runs there too: the probe measures the whole
    jit-dispatch-fetch path, not just init).
    """
    import threading

    import jax
    import jax.numpy as jnp

    out = out or sys.stderr
    done = threading.Event()
    latency: list = []
    error: list = []

    def run() -> None:
        try:
            t0 = time.monotonic()
            x = jax.jit(lambda a: a + 1)(jnp.zeros((8, 128)))
            float(jax.device_get(x.sum()))
            latency.append(time.monotonic() - t0)
        except Exception as e:  # fail FAST with the real cause, don't
            error.append(e)     # burn the budget on a probe that errored
        done.set()

    threading.Thread(target=run, daemon=True).start()
    deadline = time.monotonic() + budget_s
    while True:
        left = deadline - time.monotonic()
        if done.wait(min(30.0, max(0.0, left))):
            if error:
                print(f"backend probe failed: {type(error[0]).__name__}: "
                      f"{error[0]}", file=out)
                return None
            return latency[0]
        if time.monotonic() >= deadline:
            return None
        if progress:
            print(
                f"backend probe still pending "
                f"({deadline - time.monotonic():.0f}s of budget left)",
                file=out,
            )


def dispatch_latency(reps: int = 3) -> Optional[float]:
    """Warm per-dispatch round-trip latency (seconds): best of ``reps``
    timed trivial-jit round trips AFTER a warmup call (so compile time is
    excluded). This is the per-step overhead a host loop pays on every
    dispatch — milliseconds on a local backend, 16 ms+ on this box's
    healthy tunnel and up to ~1 s degraded (BASELINE.md scan-steps
    revision). Called from contexts where the backend just did real work
    (e.g. end of a trained epoch), so no deadline thread is needed; a
    wedged backend would have hung the caller already.
    """
    import jax
    import jax.numpy as jnp

    try:
        f = jax.jit(lambda a: a + 1)
        x = jnp.zeros((8, 128))
        float(jax.device_get(f(x).sum()))  # compile + warm
        best = None
        for _ in range(max(1, reps)):
            t0 = time.monotonic()
            float(jax.device_get(f(x).sum()))
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        return best
    except Exception:
        return None


#: fused steps per dispatch that auto-tuning engages (k=2 recovered the
#: full compute ceiling under degraded dispatch: 10,540 vs 7,592 p/s in
#: one session, and costs nothing healthy — 0.994x; BASELINE.md)
AUTO_SCAN_K = 2
#: dispatch-latency share of a step at which fusion starts to pay
AUTO_SCAN_THRESHOLD = 0.25


def choose_scan_steps(
    per_step_s: float, latency_s: Optional[float]
) -> int:
    """Dispatch-fusion policy shared by the training engine and bench:
    fuse ``AUTO_SCAN_K`` full optimizer steps per jit dispatch when the
    measured per-dispatch latency rivals the per-step wall time
    (``latency > AUTO_SCAN_THRESHOLD * per_step``), else stay unfused.
    On a dispatch-bound link per-step wall time IS the latency (ratio ~1);
    on a compute-bound backend the probe is a tiny fraction of the step.
    """
    if latency_s is None or per_step_s <= 0:
        return 1
    return AUTO_SCAN_K if latency_s > AUTO_SCAN_THRESHOLD * per_step_s else 1
