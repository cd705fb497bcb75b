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
