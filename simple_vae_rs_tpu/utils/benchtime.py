"""Chained-dispatch timing helpers shared by the kernel microbenches.

On the tunneled backend a per-call dispatch costs more than many kernels
under test, so ``chain`` serializes N applications of ``f`` inside ONE jit
via a scalar data dependence (the next input is ``x0`` rescaled by a
running sum — O(input) VPU work, negligible next to a conv), and
``timeit`` syncs by value fetch (``block_until_ready`` is unreliable
through the relay, CLAUDE.md). Used by scripts/bench_int8_kernels.py and
scripts/bench_conv_sweep.py so the methodology cannot drift between them.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def chain(f: Callable, x0, n: int):
    """n serialized f-applications; scalar dependence, one dispatch."""

    def body(carry, _):
        x, acc = carry
        y = f(x)
        acc = acc + jnp.sum(y, dtype=jnp.float32)
        return (x0 * (1.0 + 1e-12 * acc.astype(x0.dtype)), acc), None

    (_, acc), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), None, length=n)
    return acc


def timeit(f: Callable, x0, iters: int) -> float:
    """Seconds per call of ``f`` over one warm chained dispatch."""
    g = jax.jit(lambda x: chain(f, x, iters))
    float(jax.device_get(g(x0)))  # compile + warm
    t0 = time.perf_counter()
    float(jax.device_get(g(x0)))
    return (time.perf_counter() - t0) / iters
