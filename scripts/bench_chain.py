#!/usr/bin/env python
"""Fused decoder-tail chain kernel vs the sequential XLA chain, on TPU.

The canonical Cond_SRVAE decoder tail (dx_conv1-4: 64 -> 64 -> 16 -> 16
-> C at 64px, reference ``models/cond_vae.py:131-143``) is a LINEAR conv
chain with no activations between — run layer-by-layer it round-trips
every feature map through HBM. ``pallas_conv.fused_conv3x3_chain`` runs
the whole chain on VMEM-resident row strips (one read + one write).

Times three arms at the serving chunk size with the shared
chained-dispatch methodology (``utils/benchtime.timeit``): the XLA
sequential chain, the channels-in-lanes fused chain (the round-3
negative), and the width-in-lanes redesign
(``fused_conv3x3_chain_wl`` — spatial lanes, so O=16/4 layers stop
starving the MXU). One JSON line per measurement.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=250, help="serving chunk size")
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--size", type=int, default=64, help="tail spatial size")
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.utils.benchtime import timeit
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    B, hw = args.batch, args.size
    chans = (64, 64, 16, 16, 4)  # the canonical dx tail
    rng = np.random.default_rng(0)

    for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        x = jnp.asarray(rng.standard_normal((B, hw, hw, chans[0])), dt)
        ks = tuple(
            jnp.asarray(
                rng.standard_normal((3, 3, chans[i], chans[i + 1]))
                * (9 * chans[i]) ** -0.5,
                dt,
            )
            for i in range(len(chans) - 1)
        )
        bs = tuple(
            jnp.asarray(rng.standard_normal(chans[i + 1]) * 0.1, jnp.float32)
            for i in range(len(chans) - 1)
        )

        seq_fn = lambda x, ks=ks, bs=bs: pc._chain_reference(x, ks, bs)
        fused_fn = lambda x, ks=ks, bs=bs: pc.fused_conv3x3_chain(x, ks, bs)
        wl_fn = lambda x, ks=ks, bs=bs: pc.fused_conv3x3_chain_wl(x, ks, bs)

        itemsize = jnp.dtype(dt).itemsize
        th = pc._chain_strip_rows(hw, hw, list(chans), itemsize)
        flops = sum(
            2.0 * B * hw * hw * 9 * chans[i] * chans[i + 1]
            for i in range(len(chans) - 1)
        )
        row = {"dtype": dt_name, "shape": f"B{B} {hw}px {'->'.join(map(str, chans))}",
               "strip_rows": th}
        for impl, fn in (("xla_seq", seq_fn), ("fused_chain", fused_fn),
                         ("wl_chain", wl_fn)):
            sec = timeit(fn, x, args.iters)
            row[impl + "_ms"] = round(sec * 1e3, 4)
            row[impl + "_tflops"] = round(flops / sec / 1e12, 2)
        row["speedup"] = round(row["xla_seq_ms"] / row["fused_chain_ms"], 2)
        row["wl_speedup"] = round(row["xla_seq_ms"] / row["wl_chain_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
