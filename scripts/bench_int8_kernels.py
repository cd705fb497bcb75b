#!/usr/bin/env python
"""Per-kernel int8-vs-bf16 microbench on TPU (the MXU int8 story).

Times each fused Pallas serving kernel (conv3x3/s1, convT4x4/s2 — the
shapes the Cond_SRVAE decoder_x runs per posterior draw,
``models/cond_vae.py:103-110``) in three implementations:

- ``xla``:    bf16 lax.conv + affine + ReLU (what XLA fuses on its own)
- ``bf16``:   the fused Pallas kernel (``ops/pallas_conv.py``)
- ``int8``:   the W8A8 Pallas kernel (``ops/pallas_int8.py``)

Methodology: N serialized applications inside ONE jit (a scalar data
dependence chains them without reshaping), so the axon tunnel's
per-dispatch latency is paid once and ms/call = total/N. Sync is by value
fetch (``float(device_get)``) — block_until_ready is unreliable through
the relay (CLAUDE.md). One JSON line per (layer, impl).

End-to-end context: the full int8 decode path measured 1.05x bf16 at
85.6 dB after the round-3 convT routing floors (scripts/bench_uq.py
--int8, BASELINE.md); this script pins where
that comes from per kernel (deep-channel layers win 1.2-1.7x, the rest
sit at parity). v5e peak: 197 TFLOP/s bf16, 394 TOPS int8.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32, help="serving chunk slice")
    ap.add_argument("--iters", type=int, default=50, help="chained calls per jit")
    ap.add_argument("--cr", type=float, default=1.2)
    ap.add_argument("--patch_size", type=int, default=64)
    args = ap.parse_args()

    import jax

    # honor JAX_PLATFORMS=cpu despite the sitecustomize axon override
    # (same convention as __graft_entry__.py) — used for smoke runs
    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.ops import pallas_int8 as p8
    from simple_vae_rs_tpu.ops.quantize import quantize_stochastic
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    cfg = CondSRVAEConfig(cr=args.cr, patch_size=args.patch_size)
    lz2 = 2 * cfg.z_channels
    B = args.batch

    # decoder_x serving ladder (canonical cr/ps): (name, kind, H_in, C, O)
    layers = [
        ("up1.conv", "conv3", 8, lz2, lz2),
        ("up1.convT", "convT", 8, lz2, 256),
        ("up2.conv", "conv3", 16, 256, 256),
        ("up2.convT", "convT", 16, 256, 128),
        ("up3.conv", "conv3", 32, 128, 128),
        ("up3.convT", "convT", 32, 128, 64),
        ("tail.conv1", "conv3", 64, 64, 64),
        ("tail.conv2", "conv3", 64, 64, 16),
    ]

    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)

    from simple_vae_rs_tpu.utils.benchtime import timeit as _timeit

    def timeit(f, x0):
        return _timeit(f, x0, args.iters)

    for name, kind, h, c, o in layers:
        x = jnp.asarray(rng.standard_normal((B, h, h, c)), jnp.bfloat16)
        taps = 9 if kind == "conv3" else 16
        kern = jnp.asarray(
            rng.standard_normal((3, 3, c, o) if kind == "conv3" else (4, 4, c, o))
            * (c * taps) ** -0.5,
            jnp.bfloat16,
        )
        scale = jnp.ones((o,), jnp.float32)
        shift = jnp.zeros((o,), jnp.float32)
        kq, ks = quantize_stochastic(kern.astype(jnp.float32), key)

        if kind == "conv3":
            out_hw = h * h
            xla_fn = lambda x, k=kern, s=scale, t=shift: pc._reference3(x, k, s, t, True)
            bf_fn = lambda x, k=kern, s=scale, t=shift: pc.fused_conv3x3_bn_relu(x, k, s, t, True)
            i8_fn = lambda x, kq=kq, ks=ks, s=scale, t=shift: p8.int8_conv3x3_bn_relu(x, kq, ks, s, t, True)
            fits = pc.fits_vmem(h, h, c, o, 2), p8.fits_vmem3_int8(h, h, c, o, 2)
        else:  # convT4x4/s2: spatial doubles
            out_hw = (2 * h) * (2 * h)
            xla_fn = lambda x, k=kern, s=scale, t=shift: pc._referenceT(x, k, s, t, True)
            bf_fn = lambda x, k=kern, s=scale, t=shift: pc.fused_convT4x4s2_bn_relu(x, k, s, t, True)
            i8_fn = lambda x, kq=kq, ks=ks, s=scale, t=shift: p8.int8_convT4x4s2_bn_relu(x, kq, ks, s, t, True)
            fits = pc.fits_vmemT(h, h, c, o, 2), p8.fits_vmemT_int8(h, h, c, o, 2)
            taps = 4  # each output phase computes only its 4 non-zero taps

        flops = 2.0 * B * out_hw * taps * c * o
        row = {
            "layer": name,
            "shape": f"B{B} {h}x{h} {c}->{o}",
            "fits_vmem": {"bf16": bool(fits[0]), "int8": bool(fits[1])},
        }
        for impl, fn in (("xla", xla_fn), ("bf16", bf_fn), ("int8", i8_fn)):
            dt = timeit(fn, x)
            row[impl + "_ms"] = round(dt * 1e3, 4)
            row[impl + "_tops"] = round(flops / dt / 1e12, 1)
        row["int8_vs_bf16"] = round(row["bf16_ms"] / row["int8_ms"], 2)
        row["int8_vs_xla"] = round(row["xla_ms"] / row["int8_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
