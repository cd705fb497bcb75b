#!/usr/bin/env python
"""Crossover sweep for the dilated-conv (convT) Pallas kernel vs XLA.

Measures the two patterns that ``--pallas_conv`` now routes at training
scale (``ops/pallas_conv.py``):

- ``fwd``: convT4x4/s2/p1 forward (UpBlock tail) — Pallas phase-decomposed
  kernel vs XLA input-dilated conv.
- ``dx``:  input-gradient of conv4x4/s2/p1 (DownBlock backward) — Pallas
  ``conv4x4s2_dx`` vs ``jax.linear_transpose`` of the XLA conv.

Sweeps output-row counts across serving->training batch range to pin the
``SVRS_PALLAS_CONVT_MAX_ROWS`` default from data. Chained-dispatch timing
(N serialized calls in one jit, value-fetch sync) — see
scripts/bench_int8_kernels.py for the methodology notes. One JSON line
per (pattern, shape).
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument(
        "--batches", type=int, nargs="*", default=[8, 32, 128, 512],
        help="batch sizes to sweep (use small ones for CPU smoke runs)",
    )
    args = ap.parse_args()

    import jax

    if os.environ.get("JAX_PLATFORMS", "").strip() == "cpu":
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.ops import pallas_conv as pc
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    rng = np.random.default_rng(0)

    # (H_in, C, O) convT layer shapes from the canonical Cond_SRVAE blocks;
    # batch sweeps from serving (8) to the 512-patch training step
    shapes = [(8, 426, 256), (16, 256, 128), (32, 128, 64)]
    batches = args.batches

    from simple_vae_rs_tpu.utils.benchtime import timeit as _timeit

    def timeit(f, x0):
        return _timeit(f, x0, args.iters)

    for h, c, o in shapes:
        kern = jnp.asarray(
            rng.standard_normal((4, 4, c, o)) * (16 * c) ** -0.5, jnp.bfloat16
        )
        ones = jnp.ones((o,), jnp.float32)
        zeros = jnp.zeros((o,), jnp.float32)

        for b in batches:
            x = jnp.asarray(rng.standard_normal((b, h, h, c)), jnp.bfloat16)
            rows = b * (2 * h) * (2 * h)
            fits = pc.fits_vmemT(h, h, c, o, 2)
            row = {
                "pattern": "convT_fwd",
                "shape": f"B{b} {h}x{h} {c}->{o}",
                "rows": rows,
                "fits_vmem": bool(fits),
            }
            xla_t = timeit(
                lambda x: pc._referenceT(x, kern, ones, zeros, False), x
            )
            row["xla_ms"] = round(xla_t * 1e3, 4)
            if fits:
                pal_t = timeit(
                    lambda x: pc.fused_convT4x4s2_bn_relu(x, kern, ones, zeros, False),
                    x,
                )
                row["pallas_ms"] = round(pal_t * 1e3, 4)
                row["pallas_vs_xla"] = round(xla_t / pal_t, 2)
            print(json.dumps(row), flush=True)

            # dx: gradient w.r.t. the input of conv4s2 mapping c-ch images
            # (2h) -> o-ch maps (h): g is (b, h, h, o), dx is (b, 2h, 2h, c)
            kdx = jnp.asarray(
                rng.standard_normal((4, 4, c, o)) * (16 * c) ** -0.5, jnp.bfloat16
            )
            g = jnp.asarray(rng.standard_normal((b, h, h, o)), jnp.bfloat16)
            fits_dx = pc.fits_vmemT(h, h, o, c, 2)
            row = {
                "pattern": "conv4s2_dx",
                "shape": f"B{b} g{h}x{h} {o}ch -> dx{2*h}x{2*h} {c}ch",
                "rows": b * (2 * h) * (2 * h),
                "fits_vmem": bool(fits_dx),
            }

            def dx_xla(gg, k=kdx, b_=b, h_=h, c_=c):
                return jax.linear_transpose(
                    lambda x_: pc._conv4_samedtype(x_, k),
                    jax.ShapeDtypeStruct((b_, 2 * h_, 2 * h_, c_), gg.dtype),
                )(gg)[0]

            row["xla_ms"] = round(timeit(dx_xla, g) * 1e3, 4)
            if fits_dx:
                k2 = pc._flip_swap(kdx).astype(g.dtype)
                pal_t = timeit(
                    lambda gg: pc.fused_convT4x4s2_bn_relu(
                        gg, k2, jnp.ones((c,), jnp.float32),
                        jnp.zeros((c,), jnp.float32), False,
                    ),
                    g,
                )
                row["pallas_ms"] = round(pal_t * 1e3, 4)
                row["pallas_vs_xla"] = round(row["xla_ms"] / 1e3 / pal_t, 2)
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
