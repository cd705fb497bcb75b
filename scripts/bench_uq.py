#!/usr/bin/env python
"""Benchmark the uncertainty-quantification path: posterior draws/sec.

The reference's task decodes 1000 posterior draws through the HR decoder
(``models/base.py:306``). Here the prior is computed once and the draws are
decoded in compiled chunks (``tasks.sample_chunked``). Prints one JSON line
per configuration.

For the torch-CPU denominator run with ``--reference`` (times the
reference's own ``sample`` on this machine).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_ours(samples=1000, chunk=None, patch_size=64, cr=1.2, int8=False,
               profile_dir=None):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.tasks import sample_chunked
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    # serving-tuned kernel routing: the measured thresholds route only
    # winning shapes (e.g. the deep-channel up1.convT, 3.15x over XLA at
    # the serving chunk — ops/pallas_conv.wins_over_xla_T)
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    pc.enable(True)
    if chunk is None:
        from simple_vae_rs_tpu.tasks import auto_chunk

        chunk = auto_chunk(samples, patch_size)
    cfg = CondSRVAEConfig(cr=cr, patch_size=patch_size)
    model = CondSRVAE(cfg, dtype=jnp.bfloat16)
    y = jnp.asarray(
        np.random.default_rng(0).random((1, patch_size // 2, patch_size // 2, 4)),
        dtype=jnp.float32,
    )
    variables = jax.jit(
        lambda r: model.init(
            {"params": r}, jnp.zeros((1, patch_size, patch_size, 4)), y,
            jax.random.PRNGKey(1), train=False,
        )
    )(jax.random.PRNGKey(0))
    impl = "tpu"
    quality = None
    if int8:
        # W8A8 decoder serving: stochastic-round quantize the decoder convs
        # once, route through the fused int8 Pallas kernels
        from simple_vae_rs_tpu.ops import quantize as qz

        float_out = sample_chunked(
            model, variables, y, jax.random.PRNGKey(9), samples=8, chunk=8
        )
        variables = dict(variables)
        variables["quant"] = qz.quantize_params_tree(
            variables["params"], jax.random.PRNGKey(4)
        )
        impl = "tpu-int8"
        int8_out = sample_chunked(
            model, variables, y, jax.random.PRNGKey(9), samples=8, chunk=8
        )
        mse = float(jnp.mean((int8_out - float_out) ** 2))
        quality = round(10 * np.log10(1.0 / max(mse, 1e-12)), 1)

    # warmup (compiles prep + chunk decode)
    out = sample_chunked(model, variables, y, jax.random.PRNGKey(2), samples=chunk,
                         chunk=chunk)
    float(jax.device_get(out[0, 0, 0, 0]))

    for label in ("first", "steady"):
        trace = label == "steady" and profile_dir is not None
        if trace:
            jax.profiler.start_trace(profile_dir)
        t0 = time.perf_counter()
        out = sample_chunked(model, variables, y, jax.random.PRNGKey(3),
                             samples=samples, chunk=chunk)
        float(jax.device_get(out[-1, 0, 0, 0]))
        dt = time.perf_counter() - t0
        if trace:
            jax.profiler.stop_trace()
        rec = {
            "metric": "uq_posterior_draws_per_sec",
            "impl": f"{impl}-{label}",
            "samples": samples,
            "value": round(samples / dt, 1),
            "seconds_total": round(dt, 3),
        }
        if quality is not None:
            rec["int8_vs_float_psnr_db"] = quality
        print(json.dumps(rec))


def bench_reference(samples=1000, patch_size=64, cr=1.2):
    sys.path.insert(0, "/root/reference")
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))
    from measure_reference_baseline import _stub_missing_modules

    _stub_missing_modules()
    import torch

    import models

    torch.manual_seed(0)
    model = models.Cond_SRVAE(cr, patch_size=patch_size)
    model.eval()
    y = torch.rand(1, 4, patch_size // 2, patch_size // 2)
    with torch.no_grad():
        model.sample(y, samples=50)  # warmup
        t0 = time.perf_counter()
        model.sample(y, samples=samples)
        dt = time.perf_counter() - t0
    print(json.dumps({
        "metric": "uq_posterior_draws_per_sec",
        "impl": "reference-torch-cpu",
        "samples": samples,
        "value": round(samples / dt, 1),
        "seconds_total": round(dt, 3),
    }))


if __name__ == "__main__":
    if "--reference" in sys.argv:
        bench_reference()
    else:
        chunk = None  # auto_chunk: one dispatch for the canonical task
        if "--chunk" in sys.argv:
            chunk = int(sys.argv[sys.argv.index("--chunk") + 1])
        profile_dir = None
        if "--profile_dir" in sys.argv:
            profile_dir = sys.argv[sys.argv.index("--profile_dir") + 1]
        bench_ours(chunk=chunk, int8="--int8" in sys.argv,
                   profile_dir=profile_dir)
