"""Measure the dynamic micro-batching win under concurrent serving load.

Boots the HTTP server twice around the same resolver — coalescing off,
then on (``--dynamic_batch_ms``) — and fires ``--clients`` concurrent
clients each posting ``--requests`` single-window ``/v1/super_resolve``
calls. Reports wall time and requests/s for both arms plus the batcher's
own dispatch telemetry, so the dispatch-amortization story is measured
(one device round trip shared by N callers) rather than asserted.

The reference has no serving runtime to compare against
(``/root/reference/train.py:54-59`` is a one-off script inside training);
this benchmarks the rebuild against itself.

    python scripts/bench_dynamic_batch.py --backend cpu --clients 8
    python scripts/bench_dynamic_batch.py --model_ckpt ckpt/job  # TPU
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _post_npy(url: str, arr: np.ndarray) -> np.ndarray:
    buf = io.BytesIO()
    np.save(buf, arr)
    req = urllib.request.Request(
        url + "/v1/super_resolve", data=buf.getvalue(),
        headers={"Content-Type": "application/x-npy"},
    )
    with urllib.request.urlopen(req, timeout=1200) as resp:
        return np.load(io.BytesIO(resp.read()), allow_pickle=False)


def _drive(url: str, lr: np.ndarray, clients: int, requests: int) -> float:
    def worker(_i: int) -> None:
        for _ in range(requests):
            out = _post_npy(url, lr)
            assert out.shape[0] == lr.shape[0]

    t0 = time.perf_counter()
    with ThreadPoolExecutor(max_workers=clients) as pool:
        list(pool.map(worker, range(clients)))
    return time.perf_counter() - t0


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--model_ckpt", default=None,
                   help="serve this checkpoint (default: random-init "
                   "canonical Cond_SRVAE)")
    p.add_argument("-cr", type=float, default=1.2)
    p.add_argument("--patch_size", type=int, default=64)
    p.add_argument("--clients", type=int, default=8)
    p.add_argument("--requests", type=int, default=8,
                   help="posts per client per arm")
    p.add_argument("--dynamic_batch_ms", type=float, default=20.0)
    p.add_argument("--max_batch", type=int, default=64)
    p.add_argument("--backend", default="",
                   help="JAX platform override (e.g. cpu)")
    args = p.parse_args()

    from simple_vae_rs_tpu.utils.backend import apply_backend

    apply_backend(args.backend)
    import jax

    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from simple_vae_rs_tpu.serve import SuperResolver
    from simple_vae_rs_tpu.server import make_server

    if args.model_ckpt:
        resolver = SuperResolver.from_checkpoint(args.model_ckpt)
        cfg = resolver.model.config
    else:
        import jax.numpy as jnp

        from simple_vae_rs_tpu.config import CondSRVAEConfig
        from simple_vae_rs_tpu.models import CondSRVAE

        cfg = CondSRVAEConfig(cr=args.cr, patch_size=args.patch_size)
        model = CondSRVAE(cfg)
        ps = int(cfg.patch_size)
        variables = model.init(
            {"params": jax.random.PRNGKey(0)},
            jnp.zeros((1, ps, ps, 4)),
            jnp.zeros((1, ps // 2, ps // 2, 4)),
            jax.random.PRNGKey(1),
            train=False,
        )
        resolver = SuperResolver(model, variables, seed=3)

    w = int(cfg.patch_size) // 2
    lr = (np.random.default_rng(0).random((1, w, w, 4)) * 800).astype(
        np.float32
    )
    # compile every pow2 bucket the arms can hit BEFORE any HTTP is in
    # flight — a cold remote compile is minutes-slow and would trip the
    # client timeout (and pollute the timed windows)
    b = 1
    while True:
        t0 = time.perf_counter()
        np.asarray(resolver.super_resolve(np.repeat(lr, b, axis=0)))
        print(f"warm batch={b}: {time.perf_counter() - t0:.2f}s",
              flush=True)
        if b >= min(args.clients, args.max_batch):
            break
        b *= 2
    results = {}
    for label, ms in (("serial", 0.0), ("batched", args.dynamic_batch_ms)):
        srv = make_server(resolver, port=0, dynamic_batch_ms=ms,
                          max_batch=args.max_batch)
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        url = f"http://127.0.0.1:{srv.server_address[1]}"
        try:
            # warm every pow2 bucket the batched arm can hit (a merged
            # batch pads to pow2, so partial merges land on 2/4/8/...)
            b = 1
            while True:
                _post_npy(url, np.repeat(lr, b, axis=0))
                if b >= args.clients:
                    break
                b *= 2
            dt = _drive(url, lr, args.clients, args.requests)
            n = args.clients * args.requests
            row = {"wall_s": round(dt, 3), "req_per_s": round(n / dt, 1)}
            if ms > 0:
                svc = srv.RequestHandlerClass.service
                row["dispatches"] = svc.batcher.dispatches
                row["coalesced_requests"] = svc.batcher.requests
            results[label] = row
            print(label, json.dumps(row))
        finally:
            srv.shutdown()
            srv.server_close()
    speedup = results["serial"]["wall_s"] / results["batched"]["wall_s"]
    print(json.dumps({
        "metric": "dynamic_batch_speedup",
        "clients": args.clients,
        "value": round(speedup, 2),
        "unit": "x (wall, concurrent super_resolve)",
        **{f"{k}_{kk}": vv for k, v in results.items()
           for kk, vv in v.items()},
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
