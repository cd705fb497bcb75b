#!/usr/bin/env python
"""Continue the canonical HF quality run from its saved checkpoint.

The e120 diagnosis (BASELINE.md round-4 section): generation SSIM on the
high-frequency set is RECONSTRUCTION-limited — the full posterior
reconstruction scores the same 0.646 as the prior draw, with a
systematic ~0.87 contrast shrink — i.e. the classic undertrained-VAE
regression to the mean while the learned observation noise (gamma ~0.8
at e120) still down-weights the MSE term. The reference's own canonical
regime is 500 epochs. This script resumes ``results/qp_tpu_s0`` (the
archived e120 canonical weights) and keeps training with the exact
harness protocol (same data, shuffle seeds, per-epoch eval incl. the
MMSE product), appending epochs to a continuation archive — so the
"does length fix it" question gets a measured answer without re-running
the first 120 epochs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt", default="results/qp_tpu_s0")
    ap.add_argument("--from_epoch", type=int, default=120)
    ap.add_argument("--to_epoch", type=int, default=400)
    ap.add_argument("--eval_every", type=int, default=10)
    ap.add_argument("--backend", default="")
    args = ap.parse_args()

    import jax

    if args.backend:
        jax.config.update("jax_platforms", args.backend)
    import jax.numpy as jnp
    import numpy as np

    import scripts.quality_parity as qp
    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x
    from simple_vae_rs_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from simple_vae_rs_tpu.train.engine import Trainer
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache
    from simple_vae_rs_tpu.utils.health import probe_backend

    enable_compilation_cache()
    budget = float(os.environ.get("SVRS_BENCH_PROBE_BUDGET_S", "900"))
    if probe_backend(budget) is None:
        print("hf_continue: backend unresponsive; aborting", file=sys.stderr)
        os._exit(2)

    qp.CFG["dataset"] = "hf"
    (lr_tr, hr_tr), (lr_va, hr_va) = qp.build_dataset()
    metric_sums = qp.make_metric_fns(force_cpu=False)
    ssim_base, psnr_base = qp.bicubic_baseline(lr_va, hr_va, metric_sums)

    model = CondSRVAE(CondSRVAEConfig(cr=qp.CFG["cr"],
                                      patch_size=qp.CFG["patch_size"]))
    trainer = Trainer(model, TrainConfig(learning_rate=qp.CFG["lr"],
                                         grad_clip_norm=qp.CFG["clip"],
                                         seed=0))
    state = trainer.init_state((lr_tr[:qp.CFG["batch_size"]],
                                hr_tr[:qp.CFG["batch_size"]]), seed=0)
    trainer.state, meta = load_checkpoint(args.ckpt, state)
    print(json.dumps({"resumed_epoch": meta.get("epoch"),
                      "ssim_baseline": ssim_base,
                      "psnr_baseline": psnr_base}), flush=True)

    @jax.jit
    def sr_fn(variables, y, rng):
        return model.apply(variables, y, rng,
                           method=CondSRVAE.conditional_generation)

    @jax.jit
    def mmse_fn(variables, y, rng):
        init = jnp.zeros(
            (y.shape[0], y.shape[1] * 2, y.shape[2] * 2, y.shape[3]),
            jnp.float32,
        )

        def body(i, acc):
            return acc + model.apply(
                variables, y, jax.random.fold_in(rng, i),
                method=CondSRVAE.conditional_generation,
            ).astype(jnp.float32)

        return jax.lax.fori_loop(0, qp.MMSE_DRAWS, body, init) / qp.MMSE_DRAWS

    bs = qp.CFG["batch_size"]
    records = []
    out = os.path.join(
        qp.OUT_DIR,
        f"quality_parity_tpu_hf_cont_e{args.to_epoch}.json",
    )
    for epoch in range(args.from_epoch + 1, args.to_epoch + 1):
        t0 = time.perf_counter()
        lr_now = jnp.float32(trainer.scheduler.lr)
        tr_sum, n_tr = 0.0, 0
        for idx in qp.epoch_batches(len(lr_tr), bs, epoch, True):
            trainer.state, terms = trainer._train_step(
                trainer.state,
                trainer._device_batch((lr_tr[idx], hr_tr[idx])),
                lr_now,
            )
            tr_sum += float(jax.device_get(terms["loss"]))
            n_tr += 1
        rec = {"epoch": epoch, "train_loss": tr_sum / n_tr,
               "seconds": time.perf_counter() - t0}
        if epoch % args.eval_every == 0 or epoch == args.to_epoch:
            variables = trainer._variables(trainer.state)
            va_sum, n_va = 0.0, 0
            s_sum = p_sum = sm_sum = pm_sum = 0.0
            n_img = 0
            for idx in qp.epoch_batches(len(lr_va), bs, 0, False):
                b = (lr_va[idx], hr_va[idx])
                terms = trainer._val_step(
                    trainer.state, trainer._device_batch(b))
                va_sum += float(jax.device_get(terms["loss"]))
                n_va += 1
                y = jnp.asarray(b[0], jnp.float32)
                rng = jax.random.fold_in(trainer.state.rng, 0xE0A1 + n_va)
                sr = sr_fn(variables, y, rng)
                s, p = metric_sums(b[1], np.asarray(jax.device_get(sr)))
                mm = mmse_fn(variables, y, rng)
                s2, p2 = metric_sums(b[1], np.asarray(jax.device_get(mm)))
                s_sum += s; p_sum += p; sm_sum += s2; pm_sum += p2
                n_img += b[1].shape[0]
            params = trainer.state.params
            rec.update({
                "val_loss": va_sum / n_va,
                "ssim_sr": s_sum / n_img, "psnr_sr": p_sum / n_img,
                "ssim_mmse": sm_sum / n_img, "psnr_mmse": pm_sum / n_img,
                "gammax": float(jax.device_get(params["gammax"])),
            })
        records.append(rec)
        print(json.dumps(rec), flush=True)
        if epoch % 50 == 0 or epoch == args.to_epoch:
            save_checkpoint(args.ckpt + f"_cont", trainer.state, epoch=epoch)
            with open(out, "w") as fh:
                json.dump({"side": "tpu_hf_cont", "from": args.from_epoch,
                           "ssim_baseline": ssim_base,
                           "psnr_baseline": psnr_base,
                           "config": qp.CFG, "epochs": records}, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
