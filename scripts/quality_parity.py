#!/usr/bin/env python
"""Head-to-head quality parity: torch reference vs this framework.

BASELINE.md's north star is ">=10x patches/sec/chip at matched val ELBO".
The throughput half is measured in bench.py; this script produces the
"matched val ELBO" half: it trains the PyTorch reference (imported from
/root/reference and *driven*, not copied — the loop mirrors
``models/base.py:84-182``) and this framework on the IDENTICAL synthetic
dataset at the canonical matched config (Cond_SRVAE, ps=64, cr=1.2, bs=8,
Adam 1e-4, grad-clip 1.0 — reference ``script.sh:20``, ``train.py:65``,
``base.py:106``) and records per-epoch train/val ELBO plus val SSIM/PSNR
of the SR output, computed by the SAME metric implementation
(``ops/metrics`` on CPU) for both sides.

Controlled variables:
- data: one deterministic synthetic tile set (SyntheticSRDataset, seed 0),
  per-channel min-max normalized ON HOST once, fed to both sides in the
  same order (shared numpy epoch shuffling, seed+epoch, drop_last);
- architecture: param-count parity is asserted (48,953,912 both sides);
- optimization: same lr, clip, batch size, epochs; gammas in the optimizer
  both sides (reference ``cond_vae.py:527-535`` semantics).

Seed policy: weight init and reparameterization noise CANNOT be matched
bitwise across torch/JAX RNGs (SURVEY §7 "RNG parity"); each side runs its
own seed. Parity is therefore judged statistically on the converged
curves, as BASELINE.json defines it.

Usage:
  python scripts/quality_parity.py --side reference --epochs 40
  python scripts/quality_parity.py --side tpu --epochs 40
  python scripts/quality_parity.py --report
Writes results/quality_parity_{side}_e{epochs}.json.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"
OUT_DIR = os.path.join(REPO, "results")

CFG = dict(cr=1.2, patch_size=64, batch_size=8, lr=1e-4, clip=1.0,
           n_tiles=256, data_seed=0, dataset="synthetic")

# Plain-VAE arm: the canonical train_vae.sh hyperparameters (reference
# scripts — ps=64 bs=32 cr=1.28; the VAE trains on the LR stream at
# patch_size//2, reference train.py:35-40). Param parity asserted at run
# time (both sides build the same graph).
VAE_CFG = dict(cr=1.28, patch_size=64, batch_size=32, lr=1e-4, clip=1.0,
               n_tiles=256, data_seed=0)

# Draws for the MMSE product columns: the reference's uncertainty task
# ships the MEAN over posterior draws as its SR estimate (error maps,
# MMSE — reference cond_vae.py sample()/task), and so does this repo's
# serving moments endpoint. ssim_mmse/psnr_mmse score that estimator;
# ssim_sr/psnr_sr keep the single-draw reference eval semantics.
MMSE_DRAWS = 16


# ------------------------------------------------------------------ data
def build_dataset(cfg=CFG):
    """(lr, hr) float32 pairs, NHWC, in [0,1]; deterministic.

    ``cfg['dataset']``: "synthetic" (smooth fields — the parity arm),
    "hf" (band-correlated high-frequency scenes — the arm where SR must
    beat the bicubic baseline, round-3 verdict item 1), or "sen2venus"
    (a REAL indexed tile tree at ``cfg['data_root']`` — the north star's
    grid-mode parity data; both frameworks read the same patches)."""
    sys.path.insert(0, REPO)

    def norm(a):  # per-channel min-max, the normalize_image semantics
        mn = a.min(axis=(0, 1), keepdims=True)
        mx = a.max(axis=(0, 1), keepdims=True)
        return ((a - mn) / (mx - mn + 1e-5)).astype(np.float32)

    lrs, hrs = [], []
    if cfg.get("dataset") == "sen2venus":
        # reference grid-mode semantics (dataset.py:140-163): every tile
        # pair grid-cropped to aligned (ps/2, ps) windows, each window
        # normalized per channel — sequential order, so the 80/20 split
        # below matches the reference's sequential split too.
        from simple_vae_rs_tpu.data.datasets import Sen2VenusDataset

        ds = Sen2VenusDataset(root=cfg["data_root"])
        ps = cfg["patch_size"]
        for i in range(len(ds)):
            lr_t, hr_t = ds[i]
            lr_t = lr_t.astype(np.float32)
            hr_t = hr_t.astype(np.float32)
            ny, nx = hr_t.shape[0] // ps, hr_t.shape[1] // ps
            for yy in range(ny):
                for xx in range(nx):
                    h = ps // 2
                    lrs.append(norm(
                        lr_t[yy * h:(yy + 1) * h, xx * h:(xx + 1) * h]))
                    hrs.append(norm(
                        hr_t[yy * ps:(yy + 1) * ps, xx * ps:(xx + 1) * ps]))
    else:
        from simple_vae_rs_tpu.data.datasets import (
            SyntheticHFDataset,
            SyntheticSRDataset,
        )

        cls = (SyntheticHFDataset if cfg.get("dataset") == "hf"
               else SyntheticSRDataset)
        ds = cls(
            length=cfg["n_tiles"], hr_size=cfg["patch_size"],
            seed=cfg["data_seed"],
        )
        for i in range(len(ds)):
            lr, hr = ds[i]
            lrs.append(norm(lr))
            hrs.append(norm(hr))
    lr_all, hr_all = np.stack(lrs), np.stack(hrs)
    n_train = int(0.8 * len(lr_all))  # sequential 80/20, reference dataset.py:30-32
    return (lr_all[:n_train], hr_all[:n_train]), (lr_all[n_train:], hr_all[n_train:])


def epoch_batches(n, bs, epoch, train):
    order = np.arange(n)
    if train:  # shared shuffle: same order both sides
        np.random.default_rng(1234 + epoch).shuffle(order)
    nb = n // bs  # drop_last both sides (static shapes)
    return [order[i * bs:(i + 1) * bs] for i in range(nb)]


# --------------------------------------------------------------- metrics
def make_metric_fns(force_cpu: bool = True):
    """SSIM/PSNR via this repo's ops.metrics — one implementation for both
    sides (NHWC numpy in, floats out). The reference side pins jax to CPU
    (torch does the training); the tpu side keeps its backend."""
    import jax

    if force_cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simple_vae_rs_tpu.ops.metrics import psnr, ssim

    @jax.jit
    def _sums(a, b):
        return jnp.sum(ssim(a, b)), jnp.sum(psnr(a, b))

    def sums(a, b):
        s, p = _sums(jnp.asarray(a), jnp.asarray(b))
        return float(s), float(p)

    return sums


def bicubic_baseline(lr_va, hr_va, metric_sums):
    """Mean SSIM/PSNR of the bicubic-2x upsample of the val LR against
    the val HR — the comparison the reference exists to win
    (``/root/reference/models/cond_vae.py:464-474`` computes exactly
    this baseline; same metric implementation as the SR scores so the
    rows are comparable). Identical inputs both sides -> one number."""
    import jax.numpy as jnp

    from simple_vae_rs_tpu.ops.resize import bicubic_upsample_2x

    up = np.asarray(bicubic_upsample_2x(jnp.asarray(lr_va)))
    s, p = metric_sums(hr_va, up)
    return s / len(hr_va), p / len(hr_va)


# ------------------------------------------------------------- reference
def run_reference(epochs: int, seed: int) -> dict:
    sys.path.insert(0, REFERENCE)
    # wandb/lpips/skimage are module-scope imports the driven loop never
    # calls; stub the missing ones (same approach as
    # measure_reference_baseline.py).
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_reference_baseline import _stub_missing_modules

    _stub_missing_modules()
    import torch

    import models  # reference package

    (lr_tr, hr_tr), (lr_va, hr_va) = build_dataset()
    metric_sums = make_metric_fns()
    ssim_base, psnr_base = bicubic_baseline(lr_va, hr_va, metric_sums)
    print(json.dumps({"ssim_baseline": ssim_base,
                      "psnr_baseline": psnr_base}), flush=True)

    torch.manual_seed(seed)
    model = models.Cond_SRVAE(CFG["cr"], patch_size=CFG["patch_size"])
    n_params = sum(p.numel() for p in model.parameters())
    optimizer = torch.optim.Adam(model.parameters(), lr=CFG["lr"])
    # gammas join the optimizer as in reference cond_vae.py:527-535
    model.gammax.requires_grad = True
    model.gammay.requires_grad = True
    optimizer.add_param_group({"params": [model.gammax, model.gammay]})

    def to_torch(a):  # NHWC [B] -> NCHW torch
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    bs = CFG["batch_size"]
    records = []
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        model.train()
        tr_sum, n_tr = 0.0, 0
        for idx in epoch_batches(len(lr_tr), bs, epoch, True):
            batch = (to_torch(lr_tr[idx]), to_torch(hr_tr[idx]))
            optimizer.zero_grad()
            loss, _ = model.train_step(batch, "cpu")
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), CFG["clip"])
            optimizer.step()
            tr_sum += float(loss.item())
            n_tr += 1
        model.eval()
        va_sum, n_va = 0.0, 0
        ssim_sum, psnr_sum, n_img = 0.0, 0.0, 0
        ssim_mm_sum, psnr_mm_sum = 0.0, 0.0
        for idx in epoch_batches(len(lr_va), bs, 0, False):
            batch = (to_torch(lr_va[idx]), to_torch(hr_va[idx]))
            loss, _ = model.val_step(batch, "cpu")
            va_sum += float(loss.item())
            n_va += 1
            with torch.no_grad():
                sr = model.conditional_generation(batch[0].to("cpu"))
                # the MMSE product (the reference's own uncertainty-task
                # estimator): mean of MMSE_DRAWS independent draws —
                # averages away the posterior draw noise that caps
                # single-draw SSIM
                acc = sr.clone()
                for _ in range(MMSE_DRAWS - 1):
                    acc += model.conditional_generation(batch[0].to("cpu"))
                mmse = acc / MMSE_DRAWS
            sr_np = np.transpose(sr.numpy(), (0, 2, 3, 1))
            s, p = metric_sums(hr_va[idx], sr_np)
            ssim_sum += s
            psnr_sum += p
            mm_np = np.transpose(mmse.numpy(), (0, 2, 3, 1))
            s2, p2 = metric_sums(hr_va[idx], mm_np)
            ssim_mm_sum += s2
            psnr_mm_sum += p2
            n_img += len(idx)
        rec = {
            "epoch": epoch,
            "train_loss": tr_sum / n_tr,
            "val_loss": va_sum / n_va,
            "ssim_sr": ssim_sum / n_img,
            "psnr_sr": psnr_sum / n_img,
            "ssim_mmse": ssim_mm_sum / n_img,
            "psnr_mmse": psnr_mm_sum / n_img,
            "gammax": float(model.gammax.item()),
            "gammay": float(model.gammay.item()),
            "seconds": time.perf_counter() - t0,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    torch.save(model.state_dict(),
               os.path.join(OUT_DIR,
                            f"qp_reference_ps{CFG['patch_size']}_"
                            f"{CFG.get('dataset', 'synthetic')}_s{seed}.pth"))
    return {"side": "reference", "n_params": n_params, "seed": seed,
            "ssim_baseline": ssim_base, "psnr_baseline": psnr_base,
            "config": CFG, "epochs": records}


# -------------------------------------------------------- reference (VAE)
def run_reference_vae(epochs: int, seed: int) -> dict:
    """Drive the reference's plain VAE (models/vae.py train/val_step,
    gamma joining the optimizer as in on_train_start, vae.py:229-231) on
    the LR stream of the shared synthetic set."""
    sys.path.insert(0, REFERENCE)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from measure_reference_baseline import _stub_missing_modules

    _stub_missing_modules()
    import torch

    import models  # reference package

    (lr_tr, _), (lr_va, _) = build_dataset(VAE_CFG)
    metric_sums = make_metric_fns()

    torch.manual_seed(seed)
    model = models.VAE(VAE_CFG["cr"], VAE_CFG["patch_size"] // 2)
    n_params = sum(p.numel() for p in model.parameters())
    optimizer = torch.optim.Adam(model.parameters(), lr=VAE_CFG["lr"])
    model.gamma.requires_grad = True
    optimizer.add_param_group({"params": [model.gamma]})

    def to_torch(a):
        return torch.from_numpy(np.transpose(a, (0, 3, 1, 2)).copy())

    bs = VAE_CFG["batch_size"]
    records = []
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        model.train()
        tr_sum, n_tr = 0.0, 0
        for idx in epoch_batches(len(lr_tr), bs, epoch, True):
            batch = (to_torch(lr_tr[idx]), 0)
            optimizer.zero_grad()
            loss, _ = model.train_step(batch, "cpu")
            loss.backward()
            torch.nn.utils.clip_grad_norm_(model.parameters(), VAE_CFG["clip"])
            optimizer.step()
            tr_sum += float(loss.item())
            n_tr += 1
        model.eval()
        va_sum, n_va = 0.0, 0
        ssim_sum, psnr_sum, n_img = 0.0, 0.0, 0
        for idx in epoch_batches(len(lr_va), bs, 0, False):
            batch = (to_torch(lr_va[idx]), 0)
            loss, _ = model.val_step(batch, "cpu")
            va_sum += float(loss.item())
            n_va += 1
            with torch.no_grad():
                x_hat, _, _ = model.forward(batch[0])
            x_np = np.transpose(x_hat.numpy(), (0, 2, 3, 1))
            s, p = metric_sums(lr_va[idx], x_np)
            ssim_sum += s
            psnr_sum += p
            n_img += len(idx)
        rec = {
            "epoch": epoch,
            "train_loss": tr_sum / n_tr,
            "val_loss": va_sum / n_va,
            "ssim_recon": ssim_sum / n_img,
            "psnr_recon": psnr_sum / n_img,
            "gamma": float(model.gamma.item()),
            "seconds": time.perf_counter() - t0,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return {"side": "reference_vae", "n_params": n_params, "seed": seed,
            "config": VAE_CFG, "epochs": records}


# -------------------------------------------------------------- tpu (VAE)
def run_tpu_vae(epochs: int, seed: int, backend: str = "") -> dict:
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import TrainConfig, VAEConfig
    from simple_vae_rs_tpu.models import VAE
    from simple_vae_rs_tpu.train.engine import Trainer
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    (lr_tr, _), (lr_va, _) = build_dataset(VAE_CFG)
    metric_sums = make_metric_fns(force_cpu=False)

    model = VAE(VAEConfig(cr=VAE_CFG["cr"],
                          patch_size=VAE_CFG["patch_size"] // 2))
    cfg = TrainConfig(learning_rate=VAE_CFG["lr"],
                      grad_clip_norm=VAE_CFG["clip"], seed=seed)
    trainer = Trainer(model, cfg)
    bs = VAE_CFG["batch_size"]
    # the vae trainer consumes (x, _) batches and trains on x
    state = trainer.init_state((lr_tr[:bs], lr_tr[:bs]), seed=seed)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(state.params)
        if hasattr(p, "shape")
    ) - 1  # exclude gamma for the reference-comparable count

    records = []
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        lr_now = jnp.float32(trainer.scheduler.lr)
        tr_sum, n_tr = 0.0, 0
        for idx in epoch_batches(len(lr_tr), bs, epoch, True):
            batch = (lr_tr[idx], lr_tr[idx])
            trainer.state, terms = trainer._train_step(
                trainer.state, trainer._device_batch(batch), lr_now
            )
            tr_sum += float(jax.device_get(terms["loss"]))
            n_tr += 1
        va_sum, n_va = 0.0, 0
        ssim_sum, psnr_sum, n_img = 0.0, 0.0, 0
        for idx in epoch_batches(len(lr_va), bs, 0, False):
            batch = (lr_va[idx], lr_va[idx])
            terms = trainer._val_step(trainer.state, trainer._device_batch(batch))
            va_sum += float(jax.device_get(terms["loss"]))
            n_va += 1
            variables = trainer._variables(trainer.state)
            rng = jax.random.fold_in(trainer.state.rng, 0xE0A2 + n_va)
            x_hat, _, _ = model.apply(
                variables, jnp.asarray(lr_va[idx], jnp.float32), rng,
                train=False,
            )
            s, p = metric_sums(lr_va[idx], np.asarray(jax.device_get(x_hat)))
            ssim_sum += s
            psnr_sum += p
            n_img += len(idx)
        params = trainer.state.params
        rec = {
            "epoch": epoch,
            "train_loss": tr_sum / n_tr,
            "val_loss": va_sum / n_va,
            "ssim_recon": ssim_sum / n_img,
            "psnr_recon": psnr_sum / n_img,
            "gamma": float(jax.device_get(params["gamma"])),
            "seconds": time.perf_counter() - t0,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    return {"side": "tpu_vae", "n_params": n_params, "seed": seed,
            "backend": jax.default_backend(),
            "config": VAE_CFG, "epochs": records}


# ------------------------------------------------------------------- tpu
def run_tpu(epochs: int, seed: int, backend: str = "",
            torch_regroup: bool = False) -> dict:
    import jax

    if backend:
        jax.config.update("jax_platforms", backend)
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.train.engine import Trainer
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    (lr_tr, hr_tr), (lr_va, hr_va) = build_dataset()
    metric_sums = make_metric_fns(force_cpu=False)
    ssim_base, psnr_base = bicubic_baseline(lr_va, hr_va, metric_sums)
    print(json.dumps({"ssim_baseline": ssim_base,
                      "psnr_baseline": psnr_base}), flush=True)

    # torch_regroup reproduces the reference's exact C-major latent wiring
    # (models/cond_vae.py regroup bijection) — with it on, the two sides
    # differ only in framework/init RNG, isolating the pixel-shuffle
    # redesign's contribution from the ELBO comparison.
    model = CondSRVAE(CondSRVAEConfig(
        cr=CFG["cr"], patch_size=CFG["patch_size"],
        torch_regroup=torch_regroup,
    ))
    cfg = TrainConfig(learning_rate=CFG["lr"], grad_clip_norm=CFG["clip"], seed=seed)
    trainer = Trainer(model, cfg)

    bs = CFG["batch_size"]

    class Loader:
        def __init__(self, lr_a, hr_a, train):
            self.lr_a, self.hr_a, self.train = lr_a, hr_a, train
            self.epoch = 1

        def __iter__(self):
            for idx in epoch_batches(len(self.lr_a), bs, self.epoch, self.train):
                yield self.lr_a[idx], self.hr_a[idx]

    train_loader = Loader(lr_tr, hr_tr, True)
    val_loader = Loader(lr_va, hr_va, False)

    # single-dispatch eval fns (an eager model.apply is hundreds of tiny
    # dispatches per batch on a tunneled device; the MMSE product would
    # be 16x that): one jitted call per val batch for each.
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

        return jax.lax.fori_loop(0, MMSE_DRAWS, body, init) / MMSE_DRAWS
    state = trainer.init_state(next(iter(train_loader)), seed=seed)
    n_params = sum(
        int(np.prod(p.shape)) for p in jax.tree.leaves(state.params)
        if hasattr(p, "shape")
    )
    # exclude the two gamma scalars for the reference-comparable count
    n_params_no_gamma = n_params - 2

    records = []
    for epoch in range(1, epochs + 1):
        t0 = time.perf_counter()
        train_loader.epoch = epoch  # same shared shuffle as the torch side
        lr_now = jnp.float32(trainer.scheduler.lr)
        tr_sum, n_tr = 0.0, 0
        for batch in train_loader:
            trainer.state, terms = trainer._train_step(
                trainer.state, trainer._device_batch(batch), lr_now
            )
            tr_sum += float(jax.device_get(terms["loss"]))
            n_tr += 1
        va_sum, n_va = 0.0, 0
        ssim_sum, psnr_sum, n_img = 0.0, 0.0, 0
        ssim_mm_sum, psnr_mm_sum = 0.0, 0.0
        vterm_sums = {}
        for batch in val_loader:
            terms = trainer._val_step(trainer.state, trainer._device_batch(batch))
            host_terms = {k: float(v) for k, v in
                          jax.device_get(terms).items()}
            va_sum += host_terms["loss"]
            for k, v in host_terms.items():
                vterm_sums[k] = vterm_sums.get(k, 0.0) + v
            n_va += 1
            y = jnp.asarray(batch[0], jnp.float32)
            variables = trainer._variables(trainer.state)
            rng = jax.random.fold_in(trainer.state.rng, 0xE0A1 + n_va)
            sr = sr_fn(variables, y, rng)
            s, p = metric_sums(batch[1], np.asarray(jax.device_get(sr)))
            ssim_sum += s
            psnr_sum += p
            # MMSE product: mean of MMSE_DRAWS draws, one fused dispatch
            mm = mmse_fn(variables, y, rng)
            s2, p2 = metric_sums(batch[1], np.asarray(jax.device_get(mm)))
            ssim_mm_sum += s2
            psnr_mm_sum += p2
            n_img += batch[1].shape[0]
        params = trainer.state.params
        rec = {
            "epoch": epoch,
            "train_loss": tr_sum / n_tr,
            "val_loss": va_sum / n_va,
            "ssim_sr": ssim_sum / n_img,
            "psnr_sr": psnr_sum / n_img,
            "ssim_mmse": ssim_mm_sum / n_img,
            "psnr_mmse": psnr_mm_sum / n_img,
            "val_terms": {k: v / n_va for k, v in vterm_sums.items()},
            "gammax": float(jax.device_get(params["gammax"])),
            "gammay": float(jax.device_get(params["gammay"])),
            "seconds": time.perf_counter() - t0,
        }
        records.append(rec)
        print(json.dumps(rec), flush=True)
    side = "tpu_torchwire" if torch_regroup else "tpu"
    # keep the trained weights next to the curves so the archived runs
    # can be re-analyzed (panels, extra metrics) without retraining;
    # the name carries preset/dataset so arms don't overwrite each other
    from simple_vae_rs_tpu.train.checkpoint import save_checkpoint

    ck = (f"qp_{side}_ps{CFG['patch_size']}_"
          f"{CFG.get('dataset', 'synthetic')}_s{seed}")
    save_checkpoint(os.path.join(OUT_DIR, ck), trainer.state, epoch=epochs)
    return {"side": side, "n_params": n_params_no_gamma, "seed": seed,
            "backend": jax.default_backend(),
            "ssim_baseline": ssim_base, "psnr_baseline": psnr_base,
            "config": CFG, "epochs": records}


# ---------------------------------------------------------------- report
def seed_replicates(family: str = "cond",
                    min_epochs: int = 40) -> dict[str, dict[int, dict]]:
    """A family's archived seed replicates, keyed by side then seed.

    The single source of truth for what counts as a replicate (the plot
    and the table must agree): ``family='cond'`` reads the ps32
    small-preset Cond arms, ``'vae'`` the plain-VAE arms; the torchwire
    wiring arm is a different experiment and is excluded; archives
    shorter than ``min_epochs`` (smoke runs) are dropped; per
    (side, seed) the longest archive wins.
    """
    import glob
    import re

    pattern = ("quality_parity_*ps32*_e*.json" if family == "cond"
               else "quality_parity_*_vae*_e*.json")
    groups: dict[str, dict[int, dict]] = {"reference": {}, "tpu": {}}
    for path in glob.glob(os.path.join(OUT_DIR, pattern)):
        name = os.path.basename(path)
        if "torchwire" in name:  # wiring arm, not a seed replicate
            continue
        if "_hf" in name:  # high-frequency dataset arm, own experiment
            continue
        if "_s2v" in name:  # real-data arm, own experiment
            continue
        side = "reference" if name.startswith(
            "quality_parity_reference") else "tpu"
        m = re.search(r"_s(\d+)_e", name)
        seed = int(m.group(1)) if m else 0
        with open(path) as fh:
            data = json.load(fh)
        if len(data["epochs"]) < min_epochs:
            continue
        prev = groups[side].get(seed)
        if prev is None or len(data["epochs"]) > len(prev["epochs"]):
            groups[side][seed] = data
    return groups


def report_seeds(epochs: int = 40, family: str = "cond") -> None:
    """Seed-spread table across a family's archived seed replicates.

    The seed policy (torch/JAX RNG streams cannot be matched bitwise,
    SURVEY §7) means each side runs its own init/reparam seeds, so the
    honest question is whether the cross-framework ELBO gap exceeds each
    side's OWN seed-to-seed spread. Archives longer than ``epochs`` are
    truncated to it (per-epoch records are unaffected by how long the
    run continued), so e80 and e40 replicates compare at the same point.
    """
    ssim_key = "ssim_sr" if family == "cond" else "ssim_recon"
    groups = seed_replicates(family, min_epochs=epochs)
    if min(len(runs) for runs in groups.values()) < 2:
        raise FileNotFoundError(
            f"need >=2 {family} seed replicates per side at >= e{epochs} "
            f"in {OUT_DIR} (no within-side spread to compare otherwise); "
            f"have reference={sorted(groups['reference'])}, "
            f"tpu={sorted(groups['tpu'])}"
        )
    finals: dict[str, list[float]] = {}
    print(f"{'side':<12} {'seed':>4} {'val_elbo':>12} {ssim_key:>10}")
    for side, runs in groups.items():
        vals = []
        for seed in sorted(runs):
            last = runs[seed]["epochs"][epochs - 1]
            vals.append(last["val_loss"])
            print(f"{side:<12} {seed:>4} {last['val_loss']:>12.1f} "
                  f"{last[ssim_key]:>10.4f}")
        finals[side] = vals
    mean = {s: float(np.mean(v)) for s, v in finals.items()}
    spread = {s: float(np.max(v) - np.min(v)) for s, v in finals.items()}
    scale = abs(np.mean(list(mean.values())))
    gap = abs(mean["reference"] - mean["tpu"])
    print(f"\nwithin-side spread: reference {spread['reference']:.1f} "
          f"({spread['reference'] / scale:.1%}), "
          f"tpu {spread['tpu']:.1f} ({spread['tpu'] / scale:.1%})")
    print(f"cross-side gap of means: {gap:.1f} ({gap / scale:.1%})")
    widest = max(spread.values())
    verdict = ("WITHIN seed noise" if gap <= widest
               else f"{gap / widest:.1f}x the widest within-side spread")
    print(f"verdict: cross-framework gap is {verdict}")


def report(epochs: int | None = None) -> None:
    """Print the side-by-side table from the archived curves.

    With --epochs, reads that run's files; otherwise each side's
    highest-epoch archive (files are named quality_parity_{side}_e{N}.json
    so runs don't clobber).
    """
    import glob

    rows = {}
    for side in ("reference", "tpu", "tpu_torchwire",
                 "reference_vae", "tpu_vae",
                 "reference_hf", "tpu_hf",
                 "reference_hf_mid35", "tpu_hf_mid35",
                 "reference_hf_ps32", "tpu_hf_ps32",
                 "reference_s2v", "tpu_s2v",
                 "reference_s2v_ps32", "tpu_s2v_ps32"):
        if epochs is not None:
            path = os.path.join(OUT_DIR, f"quality_parity_{side}_e{epochs}.json")
            if not os.path.exists(path):
                continue
        else:
            cands = glob.glob(
                os.path.join(OUT_DIR, f"quality_parity_{side}_e*.json")
            )
            if not cands:
                continue
            path = max(
                cands,
                key=lambda p: int(p.rsplit("_e", 1)[1].split(".")[0]),
            )
        with open(path) as fh:
            rows[side] = json.load(fh)
    if not rows:
        raise FileNotFoundError(f"no quality_parity archives in {OUT_DIR}")
    print(f"{'side':<18} {'params':>12} {'epochs':>6} {'val_loss':>12} "
          f"{'ssim':>8} {'psnr':>8} {'ssim_mm':>8} {'psnr_mm':>8} "
          f"{'ssim_bi':>8} {'psnr_bi':>8} {'s/epoch':>8}")
    for side, data in rows.items():
        last = data["epochs"][-1]
        secs = np.mean([e["seconds"] for e in data["epochs"]])
        ssim = last.get("ssim_sr", last.get("ssim_recon"))
        psnr = last.get("psnr_sr", last.get("psnr_recon"))
        sb = data.get("ssim_baseline")
        pb = data.get("psnr_baseline")
        base = (f"{sb:>8.4f} {pb:>8.2f}" if sb is not None
                else f"{'-':>8} {'-':>8}")
        sm, pm = last.get("ssim_mmse"), last.get("psnr_mmse")
        mm = (f"{sm:>8.4f} {pm:>8.2f}" if sm is not None
              else f"{'-':>8} {'-':>8}")
        print(f"{side:<18} {data['n_params']:>12,} {last['epoch']:>6} "
              f"{last['val_loss']:>12.2f} {ssim:>8.4f} "
              f"{psnr:>8.2f} {mm} {base} {secs:>8.1f}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--side", choices=["reference", "tpu"])
    ap.add_argument("--model", choices=["cond", "vae"], default="cond",
                    help="model family: the canonical Cond_SRVAE arm or the "
                         "plain-VAE arm (train_vae.sh hyperparams)")
    ap.add_argument("--epochs", type=int, default=None,
                    help="epoch count (default 40 for runs; for --report, "
                         "picks that run's archives instead of the latest)")
    ap.add_argument("--preset", choices=["canonical", "small"],
                    default="canonical",
                    help="small = cr=2/ps=32 Cond arm (CPU-affordable "
                         "wiring experiments; archives get a _ps32 suffix)")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--dataset", choices=["synthetic", "hf", "sen2venus"],
                    default="synthetic",
                    help="hf = high-frequency synthetic scenes (sharp "
                         "sub-pixel geometry) — the arm where SR must "
                         "beat the bicubic baseline; archives get a _hf "
                         "suffix. sen2venus = a real indexed tile tree "
                         "(--data_root), grid-mode cropped — the north "
                         "star's parity data; archives get a _s2v suffix")
    ap.add_argument("--data_root", default=None,
                    help="Sen2Venus tree root (contains index.csv; "
                         "scripts/make_index.py builds one from a raw "
                         "download) — required with --dataset sen2venus")
    ap.add_argument("--backend", default="", help="jax platform override (tpu side)")
    ap.add_argument("--torch_regroup", action="store_true",
                    help="tpu side: use the reference's exact C-major latent "
                         "wiring instead of the pixel-shuffle redesign, so "
                         "the ELBO comparison isolates framework from wiring")
    ap.add_argument("--report", action="store_true")
    ap.add_argument("--report_seeds", action="store_true",
                    help="seed-spread table across the archived ps32 seed "
                         "replicates: within-side spread vs cross-side gap")
    args = ap.parse_args()
    if args.report:
        report(args.epochs)  # None -> each side's latest archive
        return
    if args.report_seeds:
        report_seeds(args.epochs or 40,
                     "vae" if args.model == "vae" else "cond")
        return
    if args.epochs is None:
        args.epochs = 40
    if args.dataset == "hf":
        if args.model == "vae":
            ap.error("--dataset hf applies to the cond (SR) family only")
        CFG["dataset"] = "hf"
    elif args.dataset == "sen2venus":
        if args.model == "vae":
            ap.error("--dataset sen2venus applies to the cond (SR) family "
                     "only")
        if not args.data_root:
            ap.error("--dataset sen2venus needs --data_root (the tree "
                     "with index.csv)")
        CFG["dataset"] = "sen2venus"
        CFG["data_root"] = os.path.abspath(args.data_root)
    if args.preset == "small":
        if args.model == "vae":
            # the small preset only rewrites the Cond arm's CFG; silently
            # accepting it here would archive a canonical-config VAE run
            # under a _ps32 name that the cond-family seed globs pick up
            ap.error("--preset small applies to the cond family only "
                     "(the VAE arm always runs its canonical config)")
        CFG.update(cr=2.0, patch_size=32)
    if not args.side:
        ap.error("--side or --report required")
    os.makedirs(OUT_DIR, exist_ok=True)
    sys.path.insert(0, REPO)
    if args.model == "vae":
        if args.side == "reference":
            result = run_reference_vae(args.epochs, args.seed)
        else:
            result = run_tpu_vae(args.epochs, args.seed, args.backend)
    elif args.side == "reference":
        result = run_reference(args.epochs, args.seed)
    else:
        result = run_tpu(args.epochs, args.seed, args.backend,
                         torch_regroup=args.torch_regroup)
    if args.dataset == "hf":
        result["side"] += "_hf"
    elif args.dataset == "sen2venus":
        result["side"] += "_s2v"
    if args.preset == "small":
        result["side"] += "_ps32"
    if args.seed != 0:  # non-default seeds get their own archives
        result["side"] += f"_s{args.seed}"
    out = os.path.join(
        OUT_DIR, f"quality_parity_{result['side']}_e{args.epochs}.json"
    )
    with open(out, "w") as fh:
        json.dump(result, fh, indent=1)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
