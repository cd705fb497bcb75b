"""CLI: the reference's flag surface over the TPU engine.

Flag parity with reference ``train.py:83-148`` (``--pre_epochs --epochs
--dataset --batch_size --patch_size --test --model_ckpt
--val_metrics_every -cr/--compression_ratio --model_type``), plus
TPU-native additions: ``--crop`` (grid mode, first-class per BASELINE.json),
``--data_root``, ``--mesh_data/--mesh_model``, ``--bf16``, ``--seed``.

Semantics fixed vs the reference (documented divergences):

- ``--model_ckpt`` without ``--test`` resumes training *correctly*
  (optimizer state + epoch restored; reference crashes — SURVEY §2.2-2).
- device selection is mesh construction instead of a cuda/cpu pick
  (reference ``train.py:51``).
"""

from __future__ import annotations

import argparse
import os
import time
from typing import Optional, Sequence

import jax


def parse_args(argv: Optional[Sequence[str]] = None) -> argparse.Namespace:
    parser = argparse.ArgumentParser(description="Train a VAE model.")
    parser.add_argument(
        "--pre_epochs",
        type=int,
        default=0,
        help="Number of epochs to pre-train the low resolution model. "
        "(The reference defaults to 20 but never uses the value — SURVEY "
        "§2.2-4; here it actually pre-trains the LR branch, so the default "
        "is 0 to keep default-run behavior identical.)",
    )
    parser.add_argument(
        "--epochs", type=int, default=200, help="Number of epochs to train the model."
    )
    parser.add_argument("--dataset", type=str, default="s2v", help="Type of the dataset")
    parser.add_argument(
        "--batch_size", type=int, default=16,
        help="Batch size for training and validation.",
    )
    parser.add_argument(
        "--patch_size", type=int, default=None,
        help="Patch size of the High-Res Images. (default: 64; when "
        "--model_ckpt is given, an unset flag resolves from the "
        "checkpoint's recorded config instead)",
    )
    parser.add_argument(
        "--test", action="store_true",
        help="If set, the model will be tested instead of trained.",
    )
    parser.add_argument(
        "--model_ckpt", type=str,
        help="Path to the model checkpoint to resume training.",
    )
    parser.add_argument(
        "--val_metrics_every", type=int, default=5,
        help="Number of epochs between validation metrics computation.",
    )
    parser.add_argument(
        "-cr", "--compression_ratio", type=float, default=None,
        help="Compression of the ratio. (default: 1.5; when --model_ckpt "
        "is given, an unset flag resolves from the checkpoint's recorded "
        "config instead)",
    )
    parser.add_argument(
        "--model_type", type=str, default=None,
        choices=["Cond_SRVAE", "VAE", "SRVAE"],
        help="Model to use: 'Cond_SRVAE', 'VAE', or 'SRVAE' (the "
        "hierarchical two-latent-level srVAE of the paper, LR view "
        "computed inside the model). (default: Cond_SRVAE; when "
        "--model_ckpt is given, an unset flag resolves from the "
        "checkpoint's recorded config instead)",
    )
    # --- TPU-native additions -------------------------------------------
    parser.add_argument(
        "--latent_size", type=int, default=None,
        help="Fixed latent budget: overrides the cr-derived latent size "
        "(multiple of 256 for Cond_SRVAE/SRVAE, 64 for VAE). Keeps the "
        "latent-head conv widths bounded at large patch sizes — e.g. "
        "--patch_size 128 --latent_size 13568 reuses the canonical 64px "
        "head widths where cr alone would 4x them (~600M params).",
    )
    parser.add_argument(
        "--crop", type=str, default="random", choices=["random", "grid"],
        help="Patchification mode; grid yields patches_per_tile x batch_size.",
    )
    parser.add_argument("--data_root", type=str, default=None, help="Dataset root dir.")
    parser.add_argument(
        "--workers", type=int, default=1,
        help="Parallel tile-decode threads per loader (the reference's "
        "DataLoader runs 6 worker processes; decode releases the GIL, so "
        "threads scale across host cores). Batches are identical at any "
        "worker count.",
    )
    parser.add_argument(
        "--mesh_data", type=int, default=-1, help="Mesh data-axis size (-1 = all)."
    )
    parser.add_argument(
        "--mesh_model", type=int, default=1, help="Mesh model-axis size."
    )
    parser.add_argument(
        "--mesh_dcn", type=int, default=1,
        help="Mesh dcn-axis size (number of slices, multi-slice over DCN).",
    )
    parser.add_argument(
        "--multihost", action="store_true",
        help="Call jax.distributed.initialize() before any device use: "
        "required when launching one process per host on a TPU pod "
        "(coordinator/topology read from the TPU environment; the mesh "
        "then spans every process's devices and loaders feed local "
        "batch slices).",
    )
    parser.add_argument("--seed", type=int, default=0, help="Global RNG seed.")
    parser.add_argument(
        "--bf16", action="store_true", help="Compute convs in bfloat16 (MXU-native)."
    )
    parser.add_argument(
        "--samples", type=int, default=1000,
        help="Posterior draws for the uncertainty task.",
    )
    parser.add_argument(
        "--profile_dir", type=str, default="",
        help="Write a jax.profiler trace of one training epoch here.",
    )
    parser.add_argument(
        "--debug_nans", action="store_true",
        help="Enable jax debug_nans (fail fast at the op that produced NaN).",
    )
    parser.add_argument(
        "--remat", action="store_true",
        help="Rematerialize the forward in backward (activation memory ↓).",
    )
    parser.add_argument(
        "--accum_steps", type=int, default=1,
        help="Gradient accumulation: scan this many microbatches inside one "
        "jit step (activation memory scales with batch_size/accum_steps), "
        "average grads, one optimizer update. batch_size must divide evenly.",
    )
    parser.add_argument(
        "--scan_steps", type=int, default=0,
        help="Dispatch fusion: scan this many full optimizer steps (each "
        "its own batch + update) inside one jit dispatch — amortizes the "
        "per-dispatch launch latency (biggest on relayed/tunneled links). "
        "Composes with --accum_steps; leftover epoch-tail batches run as "
        "single steps. Default 0 = auto: probe the dispatch latency after "
        "epoch 1 and fuse k=2 only when the link is dispatch-bound.",
    )
    parser.add_argument(
        "--train_elbo", default="xla", choices=("xla", "pallas"),
        help="Kernels for the training ELBO reductions: xla (default — the "
        "fused Pallas rows measured 0.9896x end-to-end inside the train "
        "step, BASELINE.md A/B) or pallas (the fused row kernels; eval "
        "keeps them either way).",
    )
    parser.add_argument(
        "--bf16_moments", action="store_true",
        help="Keep Adam's first moment in bf16 (halves that state's HBM "
        "traffic; optimizer numerics change slightly).",
    )
    parser.add_argument(
        "--zero1", action="store_true",
        help="ZeRO-1: shard large Adam moments over the data axis "
        "(per-shard optimizer update + param all-gather via GSPMD).",
    )
    parser.add_argument(
        "--backend", default="",
        help="jax platform override, e.g. 'cpu' (train on the host when the "
        "TPU link is unavailable; the compile cache switches to the CPU "
        "cache dir).",
    )
    parser.add_argument(
        "--tensorboard", action="store_true",
        help="Also write TensorBoard event files under runs/<name>/tb "
        "(stdlib writer — no tensorboard package needed to produce them).",
    )
    parser.add_argument(
        "--async_ckpt", action="store_true",
        help="Commit checkpoints on a background writer thread so the train "
        "loop doesn't stall on serialize + disk IO (flushed at fit exit; "
        "writer errors surface there).",
    )
    parser.add_argument(
        "--pallas_conv", action="store_true",
        help="Route conv blocks through the fused Pallas kernels where the "
        "measured per-shape thresholds favor them (adaptive per-pass "
        "dispatch; see BASELINE.md for the audited win regions).",
    )
    parser.add_argument(
        "--int8", action="store_true",
        help="Run the posterior-sampling task through the W8A8 quantized "
        "decoder (stochastic-round int8 weights + fused int8 kernels; "
        "1.2-1.7x per deep-channel kernel, ~1.05x end-to-end decode on "
        "v5e at ~86 dB vs the float output — see BASELINE.md). "
        "Eval/task only — training always runs full precision.",
    )
    args = parser.parse_args(argv)
    _resolve_model_flags(args)
    return args


def _resolve_model_flags(args: argparse.Namespace) -> None:
    """Fill model-shape flags left unset: from the checkpoint's embedded
    config when ``--model_ckpt`` is given (the path-alone contract
    ``SuperResolver.from_checkpoint`` and the raster/server CLIs already
    follow), else the reference defaults — so ``--test --model_ckpt
    ckpt/X`` needs no re-typed ``-cr/--patch_size/--model_type``. An
    explicit flag always wins; a true mismatch still gets the
    ``_config_drift`` warning at load time (and usually fails the weight
    restore on shapes)."""
    recorded = {}
    if args.model_ckpt:
        from simple_vae_rs_tpu.train.checkpoint import read_meta

        recorded = read_meta(args.model_ckpt).get("model", {})

    def pick(explicit, key, legacy):
        saved = recorded.get(key)
        return (legacy if saved is None else saved) if explicit is None else explicit

    args.model_type = str(pick(args.model_type, "type", "Cond_SRVAE"))
    args.compression_ratio = float(pick(args.compression_ratio, "cr", 1.5))
    args.latent_size = int(pick(args.latent_size, "latent_size_override", 0))
    if args.patch_size is None:
        saved = recorded.get("patch_size")
        # the recorded value is the MODEL's patch size; the plain VAE
        # trains on the LR stream at --patch_size // 2 (main() below), so
        # undo that halving when reconstructing the flag
        args.patch_size = (
            64 if saved is None
            else int(saved) * (2 if args.model_type == "VAE" else 1)
        )
    # converted reference checkpoints carry the C-major latent wiring; the
    # rebuilt graph must match it or generation silently mis-wires
    # (serve.from_checkpoint carries the same note)
    args.torch_regroup = bool(recorded.get("torch_regroup", False))


def main(args: argparse.Namespace) -> None:
    import jax.numpy as jnp
    from simple_vae_rs_tpu.utils.cache import enable_compilation_cache

    _apply_backend(args)
    if getattr(args, "backend", ""):
        enable_compilation_cache(
            os.path.expanduser(f"~/.cache/svrs_jax_cache_{args.backend}")
        )
    else:
        enable_compilation_cache()

    from simple_vae_rs_tpu.config import (
        CondSRVAEConfig,
        MeshConfig,
        TrainConfig,
        VAEConfig,
    )
    from simple_vae_rs_tpu.data.loader import init_dataloader
    from simple_vae_rs_tpu.models import VAE, CondSRVAE
    from simple_vae_rs_tpu.parallel.mesh import make_mesh
    from simple_vae_rs_tpu.tasks import run_task
    from simple_vae_rs_tpu.train.callbacks import EarlyStopping, ModelCheckpoint
    from simple_vae_rs_tpu.train.checkpoint import checkpoint_exists, load_checkpoint
    from simple_vae_rs_tpu.train.engine import Trainer
    from simple_vae_rs_tpu.utils.logging import make_logger

    cr = args.compression_ratio
    if cr <= 0:
        raise ValueError("Compression ratio must be a positive integer.")
    # --test skips training entirely (reference train.py:54-68); without a
    # checkpoint there is nothing to test, so fail loudly instead of silently
    # evaluating random weights.
    if args.test and not args.model_ckpt:
        raise ValueError("--test requires --model_ckpt (nothing to test otherwise).")

    job_id = os.environ.get(
        "SLURM_JOB_ID", f"local_{time.strftime('%Y%m%d-%H%M%S')}"
    )
    mesh = make_mesh(
        MeshConfig(data=args.mesh_data, model=args.mesh_model, dcn=args.mesh_dcn)
    )
    print(f"Mesh: {dict(mesh.shape)} over {len(mesh.devices.flat)} device(s)")

    train_loader, val_loader = init_dataloader(
        args.dataset,
        args.batch_size,
        args.patch_size,
        crop=args.crop,
        data_root=args.data_root,
        mesh=mesh,
        seed=args.seed,
        workers=args.workers,
    )

    dtype = jnp.bfloat16 if args.bf16 else None
    if args.model_type == "VAE":
        # reference trains the plain VAE on the LR stream at ps/2
        # (train.py:35-40 passes patch_size // 2)
        cfg = VAEConfig(cr=cr, patch_size=args.patch_size // 2,
                        latent_size_override=args.latent_size)
        model = VAE(cfg, dtype=dtype)
        project = "VAE"
    elif args.model_type == "Cond_SRVAE":
        cfg = CondSRVAEConfig(cr=cr, patch_size=args.patch_size,
                              latent_size_override=args.latent_size,
                              torch_regroup=getattr(args, "torch_regroup",
                                                    False))
        model = CondSRVAE(cfg, dtype=dtype)
        project = "Cond_SRVAE"
    elif args.model_type == "SRVAE":
        from simple_vae_rs_tpu.models import SRVAE

        cfg = CondSRVAEConfig(cr=cr, patch_size=args.patch_size,
                              latent_size_override=args.latent_size,
                              torch_regroup=getattr(args, "torch_regroup",
                                                    False))
        model = SRVAE(cfg, dtype=dtype)
        project = "SRVAE"
    else:
        raise ValueError(
            f"Unknown model type: {args.model_type}. Choose 'Cond_SRVAE' or 'VAE'."
        )

    callbacks = [
        # multi-process safe: save_checkpoint gathers collectively and
        # only process 0 touches the filesystem, so every process keeps
        # the callback (they must all reach the gather). EarlyStopping
        # decides from replicated epoch metrics — identical everywhere.
        ModelCheckpoint(job_id, "ckpt", monitor="Loss/val_loss", mode="min",
                        async_save=args.async_ckpt),
        EarlyStopping(patience=25, delta=0.01),
    ]
    if getattr(args, "multihost", False) and jax.process_index() != 0:
        # one metrics/images stream per job: non-zero processes train and
        # evaluate identically but log nowhere
        from simple_vae_rs_tpu.utils.logging import NullLogger

        logger = NullLogger()
    else:
        logger = make_logger(
            project,
            f"Latent-{cfg.latent_size}-Patch-{cfg.patch_size}-SLURM-{job_id}",
            config={
                "latent_size": cfg.latent_size,
                "patch_size": cfg.patch_size,
                "epochs": args.epochs,
                "batch_size": args.batch_size,
                "val_metrics_every": args.val_metrics_every,
                "slurm_job_id": job_id,
                "cr": cr,
            },
            tensorboard=args.tensorboard,
        )
    if args.debug_nans:
        jax.config.update("jax_debug_nans", True)
    if args.pallas_conv:
        from simple_vae_rs_tpu.ops import pallas_conv

        pallas_conv.enable(True)
    train_cfg = TrainConfig(
        epochs=args.epochs,
        batch_size=args.batch_size,
        val_metrics_every=args.val_metrics_every,
        seed=args.seed,
        use_bfloat16=args.bf16,
        profile_dir=args.profile_dir,
        remat=args.remat,
        bf16_moments=args.bf16_moments,
        zero1=args.zero1,
        accum_steps=args.accum_steps,
        scan_steps=args.scan_steps,
        train_elbo=args.train_elbo,
    )
    trainer = Trainer(
        model, train_cfg, callbacks=callbacks, logger=logger, mesh=mesh, job_id=job_id
    )
    state = trainer.init_state(next(iter(train_loader)), seed=args.seed)

    start_epoch = 1
    if args.model_ckpt:
        print("Loading model from checkpoint...")
        if not checkpoint_exists(args.model_ckpt):
            raise FileNotFoundError(f"Model checkpoint {args.model_ckpt} not found.")
        state, meta = load_checkpoint(args.model_ckpt, state)
        for line in _config_drift(meta.get("model", {}), trainer._model_meta()):
            print(line)
        if trainer.mesh is not None:
            # restored leaves are host arrays — re-place them on the mesh
            # (incl. the ZeRO-1 moment layout) or the resumed step would
            # run with whatever default placement jit picks
            from simple_vae_rs_tpu.parallel.mesh import shard_state

            state = shard_state(trainer.mesh, state, zero1=args.zero1)
        trainer.state = state
        start_epoch = int(meta.get("epoch", 0)) + 1
        if "scheduler" in meta:
            trainer.scheduler.load_state_dict(meta["scheduler"])
        print("Model loaded successfully.")

    # --test skips training entirely (reference train.py:54-68).
    if not args.test:
        if start_epoch == 1:
            trainer.pretrain_lr_branch(train_loader, args.pre_epochs)
        trainer.fit(
            train_loader,
            val_loader,
            epochs=args.epochs,
            start_epoch=start_epoch,
            val_metrics_every=args.val_metrics_every,
        )

    variables = {"params": trainer.state.params}
    if trainer.state.batch_stats:
        variables["batch_stats"] = trainer.state.batch_stats
    if args.int8:
        # quantize the decoder once; the task's chunked decodes route
        # through the fused W8A8 kernels (training above was untouched)
        from simple_vae_rs_tpu.ops import quantize as qz

        variables["quant"] = qz.quantize_params_tree(
            variables["params"], jax.random.PRNGKey(args.seed)
        )
    run_task(
        model,
        variables,
        val_loader,
        job_id,
        cr,
        rng=jax.random.PRNGKey(args.seed),
        samples=args.samples,
    )


def _config_drift(recorded: dict, current: dict) -> list:
    """Warnings for CLI flags that disagree with the model config the
    trainer embedded in a checkpoint. The models are fully convolutional,
    so a mismatch does not fail the weight restore — it silently
    trains/evals a different network shape than the checkpoint was
    trained as; this is the safeguard."""
    return [
        f"warning: {key}={current[key]} differs from the checkpoint's "
        f"recorded {key}={val}"
        for key, val in recorded.items()
        if key in current and current[key] != val
    ]


def _apply_backend(args: argparse.Namespace) -> None:
    """Apply --backend before ANY device use (idempotent). The baked
    sitecustomize force-sets jax_platforms="axon,cpu", so an env var alone
    cannot switch backends, and once a backend has initialized the setting
    is frozen — entrypoint() applies this before its device banner."""
    if getattr(args, "backend", "") and not getattr(args, "_backend_applied", False):
        from simple_vae_rs_tpu.utils.backend import apply_backend

        apply_backend(args.backend)
        args._backend_applied = True


def _init_multihost(args: argparse.Namespace) -> None:
    """jax.distributed.initialize() before ANY device use (idempotent).

    On a TPU pod each host runs one process; the coordinator address,
    process count and process id come from the TPU runtime environment
    (explicit overrides via JAX's standard env vars). Must run before the
    backend initializes or the processes form separate single-host
    clusters.
    """
    if getattr(args, "multihost", False) and not getattr(args, "_mh_done", False):
        jax.distributed.initialize()
        print(f"multihost: process {jax.process_index()} of "
              f"{jax.process_count()} "
              f"({jax.local_device_count()} local device(s))")
        args._mh_done = True


def entrypoint() -> None:
    arguments = parse_args()
    _apply_backend(arguments)
    _init_multihost(arguments)
    print("==========================")
    print("Initializing training with the following arguments:")
    print(arguments)
    print("--------------------------")
    print(
        f"Model checkpoint: {'not' if arguments.model_ckpt is None else arguments.model_ckpt} provided"
    )
    print("--------------------------")
    print("Devices:", jax.devices())
    print("==========================")
    main(arguments)


if __name__ == "__main__":
    entrypoint()
