#!/usr/bin/env python
"""Convert checkpoints between the reference's format and this framework's.

Import (reference .pth -> our checkpoint):
    python scripts/convert_checkpoint.py ckpt.pth out_ckpt \
        --model_type Cond_SRVAE -cr 1.2 --patch_size 64

Export (our checkpoint -> reference-loadable .pth):
    python scripts/convert_checkpoint.py ckpt/best out.pth --to_torch \
        --model_type Cond_SRVAE -cr 1.2 --patch_size 64

Import produces ``out_ckpt.orbax`` (or ``.msgpack``) loadable via
``--model_ckpt``; export produces a plain-tensor ``state_dict`` the
reference loads strictly (``model.load_state_dict(torch.load(...))``).
Both directions are functionally exact for both model types: Cond_SRVAE
models are built with ``torch_regroup=True`` (the reference's C-major
latent reinterpretations as explicit reshapes — see ``utils/convert.py``
and ``tests/test_torch_parity.py``).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="reference .pth state_dict")
    ap.add_argument("dst", help="output checkpoint path (no extension)")
    ap.add_argument("--model_type", default="Cond_SRVAE",
                    choices=["Cond_SRVAE", "VAE"])
    ap.add_argument("-cr", "--compression_ratio", type=float, required=True)
    ap.add_argument("--patch_size", type=int, required=True)
    ap.add_argument("--latent_size", type=int, default=0,
                    help="Fixed latent budget override; must match the "
                    "--latent_size the checkpoint was trained with "
                    "(0 = the cr-derived default).")
    ap.add_argument("--allow_pickle", action="store_true",
                    help="Permit the legacy torch unpickler for "
                    "checkpoints with non-tensor pickle content "
                    "(executes pickle bytecode; trusted files only).")
    ap.add_argument("--to_torch", action="store_true",
                    help="Reverse direction: src is one of OUR checkpoints "
                    "(path without .orbax/.msgpack extension), dst a .pth "
                    "state_dict the reference loads strictly.")
    ap.add_argument("--keep_gammas", action="store_true",
                    help="With --to_torch: also store the trained gamma "
                    "scalars (lossless re-import here; the reference then "
                    "needs load_state_dict(strict=False)).")
    args = ap.parse_args()

    import jax

    # conversion is a host-side job: tensor transposes + one tracing init
    # for the structure check. Never pull in an accelerator backend for it
    # (on the tunneled-TPU box that would mean minutes of remote compile —
    # or a hang when the tunnel is down).
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig, VAEConfig
    from simple_vae_rs_tpu.models import VAE, CondSRVAE
    from simple_vae_rs_tpu.train.checkpoint import load_checkpoint, save_checkpoint
    from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer
    from simple_vae_rs_tpu.utils import convert as cv

    if args.to_torch:
        if args.model_type == "VAE":
            cfg = VAEConfig(cr=args.compression_ratio,
                            patch_size=args.patch_size,
                            latent_size_override=args.latent_size)
            model = VAE(cfg)
            x = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.channels))
            init_args = (x, jax.random.PRNGKey(1))
        else:
            cfg = CondSRVAEConfig(cr=args.compression_ratio,
                                  patch_size=args.patch_size,
                                  torch_regroup=True,
                                  latent_size_override=args.latent_size)
            model = CondSRVAE(cfg)
            x = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.channels))
            y = jnp.zeros((1, cfg.lr_patch_size, cfg.lr_patch_size,
                           cfg.channels))
            init_args = (x, y, jax.random.PRNGKey(1))
        variables = model.init({"params": jax.random.PRNGKey(0)}, *init_args,
                               train=False)
        state = create_train_state(variables, make_optimizer(TrainConfig()),
                                   jax.random.PRNGKey(0))
        state, _ = load_checkpoint(args.src, state)
        tree = {"params": state.params, "batch_stats": state.batch_stats}
        sd = (cv.export_vae_state_dict(tree, args.keep_gammas)
              if args.model_type == "VAE"
              else cv.export_cond_state_dict(tree, args.keep_gammas))
        cv.save_torch_state_dict(args.dst, sd)
        print(f"exported {args.src} -> {args.dst} ({len(sd)} tensors)")
        return

    sd = cv.load_torch_state_dict(args.src, allow_pickle=args.allow_pickle)
    if args.model_type == "VAE":
        cfg = VAEConfig(cr=args.compression_ratio, patch_size=args.patch_size,
                        latent_size_override=args.latent_size)
        model = VAE(cfg)
        x = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.channels))
        init_args = (x, jax.random.PRNGKey(1))
        converted = cv.convert_vae_state_dict(sd)
    else:
        # torch_regroup reproduces the reference's C-major latent
        # reinterpretations, making the converted prior path exact
        cfg = CondSRVAEConfig(
            cr=args.compression_ratio, patch_size=args.patch_size,
            torch_regroup=True,
            latent_size_override=args.latent_size,
        )
        model = CondSRVAE(cfg)
        x = jnp.zeros((1, cfg.patch_size, cfg.patch_size, cfg.channels))
        y = jnp.zeros((1, cfg.lr_patch_size, cfg.lr_patch_size, cfg.channels))
        init_args = (x, y, jax.random.PRNGKey(1))
        converted = cv.convert_cond_state_dict(sd)

    variables = model.init({"params": jax.random.PRNGKey(0)}, *init_args, train=False)
    # sanity: the converted tree must match the model's structure exactly
    expect = jax.tree.map(jnp.shape, variables["params"])
    got = jax.tree.map(lambda a: tuple(a.shape), converted["params"])
    if expect != got:
        raise SystemExit("converted tree does not match the model structure")

    state = create_train_state(
        {"params": converted["params"], "batch_stats": converted["batch_stats"]},
        make_optimizer(TrainConfig()),
        jax.random.PRNGKey(0),
    )
    # embed the model config so serving can reconstruct the network from
    # the checkpoint path alone (mirrors Trainer._model_meta)
    save_checkpoint(args.dst, state, epoch=0, extra={"model": {
        "type": args.model_type if args.model_type == "VAE" else "Cond_SRVAE",
        "cr": float(cfg.cr),
        "patch_size": int(cfg.patch_size),
        "channels": int(cfg.channels),
        "latent_size_override": int(cfg.latent_size_override),
        # converted Cond checkpoints use the reference-exact latent wiring;
        # serving must rebuild the same graph or generation mis-wires
        "torch_regroup": bool(getattr(cfg, "torch_regroup", False)),
    }})
    print(f"converted {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
