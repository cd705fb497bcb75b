#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint into this framework's format.

Usage:
    python scripts/convert_checkpoint.py ckpt.pth out_ckpt \
        --model_type Cond_SRVAE -cr 1.2 --patch_size 64

Produces ``out_ckpt.orbax`` (or ``.msgpack``) loadable via ``--model_ckpt``.
Conversion is functionally exact for both model types: Cond_SRVAE models are
built with ``torch_regroup=True`` (the reference's C-major latent
reinterpretations as explicit reshapes — see ``utils/convert.py`` and
``tests/test_torch_parity.py``).
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
    ap.add_argument("--allow_pickle", action="store_true",
                    help="Permit the legacy torch unpickler for "
                    "checkpoints with non-tensor pickle content "
                    "(executes pickle bytecode; trusted files only).")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig, VAEConfig
    from simple_vae_rs_tpu.models import VAE, CondSRVAE
    from simple_vae_rs_tpu.train.checkpoint import save_checkpoint
    from simple_vae_rs_tpu.train.state import create_train_state, make_optimizer
    from simple_vae_rs_tpu.utils import convert as cv

    sd = cv.load_torch_state_dict(args.src, allow_pickle=args.allow_pickle)
    if args.model_type == "VAE":
        cfg = VAEConfig(cr=args.compression_ratio, patch_size=args.patch_size)
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
    save_checkpoint(args.dst, state, epoch=0)
    print(f"converted {args.src} -> {args.dst}")


if __name__ == "__main__":
    main()
