#!/usr/bin/env python
"""Repo-root launcher with the reference's CLI surface.

``python train.py --model_type Cond_SRVAE --epochs 500 --batch_size 8
--patch_size 64 -cr 1.2`` — same flags as reference ``train.py:83-148``,
driving the TPU-native engine. See ``simple_vae_rs_tpu/cli.py``.
"""

from simple_vae_rs_tpu.cli import entrypoint

if __name__ == "__main__":
    entrypoint()
