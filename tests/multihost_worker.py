"""Worker process for the REAL multi-process integration test.

Each worker is one JAX process of a 2-process CPU "pod" (4 virtual
devices per process, ``jax.distributed.initialize`` over a localhost
coordinator, Gloo collectives) — the branch a physical v5e pod slice
runs (`cli.py --multihost`, SURVEY §5.h), which through round 3 had only
ever executed under a mocked ``process_count``. With ``--nproc 1`` the
same script runs the single-process 8-device control arm.

The worker drives the REAL code path end to end: ``make_mesh`` over the
global devices, a per-process local-slice loader whose batches reach
``parallel.mesh.shard_batch``'s ``make_array_from_process_local_data``
branch inside ``Trainer._device_batch``, a short ``fit``, a checkpoint
save on process 0, a cross-process rendezvous, and a resume from that
checkpoint. It dumps final params + per-epoch losses to ``--out`` for
the parent test to compare across arms (multihost numerics must match
single-process numerics).

Run by ``tests/test_multihost.py``; not a pytest file itself.
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--pid", type=int, required=True)
    ap.add_argument("--nproc", type=int, required=True)
    ap.add_argument("--port", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--ckpt", required=True)
    a = ap.parse_args()

    n_local = 4 // a.nproc
    os.environ["XLA_FLAGS"] = (
        f"--xla_force_host_platform_device_count={n_local}"
    )
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)

    import jax

    jax.config.update("jax_platforms", "cpu")
    if a.nproc > 1:
        jax.distributed.initialize(
            coordinator_address=f"127.0.0.1:{a.port}",
            num_processes=a.nproc,
            process_id=a.pid,
        )
    import jax.numpy as jnp
    import numpy as np

    from simple_vae_rs_tpu.config import (
        CondSRVAEConfig,
        MeshConfig,
        TrainConfig,
    )
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.parallel.mesh import make_mesh
    from simple_vae_rs_tpu.train.checkpoint import (
        load_checkpoint,
        save_checkpoint,
    )
    from simple_vae_rs_tpu.train.engine import Trainer

    assert len(jax.devices()) == 4, jax.devices()
    assert jax.process_count() == a.nproc
    mesh = make_mesh(MeshConfig(data=4, model=1))

    def mark(stage):
        print(f"STAGE {stage} p{a.pid}", flush=True)

    GB, PS, STEPS = 8, 16, 2

    def global_batch(step: int):
        rng = np.random.default_rng(100 + step)
        hr = rng.random((GB, PS, PS, 4), np.float32)
        lr = hr.reshape(GB, PS // 2, 2, PS // 2, 2, 4).mean((2, 4))
        return lr.astype(np.float32), hr.astype(np.float32)

    def local(batch):
        # each process feeds its LOCAL slice of the global batch; the
        # engine's shard_batch assembles the global array
        if a.nproc == 1:
            return batch
        n = GB // a.nproc
        return tuple(x[a.pid * n : (a.pid + 1) * n] for x in batch)

    class Loader:
        def __iter__(self):
            for s in range(STEPS):
                yield local(global_batch(s))

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=PS))
    # scan_steps stays at the shipped default (0 = auto): the post-epoch
    # dispatch probe then runs in every process and its decision is
    # BROADCAST from process 0 (advisor r4: per-process decisions near
    # the threshold could pick different fused-k programs and hang the
    # collectives) — this test exercises that broadcast for real.
    trainer = Trainer(
        model,
        TrainConfig(epochs=1, learning_rate=1e-3, seed=0),
        mesh=mesh,
    )
    loader = Loader()
    mark("fit")
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=10)
    mark("save")

    ckpt = os.path.join(a.ckpt, "mh_model")
    # every process calls: save_checkpoint's cross-process gather is a
    # collective, and only process 0 touches the filesystem
    save_checkpoint(ckpt, state, epoch=1)
    # rendezvous before the load: a cross-process collective cannot
    # complete until every process reaches it, so process 1 cannot race
    # ahead to the load before process 0 finished writing
    from jax.sharding import NamedSharding, PartitionSpec as P

    mark("barrier")
    tok = jax.device_put(
        np.ones((4,), np.float32), NamedSharding(mesh, P("data"))
    )
    barrier = jax.jit(
        lambda t: jnp.sum(t), out_shardings=NamedSharding(mesh, P())
    )
    assert float(jax.device_get(barrier(tok))) == 4.0
    mark("load")

    # resume: restore the checkpoint into the live state's structure and
    # re-place it on the mesh (the cli.py:368-377 resume path), then
    # train one more step through the same meshed dispatch
    from simple_vae_rs_tpu.parallel.mesh import shard_state

    restored, meta = load_checkpoint(ckpt, state)
    trainer.state = shard_state(mesh, restored)
    mark("resume-step")
    lr_now = jnp.float32(1e-3)
    batch = trainer._device_batch(local(global_batch(99)))
    trainer.state, terms = trainer._train_step(trainer.state, batch, lr_now)
    resumed_loss = float(jax.device_get(terms["loss"]))

    flat = np.concatenate(
        [
            np.asarray(jax.device_get(leaf), np.float32).ravel()
            for leaf in jax.tree.leaves(trainer.state.params)
        ]
    )
    out = {
        "pid": a.pid,
        "nproc": a.nproc,
        # the post-epoch auto-scan decision (broadcast from process 0
        # under multihost — the parent asserts all processes agree)
        "auto_scan_k": trainer._auto_scan_k,
        "n_devices": len(jax.devices()),
        "epoch_meta": int(meta.get("epoch", -1)),
        "resumed_loss": resumed_loss,
        "param_sum": float(flat.sum()),
        "param_absmean": float(np.abs(flat).mean()),
        "n_params": int(flat.size),
        "finite": bool(np.isfinite(flat).all()),
    }
    np.save(a.out + f".params{a.pid}.npy", flat)
    with open(a.out, "w") as fh:
        json.dump(out, fh)
    print("WORKER_OK", json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
