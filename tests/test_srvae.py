"""Hierarchical srVAE (two latent levels, internal LR view) + LR pretraining."""

import numpy as np
import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
from simple_vae_rs_tpu.models import SRVAE
from simple_vae_rs_tpu.models.srvae import box_downsample_2x
from simple_vae_rs_tpu.train.engine import Trainer


class ArrayLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _batches(n=2, bs=2, ps=16, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.random((bs, ps // 2, ps // 2, 4), dtype=np.float32),
            rng.random((bs, ps, ps, 4), dtype=np.float32),
        )
        for _ in range(n)
    ]


def test_box_downsample():
    x = jnp.arange(16, dtype=jnp.float32).reshape(1, 4, 4, 1)
    y = box_downsample_2x(x)
    assert y.shape == (1, 2, 2, 1)
    np.testing.assert_allclose(np.asarray(y)[0, 0, 0, 0], (0 + 1 + 4 + 5) / 4)


def test_srvae_forward_shapes():
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = SRVAE(cfg)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 16, 4))
    out, _ = model.init_with_output(
        {"params": jax.random.PRNGKey(1)}, x, jax.random.PRNGKey(2), train=False
    )
    assert len(out) == 9
    x_hat, y_hat = out[0], out[1]
    y_int = out[8]
    assert x_hat.shape == (2, 16, 16, 4)
    assert y_hat.shape == (2, 8, 8, 4)
    np.testing.assert_allclose(
        np.asarray(y_int), np.asarray(box_downsample_2x(x)), rtol=1e-6
    )


def test_srvae_training_loop_and_task_paths(tmp_path):
    batches = _batches(ps=16)
    loader = ArrayLoader(batches)
    model = SRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3))
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=1)
    assert int(state.step) == len(batches)
    assert trainer.baseline_metrics is not None

    # chunked posterior sampling + unconditional generation via run_task
    from simple_vae_rs_tpu.tasks import run_task, sample_chunked, uncertainty_maps

    variables = {"params": state.params, "batch_stats": state.batch_stats}
    y = batches[0][0][:1]
    draws = sample_chunked(model, variables, jnp.asarray(y), jax.random.PRNGKey(0),
                           samples=5, chunk=2)
    assert draws.shape == (5, 16, 16, 4)
    # HR input also accepted (downsampled internally)
    x = batches[0][1][:1]
    maps = uncertainty_maps(model, variables, jnp.asarray(x), jax.random.PRNGKey(1),
                            samples=4, chunk=4)
    assert maps["variance"].shape == (16, 16, 4)
    out = run_task(model, variables, loader, "job", 2.0,
                   samples=4, chunk=4, results_root=str(tmp_path))
    assert np.isfinite(out["mmse"])


def test_srvae_pretrain_lr_branch():
    """Hierarchical model pre-trains its LR branch from the internal view."""
    batches = _batches(n=1, ps=16, seed=7)
    loader = ArrayLoader(batches)
    model = SRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state0 = trainer.init_state(batches[0])
    before = jax.device_get(state0.params)
    trainer.pretrain_lr_branch(loader, pre_epochs=1)
    after = jax.device_get(trainer.state.params)
    moved = frozen = 0
    for path, a in jax.tree_util.tree_leaves_with_path(before):
        node = after
        for k in path:
            node = node[k.key]
        name = jax.tree_util.keystr(path)
        same = np.allclose(np.asarray(a), np.asarray(node))
        if ("ey_" in name) or ("dy_" in name) or ("gammay" in name):
            assert not same, name
            moved += 1
        else:
            assert same, name
            frozen += 1
    assert moved and frozen


def test_cond_pretrain_lr_branch_only_updates_y_branch():
    from simple_vae_rs_tpu.config import CondSRVAEConfig
    from simple_vae_rs_tpu.models import CondSRVAE

    batches = _batches(n=1, ps=16, seed=3)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state0 = trainer.init_state(batches[0])
    before = jax.device_get(state0.params)
    trainer.pretrain_lr_branch(loader, pre_epochs=2)
    after = jax.device_get(trainer.state.params)

    # y-branch (encoder_y 'ey_*', decoder_y 'dy_*', gammay) must move;
    # everything else must stay frozen
    moved, frozen = [], []
    for path, a in jax.tree_util.tree_leaves_with_path(before):
        node = after
        for k in path:
            node = node[k.key]
        name = jax.tree_util.keystr(path)
        same = np.allclose(np.asarray(a), np.asarray(node))
        is_y = ("ey_" in name) or ("dy_" in name) or ("gammay" in name)
        if is_y:
            moved.append((name, not same))
        else:
            frozen.append((name, same))
    assert all(m for _, m in moved), [n for n, m in moved if not m]
    assert all(s for _, s in frozen), [n for n, s in frozen if not s]
