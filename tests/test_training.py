"""Integration: 1-epoch fit for both models on synthetic data (CPU JAX).

Mirrors reference ``tests/test_training.py`` (DummyWandb + 1 epoch through
the full engine incl. callbacks/eval/scheduler) with this framework's
NullLogger; also covers early stopping, checkpointing and the NaN guard —
paths the reference never tests.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig, VAEConfig
from simple_vae_rs_tpu.models import VAE, CondSRVAE
from simple_vae_rs_tpu.train.callbacks import EarlyStopping, ModelCheckpoint
from simple_vae_rs_tpu.train.engine import Trainer
from simple_vae_rs_tpu.train.schedule import ReduceLROnPlateau


class ArrayLoader:
    """Minimal loader over in-memory (lr, hr) batches."""

    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _sr_batches(n=2, bs=2, ps=16, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.random((bs, ps // 2, ps // 2, 4), dtype=np.float32),
            rng.random((bs, ps, ps, 4), dtype=np.float32),
        )
        for _ in range(n)
    ]


def test_vae_training_loop_runs_one_epoch():
    batches = _sr_batches(ps=32)
    loader = ArrayLoader(batches)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3))
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=1)
    assert trainer.scheduler.last_epoch == 1
    assert int(state.step) == len(batches)


def test_cond_training_loop_runs_one_epoch(tmp_path):
    batches = _sr_batches(ps=16)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    cb = ModelCheckpoint("test", str(tmp_path / "ckpt"), monitor="Loss/val_loss")
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3), callbacks=[cb])
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=1)
    assert trainer.scheduler.last_epoch == 1
    # bicubic baseline computed at train start (reference on_train_start)
    assert trainer.baseline_metrics is not None
    assert -1.0 <= trainer.baseline_metrics["ssim_base"] <= 1.0
    # checkpoint written on improvement at epoch 1
    from simple_vae_rs_tpu.train.checkpoint import checkpoint_exists

    assert checkpoint_exists(str(tmp_path / "ckpt" / "test"))
    assert int(state.step) == len(batches)


def test_training_reduces_loss_on_fixed_batch():
    """A few steps of Adam on one repeated batch must reduce the ELBO."""
    batches = _sr_batches(n=1, bs=4, ps=16, seed=3) * 4
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=3, learning_rate=1e-3))
    trainer.init_state(batches[0])

    import jax

    lr = jnp.float32(1e-3)
    first = None
    state = trainer.state
    for i in range(8):
        state, terms = trainer._train_step(state, trainer._device_batch(batches[0]), lr)
        if i == 0:
            first = float(terms["loss"])
    last = float(terms["loss"])
    assert np.isfinite(first) and np.isfinite(last)
    assert last < first


def test_early_stopping_protocol():
    # engine-keyed logs (the wired path; VERDICT r1 #1)
    es = EarlyStopping(patience=2, delta=0.01)
    assert not es.on_epoch_end(logs={"Loss/val_loss": 1.0})
    assert not es.on_epoch_end(logs={"Loss/val_loss": 1.5})  # counter 1
    assert es.on_epoch_end(logs={"Loss/val_loss": 1.5})  # counter 2 -> stop
    # dead band: within +/- delta neither resets nor counts (reference quirk)
    es2 = EarlyStopping(patience=1, delta=0.1)
    es2.on_epoch_end(logs={"Loss/val_loss": 1.0})
    assert not es2.on_epoch_end(logs={"Loss/val_loss": 1.05})
    assert not es2.on_epoch_end(logs={"Loss/val_loss": 1.05})
    # bare keys still resolve via fuzzy matching (like ModelCheckpoint)
    es3 = EarlyStopping(patience=1, delta=0.0)
    assert not es3.on_epoch_end(logs={"val_loss": 1.0})
    assert es3.monitor == "val_loss"
    assert es3.on_epoch_end(logs={"val_loss": 2.0})


class _FinishCountingLogger:
    """NullLogger that records finish() calls."""

    def __init__(self):
        self.finished = 0

    def log(self, metrics, step=None):
        pass

    def log_images(self, images, step=None):
        pass

    def finish(self):
        self.finished += 1


def test_early_stopping_fires_through_engine():
    """Worsening val loss through the REAL engine stops fit at patience.

    Guards the round-1 bug where EarlyStopping monitored 'val_loss' but the
    engine logs 'Loss/val_loss', so the wired path could never stop. Also
    asserts logger.finish() runs on the early-stop exit path.
    """
    train_batches = _sr_batches(n=1, bs=2, ps=32, seed=0)

    class WorseningValLoader:
        """Val data degrades each epoch -> val loss strictly increases."""

        def __init__(self):
            self.trainer = None

        def __iter__(self):
            scale = np.float32(1.0 + 4.0 * self.trainer.current_epoch)
            yield tuple(b * scale for b in train_batches[0])

        def __len__(self):
            return 1

    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    es = EarlyStopping(patience=2, delta=0.0)
    logger = _FinishCountingLogger()
    trainer = Trainer(
        model,
        TrainConfig(epochs=50, learning_rate=1e-6),
        callbacks=[es],
        logger=logger,
    )
    val_loader = WorseningValLoader()
    val_loader.trainer = trainer
    trainer.fit(
        ArrayLoader(train_batches), val_loader, epochs=50, val_metrics_every=100
    )
    assert es.monitor == "Loss/val_loss"
    assert es.counter >= es.patience
    # best at epoch 1; epochs 2 and 3 worsen -> stop after epoch 3, not 50
    assert trainer.current_epoch == 3
    assert logger.finished == 1


def test_model_checkpoint_fuzzy_monitor(tmp_path):
    """Epoch-1 fuzzy metric-name match (reference callbacks.py:119-130)."""
    from simple_vae_rs_tpu.train.state import TrainState, create_train_state, make_optimizer
    import jax

    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    v = model.init(
        {"params": jax.random.PRNGKey(0)},
        jnp.zeros((1, 16, 16, 4)),
        jax.random.PRNGKey(1),
        train=False,
    )
    state = create_train_state(v, make_optimizer(TrainConfig()), jax.random.PRNGKey(2))
    cb = ModelCheckpoint("job", str(tmp_path), monitor="Loss/val_loss")
    cb.on_epoch_end(epoch=1, state=state, logs={"Loss/val_total_loss": 0.5})
    assert cb.monitor == "Loss/val_total_loss"
    from simple_vae_rs_tpu.train.checkpoint import checkpoint_exists

    assert checkpoint_exists(str(tmp_path / "job"))


def test_nan_guard_raises():
    batches = [(np.full((2, 8, 8, 4), np.nan, np.float32),
                np.full((2, 16, 16, 4), np.nan, np.float32))]
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1))
    with pytest.raises(ValueError, match="NaN detected"):
        trainer.fit(loader, loader, epochs=1, val_metrics_every=10)


def test_reduce_lr_on_plateau_torch_semantics():
    s = ReduceLROnPlateau(lr=1.0, factor=0.5, patience=2)
    for _ in range(3):
        s.step(1.0)  # first sets best, next 2 are bad
    assert s.lr == 1.0
    s.step(1.0)  # third bad epoch > patience -> halve
    assert s.lr == 0.5
    s.step(0.5)  # improvement resets
    assert s.num_bad_epochs == 0


def test_remat_matches_plain_step():
    """jax.checkpoint changes memory behavior, not math: one remat'd step
    must produce the same loss and parameters as the plain step."""
    import jax

    batches = _sr_batches(n=1, ps=16, seed=9)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    def one_step(remat):
        trainer = Trainer(model, TrainConfig(learning_rate=1e-3, remat=remat, seed=4))
        state = trainer.init_state(batches[0])
        state, terms = trainer._train_step(
            state, trainer._device_batch(batches[0]), jnp.float32(1e-3)
        )
        return float(terms["loss"]), jax.device_get(state.params)

    loss_a, p_a = one_step(False)
    loss_b, p_b = one_step(True)
    assert loss_a == pytest.approx(loss_b, rel=1e-6)
    for a, b in zip(jax.tree.leaves(p_a), jax.tree.leaves(p_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_training_is_deterministic_across_runs():
    """Same seed -> bitwise-identical parameters after identical steps
    (the deterministic-RNG guarantee SURVEY §5.b asks for)."""
    import jax

    batches = _sr_batches(n=2, ps=16, seed=5)

    def run():
        model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
        trainer = Trainer(model, TrainConfig(learning_rate=1e-3, seed=11))
        state = trainer.init_state(batches[0])
        for b in batches:
            state, _ = trainer._train_step(
                state, trainer._device_batch(b), jnp.float32(1e-3)
            )
        return jax.device_get(state.params)

    p1, p2 = run(), run()
    for a, b in zip(jax.tree.leaves(p1), jax.tree.leaves(p2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_checkpoint_roundtrip_exact_resume(tmp_path):
    """Save -> load restores params, Adam moments, rng and step exactly."""
    import jax

    from simple_vae_rs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    batches = _sr_batches(n=1, ps=16)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state = trainer.init_state(batches[0])
    state, _ = trainer._train_step(
        state, trainer._device_batch(batches[0]), jnp.float32(1e-3)
    )
    save_checkpoint(str(tmp_path / "ck"), state, epoch=7, extra={"scheduler": {"lr": 1e-3, "best": 1.0, "num_bad_epochs": 0, "last_epoch": 7}})

    fresh = trainer.init_state(batches[0])
    restored, meta = load_checkpoint(str(tmp_path / "ck"), fresh)
    assert meta["epoch"] == 7
    for a, b in zip(jax.tree.leaves(state.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for a, b in zip(jax.tree.leaves(state.opt_state), jax.tree.leaves(restored.opt_state)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.step) == int(state.step)


def test_async_checkpoint_roundtrip_and_ordering(tmp_path):
    """block=False commits on the writer thread: wait_for_saves/load see the
    finished file, and a newer blocking save to the same path wins over an
    older in-flight async one."""
    import jax

    from simple_vae_rs_tpu.train import checkpoint as ck

    batches = _sr_batches(n=1, ps=32)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state0 = trainer.init_state(batches[0])
    # a distinct second state without the donating train step (which would
    # delete state0's buffers)
    state1 = state0.replace(
        params=jax.tree.map(lambda x: x + 1.0, state0.params),
        step=state0.step + 1,
    )

    path = str(tmp_path / "ck")
    ck.save_checkpoint(path, state0, epoch=1, block=False)
    ck.wait_for_saves()
    restored, meta = ck.load_checkpoint(path, trainer.init_state(batches[0]))
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(state0.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # older async save, then newer blocking save: the blocking one flushes
    # first, so the final file on disk is state1/epoch 2
    ck.save_checkpoint(path, state0, epoch=1, block=False)
    ck.save_checkpoint(path, state1, epoch=2, block=True)
    restored, meta = ck.load_checkpoint(path, trainer.init_state(batches[0]))
    assert meta["epoch"] == 2
    for a, b in zip(jax.tree.leaves(state1.params), jax.tree.leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_async_checkpoint_writer_errors_surface(tmp_path, monkeypatch):
    """A failed background save must raise at the flush point, not vanish."""
    import pytest as _pytest

    from simple_vae_rs_tpu.train import checkpoint as ck

    batches = _sr_batches(n=1, ps=32)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state = trainer.init_state(batches[0])

    def boom(path, tree, meta):
        raise OSError("disk full")

    monkeypatch.setattr(ck, "_write_tree", boom)
    ck.save_checkpoint(str(tmp_path / "ck"), state, epoch=1, block=False)
    with _pytest.raises(OSError, match="disk full"):
        ck.wait_for_saves()
    # the queue is drained — the next flush is clean
    ck.wait_for_saves()


def test_async_checkpoint_through_engine(tmp_path):
    """ModelCheckpoint(async_save=True) through a real fit: the checkpoint
    is on disk (flushed by fit's exit path) and resumes exactly."""
    from simple_vae_rs_tpu.train.checkpoint import checkpoint_exists, load_checkpoint

    batches = _sr_batches(ps=16)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    cb = ModelCheckpoint("job", str(tmp_path), monitor="Loss/val_loss",
                         async_save=True)
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3),
                      callbacks=[cb])
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=1)
    assert checkpoint_exists(str(tmp_path / "job"))
    restored, meta = load_checkpoint(
        str(tmp_path / "job"), trainer.init_state(batches[0])
    )
    assert meta["epoch"] == 1
    assert int(restored.step) == int(state.step)
    # the trainer embeds the model config so serving can rebuild the
    # network from the checkpoint path alone
    assert meta["model"] == {
        "type": "Cond_SRVAE", "cr": 2.0, "patch_size": 16, "channels": 4,
        "latent_size_override": 0, "torch_regroup": False,
    }


def test_sigterm_checkpoints_and_stops(tmp_path):
    """Preemption safety: SIGTERM during fit finishes the epoch, writes a
    resumable <job>_preempt checkpoint (current state + scheduler + model
    meta) and returns — instead of dying mid-epoch."""
    import os
    import signal

    from simple_vae_rs_tpu.train.checkpoint import load_checkpoint

    batches = _sr_batches(ps=16)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    class Preempt:
        """Raises SIGTERM against our own process at the end of epoch 2 —
        the handler defers the stop to the epoch boundary."""

        def on_epoch_begin(self, **kw):
            return False

        def on_epoch_end(self, **kw):
            if kw.get("epoch") == 2:
                os.kill(os.getpid(), signal.SIGTERM)
            return False

    cb = ModelCheckpoint("job", str(tmp_path), monitor="Loss/val_loss")
    trainer = Trainer(model, TrainConfig(epochs=9, learning_rate=1e-3),
                      callbacks=[Preempt(), cb])
    state = trainer.fit(loader, loader, epochs=9, val_metrics_every=9)
    assert trainer.current_epoch == 2  # stopped at the preempted epoch
    path = str(tmp_path / "job_preempt")
    restored, meta = load_checkpoint(path, trainer.init_state(batches[0]))
    assert meta["epoch"] == 2
    assert meta["model"]["type"] == "Cond_SRVAE"
    assert "scheduler" in meta
    assert int(restored.step) == int(state.step)
    # the default SIGTERM disposition is restored after fit
    assert signal.getsignal(signal.SIGTERM) is signal.SIG_DFL


def test_bf16_moments_flag_changes_mu_dtype_and_trains():
    """TrainConfig(bf16_moments=True) keeps Adam's first moment in bf16
    (second stays f32) and a train step still runs and updates params."""
    import jax
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import TrainConfig, VAEConfig
    from simple_vae_rs_tpu.models import VAE
    from simple_vae_rs_tpu.train.engine import Trainer

    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(bf16_moments=True))
    # vae trains on batch[0]; the model patch size is 16
    lr = jnp.ones((2, 16, 16, 4), jnp.float32)
    hr = jnp.ones((2, 32, 32, 4), jnp.float32)
    trainer.init_state(next(iter([(lr, hr)])))
    mus = jax.tree_util.tree_leaves(trainer.state.opt_state[1].mu)
    nus = jax.tree_util.tree_leaves(trainer.state.opt_state[1].nu)
    assert all(m.dtype == jnp.bfloat16 for m in mus)
    assert all(n.dtype == jnp.float32 for n in nus)
    before = jax.tree_util.tree_leaves(trainer.state.params)[0].copy()
    trainer.state, terms = trainer._train_step(
        trainer.state, (lr, hr), jnp.float32(1e-3)
    )
    assert float(terms["loss"]) == float(terms["loss"])  # finite
    after = jax.tree_util.tree_leaves(trainer.state.params)[0]
    assert not jnp.array_equal(before, after)


def test_full_val_evaluate_iterates_loader_once():
    """One-pass evaluation: metrics, LPIPS inputs and the image panel all
    come from a SINGLE val-loader iteration per full-val epoch (the
    round-2 version iterated up to three times, re-reading a disk-backed
    split each pass)."""

    class CountingLoader(ArrayLoader):
        def __init__(self, batches):
            super().__init__(batches)
            self.iterations = 0

        def __iter__(self):
            self.iterations += 1
            return iter(self.batches)

    loader = CountingLoader(_sr_batches(ps=16))
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1))
    trainer.init_state(loader.batches[0])

    # epoch 1: metrics + image-cadence epoch -> still one pass
    trainer.evaluate(loader, epoch=1, full_val=True)
    assert loader.iterations == 1
    # non-image epoch: one pass too
    trainer.evaluate(loader, epoch=2, full_val=True)
    assert loader.iterations == 2
    # image-only call (no full val): one pass for the first batch
    trainer.evaluate(loader, epoch=10, full_val=False)
    assert loader.iterations == 3


# --------------------------------------------------------- grad accumulation
def test_gradient_accumulation_matches_manual_average():
    """accum_steps=2 must equal: per-microbatch grads (same rng folding,
    BN stats threaded micro 0 -> micro 1), averaged, ONE optimizer update.
    Re-derived here with the engine's own loss fn and optax update."""
    import jax

    batch = _sr_batches(n=1, bs=4, ps=16, seed=11)[0]
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    t_acc = Trainer(model, TrainConfig(learning_rate=1e-3, accum_steps=2))
    s0 = t_acc.init_state(batch)
    lr = jnp.float32(1e-3)
    s1, terms = t_acc._train_step(s0, t_acc._device_batch(batch), lr)

    # manual re-derivation on an identical fresh state
    t_ref = Trainer(model, TrainConfig(learning_rate=1e-3))
    r0 = t_ref.init_state(batch)
    step_rng = jax.random.fold_in(r0.rng, r0.step)
    mb0 = tuple(a[:2] for a in batch)
    mb1 = tuple(a[2:] for a in batch)
    g0, tm0, stats0 = t_ref._micro_grads(
        r0.params, r0.batch_stats, t_ref._device_batch(mb0),
        jax.random.fold_in(step_rng, 0),
    )
    g1, tm1, stats1 = t_ref._micro_grads(
        r0.params, stats0, t_ref._device_batch(mb1),
        jax.random.fold_in(step_rng, 1),
    )
    gavg = jax.tree.map(lambda a, b: (a + b) / 2.0, g0, g1)
    updates, _ = t_ref.tx.update(gavg, r0.opt_state, r0.params)
    expect_params = jax.tree.map(lambda p, u: p - lr * u, r0.params, updates)

    # scan-vs-inline grad summation reassociates float adds, and Adam's
    # rsqrt amplifies that near zero — tolerance reflects update noise
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(expect_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=2e-5)
    # terms are the microbatch average
    expect_loss = (float(tm0["loss"]) + float(tm1["loss"])) / 2.0
    np.testing.assert_allclose(float(terms["loss"]), expect_loss, rtol=1e-5)
    # BN running stats came through the scan (micro 1's output)
    for a, b in zip(jax.tree.leaves(s1.batch_stats), jax.tree.leaves(stats1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=2e-6)
    assert int(s1.step) == 1  # ONE optimizer step, not accum_steps


def test_gradient_accumulation_trains_through_engine():
    """A 1-epoch fit with accum_steps=4 runs, loss finite, params move."""
    import jax

    batches = _sr_batches(n=2, bs=4, ps=32, seed=5)
    loader = ArrayLoader(batches)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3,
                                         accum_steps=4))
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=10)
    assert int(state.step) == len(batches)
    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)


def test_gradient_accumulation_rejects_ragged_batch():
    batch = _sr_batches(n=1, bs=3, ps=32)[0]
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(accum_steps=2))
    trainer.init_state(batch)
    with pytest.raises(ValueError, match="not divisible"):
        trainer._train_step(trainer.state, trainer._device_batch(batch),
                            jnp.float32(1e-3))


def test_async_checkpoint_flush_awaits_all_saves(tmp_path, monkeypatch):
    """An early writer failure must not abandon later in-flight saves: the
    flush awaits every future (no torn reads), then re-raises the first."""
    import time as _time

    from simple_vae_rs_tpu.train import checkpoint as ck

    marker = tmp_path / "second_done"
    real_write = ck._write_tree
    calls = []

    def first_fails(path, tree, meta):
        calls.append(path)
        if len(calls) == 1:
            raise OSError("disk full")
        _time.sleep(0.2)  # make the second save observably in-flight
        real_write(path, tree, meta)
        marker.touch()

    monkeypatch.setattr(ck, "_write_tree", first_fails)
    batches = _sr_batches(n=1, ps=32)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3))
    state = trainer.init_state(batches[0])
    ck.save_checkpoint(str(tmp_path / "a"), state, epoch=1, block=False)
    ck.save_checkpoint(str(tmp_path / "b"), state, epoch=2, block=False)
    with pytest.raises(OSError, match="disk full"):
        ck.wait_for_saves()
    # the second save completed BEFORE the error was re-raised
    assert marker.exists()


# ----------------------------------------------------------- dispatch fusion
def test_scan_steps_matches_sequential_dispatches():
    """scan_steps=2: ONE fused dispatch of two full optimizer steps must
    equal the same two steps dispatched separately — same RNG folding
    (state.step advances in the scan carry), same updates; terms come
    back summed over the fused steps."""
    import jax

    b0, b1 = _sr_batches(n=2, bs=2, ps=16, seed=3)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    lr = jnp.float32(1e-3)

    t_seq = Trainer(model, TrainConfig(learning_rate=1e-3))
    s = t_seq.init_state(b0, seed=0)
    s, tm0 = t_seq._train_step(s, t_seq._device_batch(b0), lr)
    s, tm1 = t_seq._train_step(s, t_seq._device_batch(b1), lr)

    t_fused = Trainer(model, TrainConfig(learning_rate=1e-3, scan_steps=2))
    r = t_fused.init_state(b0, seed=0)
    r, terms = t_fused._train_multi_step(
        r, t_fused._device_batch_stack([b0, b1]), lr
    )

    assert int(r.step) == int(s.step) == 2
    # scan-vs-inline compiles reassociate float adds and Adam's rsqrt
    # amplifies that near zero; two chained updates double the noise
    # (same tolerance class as the dcn all-reduce equality test)
    for a, b in zip(jax.tree.leaves(r.params), jax.tree.leaves(s.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=1e-4)
    # step-2 BN stats see step-1's (noise-perturbed) params, so the
    # reassociation noise propagates — tolerance covers that, not math
    for a, b in zip(jax.tree.leaves(r.batch_stats),
                    jax.tree.leaves(s.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=5e-3, atol=1e-5)
    expect_loss = float(tm0["loss"]) + float(tm1["loss"])
    np.testing.assert_allclose(float(terms["loss"]), expect_loss, rtol=1e-4)


def test_scan_steps_through_engine_with_ragged_tail():
    """A fit with scan_steps=2 over 5 batches (one mid-epoch shape change)
    fuses what it can and single-dispatches the rest: every batch still
    trains exactly once and the epoch loss stays the per-step mean."""
    batches = _sr_batches(n=2, bs=4, ps=32, seed=5) \
        + _sr_batches(n=1, bs=2, ps=32, seed=6) \
        + _sr_batches(n=2, bs=4, ps=32, seed=7)
    loader = ArrayLoader(batches)
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3,
                                         scan_steps=2))
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=10)
    assert int(state.step) == len(batches)
    import jax

    leaves = jax.tree.leaves(state.params)
    assert all(np.isfinite(np.asarray(v)).all() for v in leaves)


def test_scan_steps_composes_with_accum():
    """scan_steps=2 x accum_steps=2: two fused optimizer updates, each
    averaging two microbatch grads — runs through the engine and applies
    exactly one update per batch."""
    batches = _sr_batches(n=4, bs=4, ps=16, seed=9)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, learning_rate=1e-3,
                                         scan_steps=2, accum_steps=2))
    state = trainer.fit(loader, loader, epochs=1, val_metrics_every=10)
    assert int(state.step) == len(batches)


def test_auto_scan_engages_on_dispatch_bound_link(monkeypatch):
    """scan_steps=0 (the default): after epoch 1 the engine probes the
    per-dispatch round trip and — on a dispatch-bound link — fuses k=2
    steps per dispatch for the remaining epochs, no flag needed (the
    round-3 degraded-tunnel case: 7,592 p/s unfused vs 10,540 fused)."""
    from simple_vae_rs_tpu.utils import health

    monkeypatch.setattr(health, "dispatch_latency", lambda reps=3: 1e6)
    batches = _sr_batches(n=4, bs=2, ps=16, seed=21)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=2, learning_rate=1e-3))
    assert trainer.cfg.scan_steps == 0  # auto is the default
    fused_calls = []
    orig = trainer._train_multi_step
    trainer._train_multi_step = (
        lambda *a, **k: (fused_calls.append(1), orig(*a, **k))[1]
    )
    state = trainer.fit(loader, loader, epochs=2, val_metrics_every=10)
    assert trainer._auto_scan_k == health.AUTO_SCAN_K
    assert fused_calls, "epoch 2 should have used the fused dispatch"
    assert int(state.step) == 2 * len(batches)
    import jax

    assert all(np.isfinite(np.asarray(v)).all()
               for v in jax.tree.leaves(state.params))


def test_auto_scan_stays_unfused_on_fast_link(monkeypatch):
    """On a compute-bound backend (probe latency << per-step time) the
    auto policy keeps k=1 — no fused compile, no behavior change."""
    from simple_vae_rs_tpu.utils import health

    monkeypatch.setattr(health, "dispatch_latency", lambda reps=3: 0.0)
    batches = _sr_batches(n=2, bs=2, ps=16, seed=22)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=2, learning_rate=1e-3))
    fused_calls = []
    orig = trainer._train_multi_step
    trainer._train_multi_step = (
        lambda *a, **k: (fused_calls.append(1), orig(*a, **k))[1]
    )
    trainer.fit(loader, loader, epochs=2, val_metrics_every=10)
    assert trainer._auto_scan_k == 1
    assert not fused_calls


def test_explicit_scan_steps_overrides_auto(monkeypatch):
    """An explicit --scan_steps k skips the probe entirely."""
    from simple_vae_rs_tpu.utils import health

    def boom(reps=3):
        raise AssertionError("probe must not run with explicit scan_steps")

    monkeypatch.setattr(health, "dispatch_latency", boom)
    batches = _sr_batches(n=2, bs=2, ps=16, seed=23)
    loader = ArrayLoader(batches)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=2, learning_rate=1e-3,
                                         scan_steps=2))
    trainer.fit(loader, loader, epochs=2, val_metrics_every=10)
    assert trainer._auto_scan_k is None


def test_msgpack_save_removes_stale_orbax(tmp_path, monkeypatch):
    """Advisor r4: a multi-process (msgpack-path) save at a path that
    previously held a single-process orbax checkpoint must remove the
    stale .orbax tree — load_checkpoint prefers orbax and would silently
    resume from the OLDER state otherwise."""
    import os

    import jax

    from simple_vae_rs_tpu.train import checkpoint as ck

    path = str(tmp_path / "job")
    stale = path + ".orbax"
    os.makedirs(stale)
    with open(os.path.join(stale, "marker"), "w") as fh:
        fh.write("old")

    # process_count > 1 routes _write_tree down the collective-free
    # msgpack path (the tree is already plain host arrays)
    monkeypatch.setattr(jax, "process_count", lambda: 2)
    tree = {"params": {"w": np.ones((2, 2), np.float32)},
            "batch_stats": {}, "opt_state": (), "rng": np.zeros(2, np.uint32),
            "step": np.int64(3)}
    ck._write_tree(path, tree, {"epoch": 1})
    assert os.path.exists(path + ".msgpack")
    assert not os.path.isdir(stale), "stale .orbax survived the msgpack save"
