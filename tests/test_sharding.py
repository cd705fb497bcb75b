"""Multi-device tests on the 8-device virtual CPU mesh (conftest forces it)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_vae_rs_tpu.config import CondSRVAEConfig, MeshConfig, TrainConfig
from simple_vae_rs_tpu.models import CondSRVAE
from simple_vae_rs_tpu.parallel.mesh import make_mesh, shard_batch, shard_state
from simple_vae_rs_tpu.train.engine import Trainer

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _batch(bs=8, ps=16, seed=0):
    rng = np.random.default_rng(seed)
    return (
        rng.random((bs, ps // 2, ps // 2, 4), dtype=np.float32),
        rng.random((bs, ps, ps, 4), dtype=np.float32),
    )


def test_mesh_axes():
    mesh = make_mesh(MeshConfig(data=-1, model=1))
    assert dict(mesh.shape) == {"data": 8, "model": 1}
    mesh2 = make_mesh(MeshConfig(data=4, model=2))
    assert dict(mesh2.shape) == {"data": 4, "model": 2}


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig(data=8, model=1))
    (y, x) = shard_batch(mesh, _batch())
    assert len(y.sharding.device_set) == 8
    spec = y.sharding.spec
    assert spec[0] == "data"


def test_dp_train_step_runs_and_matches_single_device():
    """The sharded step must produce the same loss as unsharded (same math,
    just distributed — XLA inserts the collectives)."""
    batch = _batch(bs=8, ps=16)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    mesh = make_mesh(MeshConfig(data=8, model=1))
    t_sharded = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=mesh)
    s1 = t_sharded.init_state(batch)
    s1, terms1 = t_sharded._train_step(
        s1, t_sharded._device_batch(batch), jnp.float32(1e-3)
    )

    t_single = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=None)
    s2 = t_single.init_state(batch)
    s2, terms2 = t_single._train_step(
        s2, t_single._device_batch(batch), jnp.float32(1e-3)
    )
    np.testing.assert_allclose(
        float(terms1["loss"]), float(terms2["loss"]), rtol=2e-4
    )
    # params after one step agree too (global-batch BN + all-reduced grads)
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=2e-5)


def test_tp_model_axis_sharding_runs():
    """data=4 x model=2: wide head kernels sharded over out-channels."""
    batch = _batch(bs=8, ps=16, seed=1)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    mesh = make_mesh(MeshConfig(data=4, model=2))
    trainer = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=mesh)
    state = trainer.init_state(batch)
    # at least one kernel is actually sharded over 'model'
    sharded = [
        p
        for path, p in jax.tree_util.tree_leaves_with_path(state.params)
        if "model" in str(getattr(p.sharding, "spec", ""))
    ]
    assert sharded, "expected some model-axis-sharded parameters"
    state, terms = trainer._train_step(
        state, trainer._device_batch(batch), jnp.float32(1e-3)
    )
    assert np.isfinite(float(terms["loss"]))


def test_graft_entry_dryrun():
    import importlib.util, pathlib

    spec = importlib.util.spec_from_file_location(
        "graft_entry", pathlib.Path(__file__).parent.parent / "__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


def test_dcn_mesh_axes_and_batch_spec():
    mesh = make_mesh(MeshConfig(dcn=2, data=2, model=2))
    assert dict(mesh.shape) == {"dcn": 2, "data": 2, "model": 2}
    (y, x) = shard_batch(mesh, _batch())
    assert len(y.sharding.device_set) == 8
    assert y.sharding.spec[0] == ("dcn", "data")


def test_dcn_train_step_matches_single_device():
    """Hierarchical DP over (dcn, data) must be pure layout — same loss
    and params as the unsharded step. (model=1 here: Adam turns any
    TP-reduction float noise into +-lr sign flips on near-zero-gradient
    coordinates, so the TP axis is covered by the runs-and-finite test
    above and the dcn equality check stays exact.)"""
    batch = _batch(bs=8, ps=16, seed=2)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    mesh = make_mesh(MeshConfig(dcn=2, data=4, model=1))
    t_sharded = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=mesh)
    s1 = t_sharded.init_state(batch)
    s1, terms1 = t_sharded._train_step(
        s1, t_sharded._device_batch(batch), jnp.float32(1e-3)
    )

    t_single = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=None)
    s2 = t_single.init_state(batch)
    s2, terms2 = t_single._train_step(
        s2, t_single._device_batch(batch), jnp.float32(1e-3)
    )
    np.testing.assert_allclose(
        float(terms1["loss"]), float(terms2["loss"]), rtol=2e-4
    )
    # hierarchical (dcn then data) all-reduce changes summation order;
    # tolerance covers the float noise only
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3, atol=5e-5)


def test_shard_batch_multihost_branch(monkeypatch):
    """The multi-host path (make_array_from_process_local_data) — mocked
    process_count, single process supplies the full global batch, result
    must equal the single-host device_put placement."""
    mesh = make_mesh(MeshConfig(data=8, model=1))
    batch = _batch(bs=8, ps=16, seed=3)
    single = shard_batch(mesh, batch)

    import simple_vae_rs_tpu.parallel.mesh as pm

    monkeypatch.setattr(pm.jax, "process_count", lambda: 2)
    multi = shard_batch(mesh, batch)
    for a, b in zip(single, multi):
        assert b.sharding.spec == a.sharding.spec
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_meshed_loss_rows_run_under_shard_map():
    """The fused loss row reductions route through shard_map on a >1-chip
    mesh (per-shard kernels, batch-sharded output) and fall back cleanly
    when the batch does not divide the shard count — numerics identical
    to the plain row ops either way."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from simple_vae_rs_tpu.ops import pallas_elbo as L

    mesh = make_mesh(MeshConfig(data=8, model=1))
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)
    b = jnp.asarray(rng.standard_normal((16, 32)), jnp.float32)

    plain = L.sq_rows(a, b)
    sharded = jax.jit(lambda x, y: L._rows_op(L.sq_rows, mesh, x, y))(
        jax.device_put(a, NamedSharding(mesh, P("data"))),
        jax.device_put(b, NamedSharding(mesh, P("data"))),
    )
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(plain),
                               rtol=1e-6)
    # 8 shards over 16 rows: result really is batch-sharded
    assert "data" in str(sharded.sharding.spec)

    # ragged batch (not divisible by 8): falls back, same values
    ragged = L._rows_op(L.sq_rows, mesh, a[:10], b[:10])
    np.testing.assert_allclose(np.asarray(ragged), np.asarray(plain[:10]),
                               rtol=1e-6)

    # gradients flow through the shard_mapped rows
    g = jax.grad(lambda x: jnp.sum(L._rows_op(L.sq_rows, mesh, x, b)))(a)
    np.testing.assert_allclose(np.asarray(g), np.asarray(2.0 * (a - b)),
                               rtol=1e-5)


def test_zero1_moments_shard_and_step_matches_replicated():
    """TrainConfig(zero1=True): large Adam moments carry a data-axis
    sharding, the step runs under GSPMD, and two steps produce the same
    params as the fully replicated layout (ZeRO-1 is a layout, not a
    different optimizer)."""
    from simple_vae_rs_tpu.parallel import mesh as mesh_mod

    batch = _batch(bs=8, ps=16)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    mesh = make_mesh(MeshConfig(data=8, model=1))

    # the tiny test model has no >=1M-element moments; lower the bar so
    # its conv-kernel moments exercise the sharding rule
    old_min = mesh_mod._ZERO1_MIN_ELEMS
    mesh_mod._ZERO1_MIN_ELEMS = 1 << 12
    try:
        t_zero = Trainer(
            model, TrainConfig(learning_rate=1e-3, zero1=True), mesh=mesh
        )
        sz = t_zero.init_state(batch)
    finally:
        mesh_mod._ZERO1_MIN_ELEMS = old_min
    big_specs = [
        leaf.sharding.spec
        for leaf in jax.tree.leaves(sz.opt_state)
        if hasattr(leaf, "ndim") and leaf.ndim > 0 and leaf.size >= (1 << 12)
    ]
    assert big_specs, "test model must have >=4k-element moment tensors"
    assert all("data" in [ax for ax in spec if ax] for spec in big_specs), (
        "large moments must shard over the data axis"
    )

    t_rep = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=mesh)
    sr = t_rep.init_state(batch)
    for _ in range(2):
        sz, terms_z = t_zero._train_step(
            sz, t_zero._device_batch(batch), jnp.float32(1e-3)
        )
        sr, terms_r = t_rep._train_step(
            sr, t_rep._device_batch(batch), jnp.float32(1e-3)
        )
    np.testing.assert_allclose(
        float(terms_z["loss"]), float(terms_r["loss"]), rtol=1e-5
    )
    # f32 reduction-order differences from the resharded update are
    # expected at the 1e-5 level (same tolerance class as the DP test)
    for a, b in zip(jax.tree.leaves(sz.params), jax.tree.leaves(sr.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-3,
                                   atol=2e-5)


def test_zero1_state_checkpoint_roundtrip(tmp_path):
    """Save a ZeRO-sharded state, restore into a fresh trainer, re-apply
    the mesh layout: values exact, moment shardings back, step runs."""
    from simple_vae_rs_tpu.parallel import mesh as mesh_mod
    from simple_vae_rs_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    batch = _batch(bs=8, ps=16)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    mesh = make_mesh(MeshConfig(data=8, model=1))
    old_min = mesh_mod._ZERO1_MIN_ELEMS
    mesh_mod._ZERO1_MIN_ELEMS = 1 << 12
    try:
        t1 = Trainer(model, TrainConfig(learning_rate=1e-3, zero1=True), mesh=mesh)
        s1 = t1.init_state(batch)
        s1, _ = t1._train_step(s1, t1._device_batch(batch), jnp.float32(1e-3))
        path = str(tmp_path / "ck")
        save_checkpoint(path, s1, epoch=1)

        t2 = Trainer(model, TrainConfig(learning_rate=1e-3, zero1=True), mesh=mesh)
        s2 = t2.init_state(batch)
        s2, meta = load_checkpoint(path, s2)
        s2 = shard_state(mesh, s2, zero1=True)
    finally:
        mesh_mod._ZERO1_MIN_ELEMS = old_min
    assert meta["epoch"] == 1
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    shardings = {
        str(leaf.sharding.spec)
        for leaf in jax.tree.leaves(s2.opt_state)
        if hasattr(leaf, "ndim") and leaf.ndim > 0 and leaf.size >= (1 << 12)
    }
    assert any("data" in s for s in shardings), shardings
    t2.state = s2
    _, terms = t2._train_step(s2, t2._device_batch(batch), jnp.float32(1e-3))
    assert np.isfinite(float(terms["loss"]))


def test_dp_train_step_with_remat_matches_single_device():
    """remat (jax.checkpoint) composes with the shard_mapped loss rows:
    meshed + remat step equals the unsharded plain step."""
    batch = _batch(bs=8, ps=16, seed=4)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    mesh = make_mesh(MeshConfig(data=8, model=1))
    t_sharded = Trainer(
        model, TrainConfig(learning_rate=1e-3, remat=True), mesh=mesh
    )
    s1 = t_sharded.init_state(batch)
    s1, terms1 = t_sharded._train_step(
        s1, t_sharded._device_batch(batch), jnp.float32(1e-3)
    )

    t_single = Trainer(model, TrainConfig(learning_rate=1e-3), mesh=None)
    s2 = t_single.init_state(batch)
    s2, terms2 = t_single._train_step(
        s2, t_single._device_batch(batch), jnp.float32(1e-3)
    )
    np.testing.assert_allclose(
        float(terms1["loss"]), float(terms2["loss"]), rtol=2e-4
    )


def test_meshed_eval_steps_trace_with_pallas_conv_off():
    """--pallas_conv on a >1-chip mesh: the engine's eval-mode steps
    (val/metrics/images) must trace with the conv routing forced to XLA —
    GSPMD cannot partition a pallas_call — while single-device trainers
    keep the fused routing, and the process switch survives the calls."""
    from simple_vae_rs_tpu.ops import pallas_conv as pc

    batch = _batch(bs=8, ps=16, seed=7)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    seen = []
    orig = pc.is_enabled

    def spy():
        v = orig()
        seen.append(v)
        return v

    pc.enable(True)
    pc.is_enabled = spy
    try:
        mesh = make_mesh(MeshConfig(data=8, model=1))
        t = Trainer(model, TrainConfig(), mesh=mesh)
        s = t.init_state(batch)
        t.state = s
        dev = t._device_batch(batch)
        seen.clear()  # init traces are train-mode; only eval traces matter
        terms = t._val_step(s, dev)
        assert np.isfinite(float(terms["loss"]))
        sums = t._eval_metrics_step(s, dev)
        assert np.isfinite(float(sums["ssim_sr"]))
        imgs = t._eval_images_step(s, dev)
        assert "Images/SR_Output" in imgs
        # every dispatch gate consulted during those meshed eval traces
        # saw the routing OFF
        assert seen and not any(seen)
        assert pc.is_enabled()  # scope restored after the calls

        seen.clear()
        t1 = Trainer(model, TrainConfig(), mesh=None)
        s1 = t1.init_state(batch)
        seen.clear()
        t1._val_step(s1, t1._device_batch(batch))
        # single-device eval keeps the fused routing available
        assert seen and all(seen)
    finally:
        pc.is_enabled = orig
        pc.enable(False)


def test_accumulation_under_data_mesh_matches_single_device():
    """accum_steps=2 composes with DP sharding: the microbatch scan runs on
    mesh-sharded batches and matches the single-device accumulated step."""
    batch = _batch(bs=8, ps=16, seed=4)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))

    mesh = make_mesh(MeshConfig(data=4, model=1))
    t_m = Trainer(model, TrainConfig(learning_rate=1e-3, accum_steps=2),
                  mesh=mesh)
    s1 = t_m.init_state(batch)
    s1, terms1 = t_m._train_step(s1, t_m._device_batch(batch), jnp.float32(1e-3))

    t_s = Trainer(model, TrainConfig(learning_rate=1e-3, accum_steps=2),
                  mesh=None)
    s2 = t_s.init_state(batch)
    s2, terms2 = t_s._train_step(s2, t_s._device_batch(batch), jnp.float32(1e-3))

    np.testing.assert_allclose(
        float(terms1["loss"]), float(terms2["loss"]), rtol=2e-4
    )
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-5)


def test_fused_multi_step_matches_single_device():
    """scan_steps dispatch fusion over a DP mesh: two full optimizer steps
    in ONE jit call, batches stacked on a replicated leading axis and
    sharded over the batch axes, must match the same fused dispatch on a
    single device."""
    b0, b1 = _batch(bs=8, ps=16, seed=2), _batch(bs=8, ps=16, seed=3)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    lr = jnp.float32(1e-3)

    mesh = make_mesh(MeshConfig(data=8, model=1))
    t_sharded = Trainer(model, TrainConfig(learning_rate=1e-3, scan_steps=2),
                        mesh=mesh)
    s1 = t_sharded.init_state(b0)
    s1, terms1 = t_sharded._train_multi_step(
        s1, t_sharded._device_batch_stack([b0, b1]), lr
    )

    t_single = Trainer(model, TrainConfig(learning_rate=1e-3, scan_steps=2),
                       mesh=None)
    s2 = t_single.init_state(b0)
    s2, terms2 = t_single._train_multi_step(
        s2, t_single._device_batch_stack([b0, b1]), lr
    )
    assert int(s1.step) == int(s2.step) == 2
    np.testing.assert_allclose(
        float(terms1["loss"]), float(terms2["loss"]), rtol=2e-4
    )
    # Two chained updates compound the all-reduce float noise, and Adam
    # turns it into +-lr-scale sign flips on near-zero-gradient
    # coordinates (see the dcn test note) — so instead of a blanket
    # tolerance, bound the failure mode: every element within ~2 Adam
    # steps, and at most a vanishing fraction outside the float-noise
    # tolerance.
    bad = total = 0
    for a, b in zip(jax.tree.leaves(s1.params), jax.tree.leaves(s2.params)):
        a, b = np.asarray(a), np.asarray(b)
        d = np.abs(a - b)
        assert d.max() < 2.5e-3, f"param diff {d.max()} exceeds ~2 lr"
        bad += int((d > 1e-4 + 2e-2 * np.abs(b)).sum())
        total += d.size
    assert bad / total < 1e-4, f"{bad}/{total} params off beyond Adam noise"
