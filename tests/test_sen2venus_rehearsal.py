"""Sen2Venus real-data path, rehearsed on a synthesized ARM-shaped tree.

Round-4 verdict item 5: the day the real tree appears it must be ONE
command away — so every piece it will use (codec-written int16 tile
pairs -> make_index --validate -> Sen2VenusDataset -> grid loader ->
a real train step -> the quality_parity sen2venus crop path) is
exercised here on tiles our own ``tiffio`` writes. The heavier CLI +
both-frameworks parity legs live in ``scripts/sen2venus_rehearsal.py``
(driven live; this test keeps the suite fast).
"""

import importlib.util
import os
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script(name):
    spec = importlib.util.spec_from_file_location(
        name, os.path.join(REPO, "scripts", f"{name}.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def arm_tree(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("s2v") / "ARM")
    reh = _load_script("sen2venus_rehearsal")
    reh.synthesize_tree(root, pairs=6, lr_size=32, seed=0)
    return root


def test_make_index_pairs_and_validates(arm_tree):
    mi = _load_script("make_index")
    pairs, dangling = mi.find_pairs(arm_tree)
    assert len(pairs) == 6 and not dangling
    for lr_rel, hr_rel in pairs:
        assert mi.validate_pair(arm_tree, lr_rel, hr_rel) == ""
    # the CLI writes the tab-separated index the reference format needs
    assert mi.main([arm_tree, "--validate"]) == 0
    index = os.path.join(arm_tree, "index.csv")
    with open(index) as fh:
        header = fh.readline().strip().split("\t")
    assert header == ["b2b3b4b8_10m", "b2b3b4b8_05m"]


def test_dataset_reads_int16_pairs(arm_tree):
    mi = _load_script("make_index")
    mi.main([arm_tree])
    from simple_vae_rs_tpu.data.datasets import Sen2VenusDataset

    ds = Sen2VenusDataset(root=arm_tree)
    assert len(ds) == 6
    lr, hr = ds[0]
    assert lr.shape == (32, 32, 4) and hr.shape == (64, 64, 4)
    assert lr.dtype == np.int16 and hr.dtype == np.int16
    assert 0 < int(hr.max()) <= 10000


def test_grid_loader_and_train_step(arm_tree):
    """The exact invocation the real tree will get: init_dataloader grid
    mode -> normalized static-shape batches -> one jitted train step."""
    mi = _load_script("make_index")
    mi.main([arm_tree])
    import jax.numpy as jnp

    from simple_vae_rs_tpu.config import CondSRVAEConfig, TrainConfig
    from simple_vae_rs_tpu.data.loader import init_dataloader
    from simple_vae_rs_tpu.models import CondSRVAE
    from simple_vae_rs_tpu.train.engine import Trainer

    train_loader, val_loader = init_dataloader(
        "Sen2Venus", batch_size=2, patch_size=16, crop="grid",
        data_root=arm_tree,
    )
    batch = next(iter(train_loader))
    y, x = batch[0], batch[1]
    # grid mode: effective batch = tiles x patches/tile (2 x (64/16)^2)
    assert y.shape == (32, 8, 8, 4) and x.shape == (32, 16, 16, 4)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0

    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    trainer = Trainer(model, TrainConfig(epochs=1, batch_size=2))
    trainer.init_state(batch)
    state, terms = trainer._train_step(trainer.state, batch, jnp.float32(1e-4))
    assert np.isfinite(float(terms["loss"]))


def test_quality_parity_s2v_crop_path(arm_tree):
    """quality_parity --dataset sen2venus builds aligned grid crops from
    the tree (both frameworks consume these same arrays)."""
    mi = _load_script("make_index")
    mi.main([arm_tree])
    qp = _load_script("quality_parity")
    cfg = dict(qp.CFG)
    cfg.update(dataset="sen2venus", data_root=arm_tree, patch_size=32)
    (lr_tr, hr_tr), (lr_va, hr_va) = qp.build_dataset(cfg)
    # 6 tiles x (64/32)^2 = 24 crops, sequential 80/20
    assert len(lr_tr) + len(lr_va) == 24
    assert lr_tr.shape[1:] == (16, 16, 4)
    assert hr_tr.shape[1:] == (32, 32, 4)
    for a in (lr_tr, hr_va):
        assert a.dtype == np.float32
        assert float(a.min()) >= 0.0 and float(a.max()) <= 1.0
