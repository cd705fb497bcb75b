"""Task/report module: chunked sampling, error statistics, run_task paths."""

import numpy as np
import jax
import jax.numpy as jnp

from simple_vae_rs_tpu.config import CondSRVAEConfig, VAEConfig
from simple_vae_rs_tpu.models import VAE, CondSRVAE
from simple_vae_rs_tpu.tasks import (
    error_statistics,
    run_task,
    sample_chunked,
    uncertainty_maps,
)


class ArrayLoader:
    def __init__(self, batches):
        self.batches = batches

    def __iter__(self):
        return iter(self.batches)

    def __len__(self):
        return len(self.batches)


def _sr_batches(bs=3, ps=16, seed=0):
    rng = np.random.default_rng(seed)
    return [
        (
            rng.random((bs, ps // 2, ps // 2, 4), dtype=np.float32),
            rng.random((bs, ps, ps, 4), dtype=np.float32),
        )
    ]


def _init(model, *args):
    return model.init({"params": jax.random.PRNGKey(0)}, *args, train=False)


def test_error_statistics_shapes_and_values():
    rng = np.random.default_rng(1)
    draws = jnp.array(rng.random((6, 8, 8, 4)).astype(np.float32))
    target = jnp.array(rng.random((1, 8, 8, 4)).astype(np.float32))
    stats = jax.device_get(error_statistics(draws, target))
    assert stats["mean"].shape == (8, 8, 4)
    assert stats["std"].shape == (8, 8)
    assert stats["mae"].shape == (8, 8)
    want_mmse = np.mean((np.asarray(draws) - np.asarray(target)) ** 2)
    np.testing.assert_allclose(stats["mmse"], want_mmse, rtol=1e-5)


def test_sample_chunked_vae_ragged_chunks():
    cfg = VAEConfig(cr=2.0, patch_size=16)
    model = VAE(cfg)
    y = jnp.zeros((1, 16, 16, 4))
    variables = _init(model, y, jax.random.PRNGKey(1))
    draws = sample_chunked(model, variables, y, jax.random.PRNGKey(2),
                           samples=7, chunk=3)
    assert draws.shape == (7, 16, 16, 4)


def test_run_task_vae_uses_lr_stream(tmp_path):
    """Regression: the plain VAE reconstructs batch[0] (LR) — feeding it the
    HR stream crashed the decode reshape (caught on live TPU run)."""
    batches = _sr_batches(ps=32)  # VAE patch 16 = LR size
    model = VAE(VAEConfig(cr=2.0, patch_size=16))
    variables = _init(model, jnp.zeros((1, 16, 16, 4)), jax.random.PRNGKey(1))
    out = run_task(model, variables, ArrayLoader(batches), "job", 2.0,
                   samples=4, chunk=2, results_root=str(tmp_path))
    assert np.isfinite(out["mmse"])


def test_run_task_cond(tmp_path):
    batches = _sr_batches(ps=16)
    model = CondSRVAE(CondSRVAEConfig(cr=2.0, patch_size=16))
    variables = _init(
        model, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
    )
    out = run_task(model, variables, ArrayLoader(batches), "job", 2.0,
                   samples=4, chunk=4, results_root=str(tmp_path))
    assert np.isfinite(out["mmse"])
    import os

    d = out["results_dir"]
    assert os.path.exists(os.path.join(d, "error_mean_std_maps.png"))
    assert os.path.exists(os.path.join(d, "generated_image.png"))


def test_uncertainty_maps_n32():
    """BASELINE config 5: N=32 posterior draws -> per-pixel variance maps."""
    cfg = CondSRVAEConfig(cr=2.0, patch_size=16)
    model = CondSRVAE(cfg)
    variables = _init(
        model, jnp.zeros((1, 16, 16, 4)), jnp.zeros((1, 8, 8, 4)),
        jax.random.PRNGKey(1),
    )
    y = jnp.asarray(np.random.default_rng(2).random((1, 8, 8, 4), ), dtype=jnp.float32)
    maps = uncertainty_maps(model, variables, y, jax.random.PRNGKey(3),
                            samples=32, chunk=8)
    assert maps["variance"].shape == (16, 16, 4)
    assert float(jnp.min(maps["variance"])) >= 0.0
    assert float(jnp.max(maps["std"])) > 0.0


def test_auto_chunk_budget():
    """HBM-aware chunk default: one dispatch for the canonical 64px
    1000-draw task, budget-capped for larger patches, never above
    ``samples`` or below 1."""
    from simple_vae_rs_tpu.tasks import auto_chunk

    assert auto_chunk(1000, 64) == 1000
    assert auto_chunk(1000, 128) == 256
    assert auto_chunk(8, 64) == 8
    assert auto_chunk(10**6, 4096) >= 1
