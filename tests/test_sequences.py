"""Auto-planned down/upsample sequences (working redesign of the reference's
broken dead-code planners, models/layers.py:25-214)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simple_vae_rs_tpu.ops.sequences import (
    DownsampleSequence,
    UpsampleSequence,
    plan_downsample,
    plan_upsample,
)


def test_plan_downsample_sizes():
    steps, schedule, out = plan_downsample((32, 32, 4), 2.0, None)
    assert steps >= 1
    assert schedule[-1] * (32 >> steps) ** 2 == out
    # compression honored to channel granularity on the final grid
    assert abs(out - 32 * 32 * 4 / 2.0) < (32 >> steps) ** 2


def test_down_up_roundtrip_shapes():
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 32, 4))
    down = DownsampleSequence(in_shape=(32, 32, 4), compression_ratio=2.0)
    v = down.init(jax.random.PRNGKey(1), x, train=False)
    z = down.apply(v, x, train=False)
    assert z.ndim == 2 and z.shape[0] == 2
    assert z.shape[1] == down.out_size

    up = UpsampleSequence(in_size=z.shape[1], out_shape=(32, 32, 4))
    v2 = up.init(jax.random.PRNGKey(2), z, train=False)
    y = up.apply(v2, z, train=False)
    assert y.shape == (2, 32, 32, 4)
    assert float(jnp.min(y)) >= 0.0 and float(jnp.max(y)) <= 1.0


def test_upsample_works_for_non_1x1_grids():
    """The reference's upsample_sequence only accepts a 1x1 input grid
    (layers.py:136-138); ours must handle real grids."""
    for in_size, out_shape in [(512, (16, 16, 4)), (1024, (32, 32, 4)), (48, (8, 8, 3))]:
        steps, in_ch, schedule = plan_upsample(in_size, out_shape, None)
        gh = out_shape[0] >> steps
        assert in_ch * gh * gh == in_size
        up = UpsampleSequence(in_size=in_size, out_shape=out_shape)
        z = jnp.zeros((1, in_size))
        y, _ = up.init_with_output(jax.random.PRNGKey(0), z, train=False)
        assert y.shape == (1,) + out_shape


def test_downsample_with_attention():
    x = jnp.zeros((1, 16, 16, 4))
    down = DownsampleSequence(
        in_shape=(16, 16, 4), compression_ratio=4.0, with_attention=True
    )
    v = down.init(jax.random.PRNGKey(0), x, train=False)
    names = str(jax.tree_util.tree_structure(v["params"]))
    assert "attn0" in names
    z = down.apply(v, x, train=False)
    assert z.shape[0] == 1


def test_upsample_accepts_prime_sizes_via_1x1_grid():
    steps, in_ch, _ = plan_upsample(7, (16, 16, 4), None)
    assert in_ch * (16 >> steps) ** 2 == 7  # falls back to the 1x1 grid


def test_upsample_rejects_impossible():
    with pytest.raises(ValueError):
        plan_upsample(5, (6, 6, 4), None)  # no grid of 6x6/3x3 divides 5
