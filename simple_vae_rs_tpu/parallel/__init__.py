from simple_vae_rs_tpu.parallel.mesh import (
    make_mesh,
    param_shardings,
    replicate,
    shard_batch,
)

__all__ = ["make_mesh", "replicate", "shard_batch", "param_shardings"]
