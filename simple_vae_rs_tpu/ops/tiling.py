"""Back-compat shim: the tiling logic moved to ``simple_vae_rs_tpu.tiling``.

The move keeps the stdlib HTTP client importable without the compute
stack — ``ops/__init__`` pulls the jax-backed op modules, while the
window grid / feather stitch / ``TileEndpoints`` mixin are pure numpy
and now shared by ``serve.SuperResolver`` and ``client.RemoteResolver``.
"""

from simple_vae_rs_tpu.tiling import (  # noqa: F401
    TileEndpoints,
    feather_profile,
    grid_starts,
    stitch,
    subseed,
)

__all__ = ["grid_starts", "feather_profile", "stitch", "subseed",
           "TileEndpoints"]
