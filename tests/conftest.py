"""Test harness: force CPU backend with 8 virtual devices.

Mesh/sharding code is exercised without TPU hardware via XLA's host-platform
device-count override (the TPU-world "fake backend", SURVEY.md §4).

Note: this environment's sitecustomize registers a remote-TPU PJRT plugin in
every interpreter and sets ``jax_platforms="axon,cpu"`` via
``jax.config.update`` — which overrides the ``JAX_PLATFORMS`` env var. The
explicit ``config.update`` below wins because it runs after registration but
before any backend is initialized.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

# Persist CPU compiles across test runs (the big-model tests dominate the
# suite's wall clock on this 1-core machine).
from simple_vae_rs_tpu.utils.cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache(os.path.expanduser("~/.cache/svrs_jax_cache_cpu"))
