"""The one place the --backend flag turns into a JAX platform switch.

The deployments this framework targets bake a ``sitecustomize`` that
force-sets ``jax_platforms="axon,cpu"`` via ``jax.config.update`` at
interpreter start, so the ``JAX_PLATFORMS`` env var alone CANNOT switch
backends — only another ``config.update`` call can, and it must happen
before any device use (once a backend initializes the setting is
frozen). Every CLI entry point funnels its ``--backend`` flag through
:func:`apply_backend` so the semantics live in exactly one spot.
"""

from __future__ import annotations

__all__ = ["apply_backend"]


def apply_backend(name: str) -> None:
    """Switch the JAX platform (no-op on empty/None). Call before ANY
    device use — after the first dispatch the platform is frozen."""
    if name:
        import jax

        jax.config.update("jax_platforms", name)
