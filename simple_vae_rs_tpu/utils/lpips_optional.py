"""Optional LPIPS perceptual metric with two backends.

The reference computes LPIPS(alex) per image on the host
(``models/base.py:37``, ``models/vae.py:170-172``) with BGR-reordered
channels ``[2,1,0]``. LPIPS is a *learned* metric: it needs pretrained
AlexNet + calibration weights. Backends, in preference order:

1. **JAX, on-device** (``ops/lpips.py``): weights from an ``.npz``
   (``SVRS_LPIPS_WEIGHTS`` / ``~/.cache/svrs_lpips_alex.npz``, exported by
   ``scripts/export_lpips_weights.py`` on any machine with the ``lpips``
   package).
2. **torch ``lpips`` package** on the host, exactly as the reference.

When neither is available the engine simply skips the LPIPS metrics
(zero-egress environments cannot fetch the weights).
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_backend = None  # None (unchecked) | "jax" | "torch" | "none"
_jax_params = None
_torch_model = None


def reset() -> None:
    """Forget the cached backend decision (tests; weights appearing)."""
    global _backend, _jax_params, _torch_model
    _backend = None
    _jax_params = None
    _torch_model = None


def _detect() -> str:
    global _jax_params, _torch_model
    from simple_vae_rs_tpu.ops import lpips as jl

    _jax_params = jl.load_weights()
    if _jax_params is not None:
        return "jax"
    try:
        import lpips  # noqa: F401
        import torch  # noqa: F401

        _torch_model = lpips.LPIPS(net="alex")
        _torch_model.eval()
        return "torch"
    except Exception:
        return "none"


def lpips_available() -> bool:
    global _backend
    if _backend is None:
        _backend = _detect()
    return _backend != "none"


def lpips_backend() -> str:
    lpips_available()
    return _backend


def lpips_batch(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Per-image LPIPS for NHWC batches, BGR channel order as the reference.

    Returns None when no backend is available.
    """
    if not lpips_available():
        return None
    from simple_vae_rs_tpu.ops import lpips as jl

    if min(np.shape(a)[1], np.shape(a)[2]) < jl.MIN_INPUT:
        return None  # below AlexNet's conv1 footprint; metric undefined
    if _backend == "jax":
        return np.asarray(jl.lpips(a, b, _jax_params))

    import torch

    def prep(x: np.ndarray) -> "torch.Tensor":
        x = np.asarray(x, dtype=np.float32)
        if x.shape[-1] >= 3:
            x = x[..., [2, 1, 0]]
        else:
            x = np.repeat(x[..., :1], 3, axis=-1)
        return torch.tensor(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        out = _torch_model(prep(a), prep(b))
    return out.reshape(-1).numpy()
