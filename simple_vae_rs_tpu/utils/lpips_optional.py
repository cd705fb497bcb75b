"""Optional LPIPS perceptual metric.

The reference computes LPIPS(alex) per image on the host
(``models/base.py:37``, ``models/vae.py:170-172``) with BGR-reordered
channels ``[2,1,0]``. LPIPS is a *learned* metric: it needs the pretrained
AlexNet weights that ship with the ``lpips`` package — unavailable in
zero-egress environments. This module exposes the same computation when the
package (and torch) are importable and degrades to ``None`` otherwise; the
engine logs LPIPS metrics only when available.
"""

from __future__ import annotations

from typing import Optional

import numpy as np

_lpips_model = None
_checked = False


def lpips_available() -> bool:
    global _checked, _lpips_model
    if not _checked:
        _checked = True
        try:
            import lpips  # noqa: F401
            import torch  # noqa: F401

            _lpips_model = lpips.LPIPS(net="alex")
            _lpips_model.eval()
        except Exception:
            _lpips_model = None
    return _lpips_model is not None


def lpips_batch(a: np.ndarray, b: np.ndarray) -> Optional[np.ndarray]:
    """Per-image LPIPS for NHWC batches, BGR channel order as the reference.

    Returns None when the lpips package / weights are unavailable.
    """
    if not lpips_available():
        return None
    import torch

    def prep(x: np.ndarray) -> "torch.Tensor":
        x = np.asarray(x, dtype=np.float32)
        if x.shape[-1] >= 3:
            x = x[..., [2, 1, 0]]
        else:
            x = np.repeat(x[..., :1], 3, axis=-1)
        return torch.tensor(x.transpose(0, 3, 1, 2))

    with torch.no_grad():
        out = _lpips_model(prep(a), prep(b))
    return out.reshape(-1).numpy()
