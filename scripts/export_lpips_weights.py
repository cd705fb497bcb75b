#!/usr/bin/env python
"""Export the ``lpips`` package's AlexNet weights to the npz this
framework's on-device LPIPS uses (``simple_vae_rs_tpu/ops/lpips.py``).

Run once on any machine that has ``pip install lpips`` (internet access),
then copy the npz to ``~/.cache/svrs_lpips_alex.npz`` (or point
``SVRS_LPIPS_WEIGHTS`` at it) on the training host.

Usage:
    python scripts/export_lpips_weights.py [out.npz]
"""

import sys

import numpy as np


def main() -> None:
    out = sys.argv[1] if len(sys.argv) > 1 else "svrs_lpips_alex.npz"
    import lpips

    model = lpips.LPIPS(net="alex")
    model.eval()

    arrays = {
        # scaling layer constants (lpips/__init__.py ScalingLayer)
        "shift": model.scaling_layer.shift.numpy().reshape(3),
        "scale": model.scaling_layer.scale.numpy().reshape(3),
    }
    # torchvision alexnet.features conv layers sit at slices 0,3,6,8,10;
    # the lpips wrapper re-groups them as net.slice1..slice5 whose last
    # module in each slice's Sequential is the conv of interest — walk the
    # raw feature list instead for robustness.
    convs = [m for m in model.net.parameters() if m.ndim == 4]
    biases = [m for m in model.net.parameters() if m.ndim == 1]
    assert len(convs) == 5 and len(biases) == 5, "unexpected alexnet layout"
    for i in range(5):
        arrays[f"conv{i}_w"] = convs[i].detach().numpy()
        arrays[f"conv{i}_b"] = biases[i].detach().numpy()
    for i in range(5):
        lin = getattr(model, f"lin{i}")
        arrays[f"lin{i}"] = lin.model[-1].weight.detach().numpy().reshape(-1)

    np.savez(out, **arrays)
    print(f"wrote {out}: " + ", ".join(sorted(arrays)))


if __name__ == "__main__":
    main()
