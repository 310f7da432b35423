"""Convert torchvision VGG16 feature weights to the fcdgan-tpu ``.npz`` layout.

Run on a machine with torchvision + internet access:

    python -m fcdgan_tpu.tools.convert_vgg --out fcdgan_tpu/assets/vgg16_features.npz

Then the perception loss (ops/losses.py) uses exact torchvision-pretrained
features (parity with /root/reference/Loss.py:25), instead of the deterministic
random fallback. Kernels are transposed OIHW -> HWIO for NHWC convolutions.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def convert(out_path: str) -> None:
    from torchvision.models import vgg16  # requires torchvision

    try:
        from torchvision.models import VGG16_Weights

        net = vgg16(weights=VGG16_Weights.IMAGENET1K_V1).features.eval()
    except ImportError:  # older torchvision
        net = vgg16(pretrained=True).features.eval()

    params = {}
    li = 0
    for layer in net:
        if layer.__class__.__name__ == "Conv2d":
            k = layer.weight.detach().numpy()  # (O, I, KH, KW)
            params[f"conv{li}_kernel"] = np.transpose(k, (2, 3, 1, 0))  # HWIO
            params[f"conv{li}_bias"] = layer.bias.detach().numpy()
            li += 1
    assert li == 13, f"expected 13 conv layers, got {li}"
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **params)
    print(f"wrote {li} conv layers to {out_path}")


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "--out",
        default=os.path.join(os.path.dirname(__file__), "..", "assets", "vgg16_features.npz"),
    )
    args = ap.parse_args()
    convert(args.out)


if __name__ == "__main__":
    main()
