"""vgg16 builder loading fcdgan_tpu's perception weights into torch.

Standard VGG16 'D' configuration feature stack (31 sequential layers:
conv/relu pairs + 5 maxpools — the layout whose post-ReLU indices
[29, 22, 15, 8, 3] the reference taps at /root/reference/Loss.py:30).
Weights come from fcdgan_tpu.models.vgg.load_vgg16_params (HWIO) transposed
to torch OIHW, so both frameworks share one loss function bit-for-bit.
"""

import os
import sys

import numpy as np
import torch
import torch.nn as nn

_REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", "..", "..", "..", ".."))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

_CFG = [64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
        512, 512, 512, "M", 512, 512, 512, "M"]


class _VGG(nn.Module):
    def __init__(self, features):
        super().__init__()
        self.features = features


def _build_features():
    layers = []
    in_c = 3
    for c in _CFG:
        if c == "M":
            layers.append(nn.MaxPool2d(kernel_size=2, stride=2))
        else:
            layers.append(nn.Conv2d(in_c, c, kernel_size=3, padding=1))
            layers.append(nn.ReLU(inplace=True))
            in_c = c
    return nn.Sequential(*layers)


def vgg16(pretrained=False, **kwargs):
    from fcdgan_tpu.models.vgg import load_vgg16_params

    net = _VGG(_build_features())
    params = load_vgg16_params()
    li = 0
    with torch.no_grad():
        for layer in net.features:
            if isinstance(layer, nn.Conv2d):
                k = np.transpose(params[f"conv{li}_kernel"], (3, 2, 0, 1))  # HWIO->OIHW
                layer.weight.copy_(torch.from_numpy(np.ascontiguousarray(k)))
                layer.bias.copy_(torch.from_numpy(params[f"conv{li}_bias"]))
                li += 1
    assert li == 13
    return net
