"""Minimal ``torchvision`` shim for the head-to-head parity experiment.

No torchvision (and no egress to fetch pretrained VGG16 weights) exists in
this image, so ``models.vgg.vgg16(pretrained=True)`` here builds the standard
VGG16 feature stack in torch and loads THE SAME weights fcdgan_tpu's
perception loss uses (fcdgan_tpu.models.vgg.load_vgg16_params — the bundled
npz asset if present, else the fixed-seed random fallback). Both frameworks
therefore optimize the *identical* perception loss function, which makes the
parity run an apples-to-apples comparison of everything else
(VERDICT.md round-1 task 1/2).
"""

from . import models, transforms  # noqa: F401
