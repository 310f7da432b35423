"""SRGAN-style image translator x -> y_hat (parity: /root/reference/Module.py:142-172).

Conv9x9 + PReLU stem, five residual blocks, Conv3x3 + BN, long skip
``block8(stem + trunk)``, Conv9x9 back to ``n_channels``. No output
activation (the reference's tanh is commented out, Module.py:171) — output
lives in normalized-image space.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, PReLU, ResidualBlock, TorchConv


class Generator(nn.Module):
    n_channels: int
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, train: bool = True):
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        stem = TorchConv(64, (9, 9), padding=4, dtype=self.dtype)(x)
        stem = PReLU()(stem)
        h = stem
        for _ in range(5):
            h = ResidualBlock(64, **kw)(h, train)
        h = TorchConv(64, (3, 3), padding=1, dtype=self.dtype)(h)
        h = BatchNorm(self.axis_name, self.dtype)(h, train)
        return TorchConv(self.n_channels, (9, 9), padding=4, dtype=self.dtype)(stem + h)
