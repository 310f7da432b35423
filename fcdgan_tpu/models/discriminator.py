"""Siamese feature-difference discriminator (parity: /root/reference/Module.py:192-223).

Shared conv trunk (4x stride-2 conv + [BN] + LeakyReLU 0.2, 64->512) applied to
both masked images; classifier = global average pool -> Conv1x1(1024) ->
LeakyReLU -> Conv1x1(1) on the **feature difference**; sigmoid scalar per
sample.

TPU-first: like the segmentor, the two trunk passes are stacked on the batch
axis and run once (``siamese_stats='joint'``); ``'split'`` reproduces the
reference's separate BN batch statistics.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import BatchNorm, TorchConv, bn_fold_enabled


class Discriminator(nn.Module):
    n_channels: int = 3
    siamese_stats: str = "joint"
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x, y, train: bool = True):
        def trunk():
            layers = []

            def block(feat, bn):
                def fn(h, train):
                    fold = bn and bn_fold_enabled()
                    h = TorchConv(feat, (3, 3), strides=2, padding=1,
                                  dtype=self.dtype, defer_bias=fold)(h)
                    if bn:
                        h, fb = h if fold else (h, None)
                        h = BatchNorm(self.axis_name, self.dtype)(h, train, fb)
                    return nn.leaky_relu(h, 0.2)

                return fn

            return [block(64, False), block(128, True), block(256, True), block(512, True)]

        blocks = trunk()

        if self.siamese_stats == "joint":
            n = x.shape[0]
            h = jnp.concatenate([x, y], axis=0)
            for b in blocks:
                h = b(h, train)
            fx, fy = h[:n], h[n:]
        else:
            fx, fy = x, y
            for b in blocks:
                fx = b(fx, train)
            for b in blocks:
                fy = b(fy, train)

        d = jnp.mean(fx - fy, axis=(1, 2), keepdims=True)  # AdaptiveAvgPool2d(1)
        d = TorchConv(1024, (1, 1), padding=0, dtype=self.dtype)(d)
        d = nn.leaky_relu(d, 0.2)
        d = TorchConv(1, (1, 1), padding=0, dtype=self.dtype)(d)
        return nn.sigmoid(d.reshape(x.shape[0]))
