"""Siamese U-Net change segmentor (parity: /root/reference/Module.py:93-140).

Shared-weight encoder applied to both temporal images; per-level feature
concatenation doubles the decoder input channels; decoder with skips; 1-channel
sigmoid change-density output in [0, 1].

TPU-first: the two siamese branches are stacked on the batch axis and run
through the encoder **once** — a free 2x MXU batching win over the reference's
two sequential encoder passes (SURVEY.md section 3.5). In train mode this makes
BatchNorm statistics joint over both temporal images; ``siamese_stats='split'``
reproduces the reference's separate per-branch batch statistics (the two modes
are identical in eval mode, which uses running stats).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
from flax import linen as nn

from .layers import DoubleConv, Down, OutConv, Up


class Segmentor(nn.Module):
    n_channels: int
    n_outchannels: int = 1
    bilinear: bool = False
    siamese_stats: str = "joint"  # 'joint' (stacked, fast) | 'split' (reference)
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x1, x2, train: bool = True):
        factor = 2 if self.bilinear else 1
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)
        inc = DoubleConv(64, **kw)
        down1 = Down(128, **kw)
        down2 = Down(256, **kw)
        down3 = Down(512, **kw)
        down4 = Down(1024 // factor, **kw)

        if self.siamese_stats == "joint":
            n = x1.shape[0]
            x = jnp.concatenate([x1, x2], axis=0)
            f1 = inc(x, train)
            f2 = down1(f1, train)
            f3 = down2(f2, train)
            f4 = down3(f3, train)
            f5 = down4(f4, train)
            # split each stacked level back into the two branches; the
            # per-level channel concat (torch.cat at Module.py:116-132) is
            # IMPLICIT — skips stay tuples and the decoder's first conv
            # splits over them (layers._SplitConcatConv), so the wide
            # concatenated tensors are never materialized
            pair = lambda f: (f[:n], f[n:])
            x_1, x_2, x_3, x_4 = pair(f1), pair(f2), pair(f3), pair(f4)
            x_5 = jnp.concatenate([f5[:n], f5[n:]], axis=-1)  # feeds upsample
        else:
            a1 = inc(x1, train)
            b1 = inc(x2, train)
            a2, b2 = down1(a1, train), down1(b1, train)
            a3, b3 = down2(a2, train), down2(b2, train)
            a4, b4 = down3(a3, train), down3(b3, train)
            a5, b5 = down4(a4, train), down4(b4, train)
            x_1, x_2, x_3, x_4 = (a1, b1), (a2, b2), (a3, b3), (a4, b4)
            x_5 = jnp.concatenate([a5, b5], axis=-1)

        x = Up(1024 // factor, self.bilinear, **kw)(x_5, x_4, train)
        x = Up(512 // factor, self.bilinear, **kw)(x, x_3, train)
        x = Up(256 // factor, self.bilinear, **kw)(x, x_2, train)
        x = Up(128, self.bilinear, **kw)(x, x_1, train)
        return OutConv(self.n_outchannels, dtype=self.dtype)(x)
