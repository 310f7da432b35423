"""Pallas TPU kernels for the framework's fusion-bound hot ops.

The MXU work (convolutions) stays with XLA — it already schedules those well.
These kernels target the chains XLA fuses poorly: the SSIM window pass
(ten depthwise blurs + elementwise maps per level, fused_ssim.py) runs as one
VMEM-resident program per (image, channel).

Every kernel has an XLA-composite fallback: pallas is used on TPU when block
shapes fit VMEM, interpret mode covers CPU tests, and gradients fall back to
the composite implementation via custom_vjp.

Evaluated and declined (documented so later rounds don't re-litigate):
  * fused masked-L1/MSE + num_wnc rescale reduction — the masked images must
    be materialized anyway (MS-SSIM consumes them), so the kernel would only
    save reduction launches XLA already fuses; measured contribution to the
    joint step is noise-level.
  * fused threshold + interior-mask + confusion update — a (2, N)x(N, 2)
    einsum over one batch; MXU handles it in microseconds.
  * convolutions — XLA's scheduler beats hand-written pallas convs for these
    shapes; the win came from dtype (bf16) and layout (matmul upsample,
    space-to-depth for k>=7 narrow kernels), not kernel authorship. The
    attempt is preserved in conv3x3.py with measurements: Mosaic's DMA
    alignment forces 64->128 channel padding, doubling the contraction and
    losing to XLA (5.3 vs 2.7 ms at the trunk shape)."""

from .fused_ssim import ssim_level_pallas, use_pallas_ssim

__all__ = ["ssim_level_pallas", "use_pallas_ssim"]
