"""Pallas TPU kernels for the framework's fusion-bound hot ops.

The MXU work (convolutions) stays with XLA — it already schedules those well.
These kernels target the chains XLA fuses poorly: the SSIM window pass
(ten depthwise blurs + elementwise maps per level, fused_ssim.py) runs as one
VMEM-resident program per (image, channel).

Every kernel has an XLA-composite fallback: pallas is used on TPU when block
shapes fit VMEM, interpret mode covers CPU tests, and gradients fall back to
the composite implementation via custom_vjp."""

from .fused_ssim import ssim_level_pallas, use_pallas_ssim

__all__ = ["ssim_level_pallas", "use_pallas_ssim"]
