"""fcdgan-tpu: TPU-native fully convolutional change detection GAN framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of the FCD-GAN
PyTorch reference (Cwuwhu/FCD-GAN-pytorch, TPAMI 2023): unsupervised (USSS),
weakly supervised (WSSS) and regional supervised (RSSS) change detection over
bi-temporal remote-sensing rasters.

Layer map (mirrors SURVEY.md section 7):
  data/      raster codecs (GeoTIFF/ENVI), tile grid, datasets, prefetch pipeline
  models/    flax NHWC modules: siamese U-Net segmentor, SRGAN generator, discriminator
  ops/       losses (masked L1/MSE, perception, MS-SSIM, region), pallas kernels
  parallel/  device mesh + sharding rules (data-parallel over ICI)
  train/     schedules, optimizers, jitted train steps per mode, epoch loops
  eval/      confusion-matrix evaluator (host + on-device), change-map colorizers
  io/        orbax checkpoints, Para txt records, tensorboard, progress lines
  tools/     offline dataset preparation (WHU building slicer, OSCD region labels)
"""

__version__ = "0.1.0"
