"""Minimal ``osgeo`` shim for running the PyTorch reference in this image.

The real GDAL is not installed here; this package exposes exactly the GDAL
API surface the reference's USSS path touches (gdal.Open, band reads, driver
Create + WriteArray with geo metadata — see /root/reference/data_utils.py:33,
104-105,190-213 and Demo_USSS.py:441-448), backed by fcdgan_tpu's own raster
codecs. Used ONLY by the head-to-head parity experiment
(experiments/parity_e2e/) — the framework itself never imports this.
"""
