"""Change-map color codings (CommonFunc.py:39-75 parity)."""

import numpy as np

from fcdgan_tpu.eval.changemap import write_changemap, write_changemap_gdal


def test_write_changemap_color():
    cm = np.array([[0, 1], [1, 0]])
    ref = np.array([[1, 0], [1, 0]])
    out = write_changemap(cm, ref, write_color=True)
    assert out.shape == (3, 2, 2)
    np.testing.assert_array_equal(out[:, 0, 0], [0, 0, 255])  # FN: blue
    np.testing.assert_array_equal(out[:, 0, 1], [255, 0, 0])  # FP: red
    np.testing.assert_array_equal(out[:, 1, 0], [255, 255, 255])  # TP: white
    np.testing.assert_array_equal(out[:, 1, 1], [0, 0, 0])  # TN: black


def test_write_changemap_grayscale():
    cm = np.array([[0, 1]])
    out = write_changemap(cm, np.zeros_like(cm), write_color=False)
    np.testing.assert_array_equal(out, [[0, 255]])


def test_write_changemap_gdal_codes():
    # gt coded {1,2}, pred coded {0,1} like USSS/RSSS
    cm = np.array([[[0, 1], [1, 0]]])
    ref = np.array([[[2, 1], [2, 1]]])
    out = write_changemap_gdal(cm, ref, write_color=True, ref_map=[1, 2], dt_map=[0, 1])
    np.testing.assert_array_equal(out[0], [[1, 2], [3, 0]])  # FN, FP / TP, TN


def test_write_changemap_gdal_binary():
    cm = np.array([[[0, 1]]])
    out = write_changemap_gdal(cm, np.zeros_like(cm), write_color=False)
    np.testing.assert_array_equal(out[0], [[0, 1]])
