"""Overlap-padded tile grid over a large scene — pure index arithmetic.

Replicates the patch-grid semantics of the reference's GDAL dataset
(/root/reference/data_utils.py:57-63 grid construction, :91-97 item
decomposition, :154-176 ``slice_assign``), re-expressed as a standalone pure
structure so the same math drives host-side raster reads, on-device interior
masks, and stitched write-back.

Conventions (identical to the reference):
  * the scene of size (xsize, ysize) is covered by core tiles of stride
    ``patch - 2*pad`` along each axis; the last tile is truncated at the
    scene border,
  * each read window extends the core tile by ``pad`` on every side, clamped
    to the scene,
  * every tile is materialised into a fixed ``patch``-sized zero canvas at a
    write offset so that the core interior always lives at
    ``canvas[pad : pad + core_h, pad : pad + core_w]``,
  * item index decomposes as ``item_x = item // ny``, ``item_y = item % ny``.

All coordinates are (x, y, w, h) tuples in x-major/y-minor order like the
reference; array shapes are row-major (y, x) as usual.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import numpy as np

Slice4 = Tuple[int, int, int, int]  # (x, y, w, h)


def _starts_ends(size: int, patch: int, pad: int) -> Tuple[List[int], List[int]]:
    """Grid starts/ends along one axis (parity: data_utils.py:57-63)."""
    stride = patch - 2 * pad
    if stride <= 0:
        raise ValueError(f"patch {patch} must exceed 2*pad {2 * pad}")
    starts = list(range(0, size, stride))
    ends = [s + stride for s in starts if s + stride < size]
    ends.append(size)
    return starts, ends


@dataclasses.dataclass(frozen=True)
class TileGrid:
    """Fixed-shape overlap-padded tiling of a (xsize, ysize) scene."""

    xsize: int
    ysize: int
    patch_size: Tuple[int, int] = (200, 200)  # (px, py)
    overlap_padding: Tuple[int, int] = (10, 10)  # (pad_x, pad_y)

    def __post_init__(self):
        xs, xe = _starts_ends(self.xsize, self.patch_size[0], self.overlap_padding[0])
        ys, ye = _starts_ends(self.ysize, self.patch_size[1], self.overlap_padding[1])
        object.__setattr__(self, "_xstart", xs)
        object.__setattr__(self, "_xend", xe)
        object.__setattr__(self, "_ystart", ys)
        object.__setattr__(self, "_yend", ye)

    # -- counts ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self._xstart) * len(self._ystart)

    @property
    def patch_count(self) -> Tuple[int, int]:
        """(nx, ny) tile counts per axis (parity: data_utils.py:145-146)."""
        return len(self._xstart), len(self._ystart)

    def decompose(self, item: int) -> Tuple[int, int]:
        """item -> (item_x, item_y) (parity: data_utils.py:94-95)."""
        ny = len(self._ystart)
        return item // ny, item % ny

    # -- per-tile geometry ---------------------------------------------------
    def slice_assign(self, item_x: int, item_y: int) -> Tuple[Slice4, Slice4, Slice4]:
        """(core, read-window, canvas-write-offset) for one tile.

        Parity with data_utils.py:154-176 including the border behaviour:
        the write offset is ``pad`` exactly when the padded read window was
        clamped at the low edge (``start - pad <= 0``).
        """
        padx, pady = self.overlap_padding
        xs, xe = self._xstart[item_x], self._xend[item_x]
        ys, ye = self._ystart[item_y], self._yend[item_y]
        core = (xs, ys, xe - xs, ye - ys)

        x_ori = 0 if xs - padx > 0 else padx
        y_ori = 0 if ys - pady > 0 else pady

        rxs = xs - padx if xs - padx > 0 else 0
        rys = ys - pady if ys - pady > 0 else 0
        rxe = xe + padx if xe + padx < self.xsize else self.xsize
        rye = ye + pady if ye + pady < self.ysize else self.ysize
        read = (rxs, rys, rxe - rxs, rye - rys)
        write = (x_ori, y_ori, rxe - rxs, rye - rys)
        return core, read, write

    def slices(self, item: int) -> Tuple[Slice4, Slice4, Slice4]:
        return self.slice_assign(*self.decompose(item))

    def interior(self, item: int) -> Tuple[int, int, int, int]:
        """Row/col bounds of the valid core interior inside the fixed canvas.

        Returns (y0, y1, x0, x1) such that ``canvas[y0:y1, x0:x1]`` is the
        stitched region (parity: OSCD ``EffRange`` data_utils.py:390-405 and
        the demo eval windows, e.g. Demo_USSS.py:245-248).
        """
        padx, pady = self.overlap_padding
        core, _, _ = self.slices(item)
        return pady, pady + core[3], padx, padx + core[2]

    # -- vectorised geometry for on-device masking ----------------------------
    def interior_sizes(self) -> np.ndarray:
        """(n_tiles, 2) int32 array of (core_h, core_w) for every item.

        Interiors always start at (pad_y, pad_x) in the canvas, so a tile's
        on-device validity mask is fully described by its core size; this
        feeds broadcasted-iota masks inside jitted steps (no host slicing).
        """
        n = len(self)
        out = np.zeros((n, 2), dtype=np.int32)
        for item in range(n):
            core, _, _ = self.slices(item)
            out[item] = (core[3], core[2])
        return out

    def canvas_shape(self) -> Tuple[int, int]:
        """(height, width) of the fixed zero-padded tile canvas."""
        return self.patch_size[1], self.patch_size[0]

    def write_windows(self) -> np.ndarray:
        """(n_tiles, 4) int32 array of canvas write windows (x0, y0, w, h)."""
        n = len(self)
        out = np.zeros((n, 4), dtype=np.int32)
        for item in range(n):
            _, _, write = self.slices(item)
            out[item] = write
        return out

    def canvas_origins(self) -> np.ndarray:
        """(n_tiles, 2) int32 array of (row, col) canvas origins into the
        zero-padded scene of :meth:`padded_shape`.

        With the scene zero-padded by ``(pad_y, pad_x)`` at the top/left
        (and enough at the bottom/right to cover the last tile), every
        tile's fixed canvas is exactly
        ``padded[row : row + patch_h, col : col + patch_w]`` — the clamped
        read window plus write offset of :meth:`slice_assign` collapses to
        one static-size slice, which is what lets tiles be gathered on
        device from a resident scene (data/device_cache.py)."""
        n = len(self)
        out = np.zeros((n, 2), dtype=np.int32)
        for item in range(n):
            ix, iy = self.decompose(item)
            out[item] = (self._ystart[iy], self._xstart[ix])
        return out

    def padded_shape(self) -> Tuple[int, int]:
        """(height, width) of the zero-padded scene for canvas_origins():
        top/left pad = overlap_padding, extent covering the last tile."""
        return (self._ystart[-1] + self.patch_size[1],
                self._xstart[-1] + self.patch_size[0])

    @property
    def xstarts(self) -> List[int]:
        """Grid start columns per tile column (scene coordinates)."""
        return list(self._xstart)

    @property
    def ystarts(self) -> List[int]:
        """Grid start rows per tile row (scene coordinates) — the row keys
        that drive the rolling-window slab partition (device_cache)."""
        return list(self._ystart)


def interior_mask(
    canvas_hw: Tuple[int, int], pad: Tuple[int, int], core_hw
) -> np.ndarray:
    """Boolean (H, W) mask of the stitched interior given a core size.

    Pure numpy twin of the on-device mask in train steps; ``core_hw`` is a
    (h, w) pair. ``pad`` is (pad_x, pad_y) like ``overlap_padding``.
    """
    h, w = canvas_hw
    padx, pady = pad
    ch, cw = int(core_hw[0]), int(core_hw[1])
    rows = np.arange(h)[:, None]
    cols = np.arange(w)[None, :]
    return (rows >= pady) & (rows < pady + ch) & (cols >= padx) & (cols < padx + cw)
