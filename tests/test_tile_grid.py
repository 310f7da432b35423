"""Tile-grid parity tests vs the reference formulas (data_utils.py:57-63,154-176)."""

import numpy as np
import pytest

from fcdgan_tpu.data.tile_grid import TileGrid, interior_mask


def ref_grid_1d(size, patch, pad):
    """Independent re-derivation of the reference's 1-D grid construction."""
    stride = patch - 2 * pad
    starts = list(range(0, size, stride))
    ends = [s + stride for s in starts if s + stride < size]
    ends.append(size)
    return starts, ends


@pytest.mark.parametrize(
    "xsize,ysize,patch,pad",
    [
        (1000, 800, (220, 220), (10, 10)),
        (1000, 800, (200, 200), (10, 10)),
        (199, 123, (200, 200), (10, 10)),  # scene smaller than one tile
        (200, 200, (200, 200), (0, 0)),  # exact single tile, no padding
        (401, 401, (200, 200), (10, 10)),  # 1-px partial tail tiles
        (640, 480, (128, 96), (8, 4)),  # asymmetric patch/pad
    ],
)
def test_grid_counts_and_bounds(xsize, ysize, patch, pad):
    g = TileGrid(xsize, ysize, patch, pad)
    xs, xe = ref_grid_1d(xsize, patch[0], pad[0])
    ys, ye = ref_grid_1d(ysize, patch[1], pad[1])
    assert g.patch_count == (len(xs), len(ys))
    assert len(g) == len(xs) * len(ys)

    # every tile: core within scene, read window within scene, write offset
    # plus read extent fits the fixed canvas, cores exactly tile the scene
    covered = np.zeros((ysize, xsize), dtype=int)
    for item in range(len(g)):
        core, read, write = g.slices(item)
        assert 0 <= core[0] and core[0] + core[2] <= xsize
        assert 0 <= core[1] and core[1] + core[3] <= ysize
        assert 0 <= read[0] and read[0] + read[2] <= xsize
        assert 0 <= read[1] and read[1] + read[3] <= ysize
        assert write[0] + write[2] <= patch[0]
        assert write[1] + write[3] <= patch[1]
        covered[core[1] : core[1] + core[3], core[0] : core[0] + core[2]] += 1
    assert (covered == 1).all(), "cores must partition the scene exactly once"


def test_slice_assign_values_match_reference_formula():
    # hand-checked values for the canonical USSS config (220 patch, 10 pad)
    g = TileGrid(1000, 800, (220, 220), (10, 10))
    nx, ny = g.patch_count
    assert (nx, ny) == (5, 4)

    # first tile: read not shifted (clamped), write offset = pad
    core, read, write = g.slice_assign(0, 0)
    assert core == (0, 0, 200, 200)
    assert read == (0, 0, 210, 210)
    assert write == (10, 10, 210, 210)

    # interior tile: read = core +- pad, write offset 0
    core, read, write = g.slice_assign(1, 1)
    assert core == (200, 200, 200, 200)
    assert read == (190, 190, 220, 220)
    assert write == (0, 0, 220, 220)

    # last x tile: 1000 - 4*200 = 200 wide, read clamped at right
    core, read, write = g.slice_assign(4, 0)
    assert core == (800, 0, 200, 200)
    assert read == (790, 0, 210, 210)
    assert write == (0, 10, 210, 210)


def test_item_decomposition_round_trip():
    g = TileGrid(1000, 800, (220, 220), (10, 10))
    ny = g.patch_count[1]
    for item in range(len(g)):
        ix, iy = g.decompose(item)
        assert item == ix * ny + iy


def test_interior_and_mask_agree():
    g = TileGrid(401, 401, (200, 200), (10, 10))
    sizes = g.interior_sizes()
    for item in range(len(g)):
        y0, y1, x0, x1 = g.interior(item)
        assert (y0, x0) == (10, 10)
        m = interior_mask(g.canvas_shape(), g.overlap_padding, sizes[item])
        expect = np.zeros(g.canvas_shape(), bool)
        expect[y0:y1, x0:x1] = True
        np.testing.assert_array_equal(m, expect)


def test_stitch_round_trip():
    """Write each tile interior back at its core offset -> reconstructs scene."""
    rng = np.random.default_rng(0)
    scene = rng.normal(size=(123, 157)).astype(np.float32)
    g = TileGrid(scene.shape[1], scene.shape[0], (64, 48), (6, 4))
    out = np.zeros_like(scene)
    padx, pady = g.overlap_padding
    for item in range(len(g)):
        core, read, write = g.slices(item)
        canvas = np.zeros(g.canvas_shape(), dtype=np.float32)
        canvas[write[1] : write[1] + write[3], write[0] : write[0] + write[2]] = scene[
            read[1] : read[1] + read[3], read[0] : read[0] + read[2]
        ]
        # interior-only writeback (parity: data_utils.py:213)
        out[core[1] : core[1] + core[3], core[0] : core[0] + core[2]] = canvas[
            pady : pady + core[3], padx : padx + core[2]
        ]
    np.testing.assert_array_equal(out, scene)
