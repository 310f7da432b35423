"""Codec-coverage matrix for the TIFF substrate (VERDICT round-1 task 4).

Round-trips {uncompressed, deflate, LZW, PackBits} x {strip, tile} x
{classic, BigTIFF} through a hand-rolled fixture writer -> TiffReader, and
cross-validates against PIL/libtiff in both directions where PIL supports the
combination (PIL here writes classic strip TIFFs only, but reads everything
including BigTIFF)."""

import struct
import zlib

import numpy as np
import pytest
from PIL import Image

from fcdgan_tpu.data.tiff import TiffReader, TiffWriter, _pack_entry

# ---------------------------------------------------------------------------
# minimal encoders (test-side twins of the reader's decoders)
# ---------------------------------------------------------------------------


def lzw_encode(data: bytes) -> bytes:
    """TIFF-flavor LZW encoder: MSB-first, early-change width bumps."""
    out = bytearray()
    bitbuf = 0
    bitcnt = 0

    def emit(code, width):
        nonlocal bitbuf, bitcnt
        bitbuf = (bitbuf << width) | code
        bitcnt += width
        while bitcnt >= 8:
            out.append((bitbuf >> (bitcnt - 8)) & 0xFF)
            bitcnt -= 8

    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    width = 9
    emit(256, width)  # Clear
    s = b""
    for b in data:
        c = s + bytes([b])
        if c in table:
            s = c
            continue
        emit(table[s], width)
        table[c] = next_code
        next_code += 1
        # decoder's table lags one entry behind: it bumps width when ITS
        # table hits 2^w - 1, which is when our next_code hits 2^w
        if next_code == (1 << width) and width < 12:
            width += 1
        if next_code >= 4094:  # reset before the table overflows
            emit(256, width)
            table = {bytes([i]): i for i in range(256)}
            next_code = 258
            width = 9
        s = bytes([b])
    if s:
        emit(table[s], width)
    emit(257, width)  # EOI
    if bitcnt:
        out.append((bitbuf << (8 - bitcnt)) & 0xFF)
    return bytes(out)


def packbits_encode(data: bytes) -> bytes:
    """Greedy PackBits: repeat runs >=3 as RLE, the rest as literals."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        run = 1
        while i + run < n and run < 128 and data[i + run] == data[i]:
            run += 1
        if run >= 3:
            out += bytes([257 - run, data[i]])
            i += run
            continue
        lit0 = i
        while i < n and i - lit0 < 128:
            run = 1
            while i + run < n and run < 3 and data[i + run] == data[i]:
                run += 1
            if run >= 3:
                break
            i += 1
        out += bytes([i - lit0 - 1]) + data[lit0:i]
    return bytes(out)


def _compress(chunk: bytes, compression: int) -> bytes:
    if compression == 1:
        return chunk
    if compression == 8:
        return zlib.compress(chunk)
    if compression == 5:
        return lzw_encode(chunk)
    if compression == 32773:
        return packbits_encode(chunk)
    raise ValueError(compression)


def write_fixture(path, arr, *, compression=1, tiled=False, big=False,
                  predictor=1, rows_per_strip=5, tile=(16, 16)):
    """Hand-assemble a chunky TIFF with the requested layout.

    ``arr``: (h, w) or (h, w, bands) uint8/uint16/int16/float32."""
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nb = arr.shape
    arr = np.ascontiguousarray(arr)
    dt = arr.dtype
    sf = {np.uint8: 1, np.uint16: 1, np.int16: 2, np.float32: 3}[dt.type]
    bits = dt.itemsize * 8

    def prep(block):
        if predictor == 2:
            block = block.astype(np.int64)
            block[:, 1:] -= block[:, :-1].copy()
            block = block.astype(dt)
        return block.tobytes()

    chunks = []
    if tiled:
        tw, th = tile
        for ty in range(0, h, th):
            for tx in range(0, w, tw):
                canvas = np.zeros((th, tw, nb), dt)
                blk = arr[ty : ty + th, tx : tx + tw]
                canvas[: blk.shape[0], : blk.shape[1]] = blk
                chunks.append(_compress(prep(canvas), compression))
    else:
        for r0 in range(0, h, rows_per_strip):
            chunks.append(_compress(prep(arr[r0 : r0 + rows_per_strip]), compression))

    off_typ = 16 if big else 4
    tags = [
        (256, 4, [w]), (257, 4, [h]), (258, 3, [bits] * nb),
        (259, 3, [compression]), (262, 3, [2 if nb >= 3 else 1]), (277, 3, [nb]),
        (284, 3, [1]), (317, 3, [predictor]), (339, 3, [sf] * nb),
    ]
    if tiled:
        tags += [(322, 3, [tile[0]]), (323, 3, [tile[1]]),
                 (324, off_typ, [0] * len(chunks)),
                 (325, off_typ, [len(c) for c in chunks])]
        off_tag = 324
    else:
        tags += [(273, off_typ, [0] * len(chunks)),
                 (278, 4, [rows_per_strip]),
                 (279, off_typ, [len(c) for c in chunks])]
        off_tag = 273
    tags.sort()

    if big:
        ifd_off, head = 16, struct.pack("<2sHHHQ", b"II", 43, 8, 0, 16)
        heap_base = ifd_off + 8 + 20 * len(tags) + 8
    else:
        ifd_off, head = 8, struct.pack("<2sHI", b"II", 42, 8)
        heap_base = ifd_off + 2 + 12 * len(tags) + 4

    # pass 1 sizes the heap, pass 2 packs real chunk offsets
    heap = []
    for tag, typ, vals in tags:
        _pack_entry("<", tag, typ, vals, heap, heap_base, big)
    data_start = heap_base + sum(len(x) for x in heap)
    offsets = []
    pos = data_start
    for c in chunks:
        offsets.append(pos)
        pos += len(c) + (len(c) % 2)
    tags = [(t, ty, offsets) if t == off_tag else (t, ty, v) for t, ty, v in tags]
    heap, bufs = [], []
    for tag, typ, vals in tags:
        buf, _ = _pack_entry("<", tag, typ, vals, heap, heap_base, big)
        bufs.append(buf)

    with open(path, "wb") as f:
        f.write(head)
        if big:
            f.write(struct.pack("<Q", len(tags)) + b"".join(bufs) + struct.pack("<Q", 0))
        else:
            f.write(struct.pack("<H", len(tags)) + b"".join(bufs) + struct.pack("<I", 0))
        for x in heap:
            f.write(x)
        for c in chunks:
            f.write(c if len(c) % 2 == 0 else c + b"\0")


# ---------------------------------------------------------------------------
# the matrix
# ---------------------------------------------------------------------------

COMPRESSIONS = [1, 8, 5, 32773]


def _sample(dtype=np.uint8, h=37, w=29, nb=3):
    rng = np.random.default_rng(42)
    # mix of runs (exercises RLE) and noise (exercises LZW table growth)
    a = rng.integers(0, 255, size=(h, w, nb)).astype(dtype)
    a[5:15, 3:20] = 7
    a[20:30] = np.arange(w, dtype=dtype)[None, :, None]
    return a


@pytest.mark.parametrize("compression", COMPRESSIONS)
@pytest.mark.parametrize("tiled", [False, True])
@pytest.mark.parametrize("big", [False, True])
def test_roundtrip_matrix(tmp_path, compression, tiled, big):
    arr = _sample()
    p = str(tmp_path / f"m_{compression}_{tiled}_{big}.tif")
    write_fixture(p, arr, compression=compression, tiled=tiled, big=big)
    r = TiffReader(p)
    assert (r.xsize, r.ysize, r.nband) == (29, 37, 3)
    np.testing.assert_array_equal(r.read_block(), arr)
    # windowed read crosses chunk boundaries
    np.testing.assert_array_equal(r.read_block(10, 3, 15, 30), arr[3:33, 10:25])
    r.close()
    # cross-validation: PIL/libtiff decodes the same pixels
    with Image.open(p) as im:
        np.testing.assert_array_equal(np.asarray(im), arr.squeeze())


@pytest.mark.parametrize("compression", [5, 8, 32773])
def test_lzw_predictor_and_16bit(tmp_path, compression):
    arr = _sample(np.uint16, h=23, w=31, nb=1) * 101
    p = str(tmp_path / "pred.tif")
    write_fixture(p, arr, compression=compression, predictor=2)
    r = TiffReader(p)
    np.testing.assert_array_equal(r.read_block(), arr)
    r.close()


@pytest.mark.parametrize(
    "pil_comp,code", [("raw", 1), ("tiff_adobe_deflate", 8),
                      ("tiff_lzw", 5), ("packbits", 32773)])
def test_reads_pil_written(tmp_path, pil_comp, code):
    # the direction that matters in production: files produced by libtiff
    # (what GDAL writes for OSCD/WHU) must decode bit-exact
    arr = _sample(np.uint8, h=41, w=33, nb=3)
    p = str(tmp_path / "pil.tif")
    if pil_comp == "raw":
        Image.fromarray(arr).save(p)
    else:
        Image.fromarray(arr).save(p, compression=pil_comp)
    r = TiffReader(p)
    assert r._compression in (code, 1)  # raw saves may report 1
    np.testing.assert_array_equal(r.read_block(), arr)
    r.close()


def test_writer_bigtiff_roundtrip(tmp_path):
    arr = np.linspace(0, 1, 13 * 17 * 2, dtype=np.float32).reshape(13, 17, 2)
    gt = (300.0, 2.0, 0.0, 500.0, 0.0, -2.0)
    p = str(tmp_path / "big_out.tif")
    w = TiffWriter(p, 17, 13, 2, np.float32, geotransform=gt, projection="EPSG:32633",
                   big_tiff=True)
    w.write_block(arr)
    w.close()
    assert open(p, "rb").read(4) == b"II+\x00"  # magic 43
    r = TiffReader(p)
    assert r._big
    np.testing.assert_array_equal(r.read_block(), arr)
    np.testing.assert_allclose(r.geotransform, gt)
    assert r.projection == "EPSG:32633"
    r.close()


def test_writer_auto_bigtiff_threshold(tmp_path):
    small = TiffWriter(str(tmp_path / "s.tif"), 8, 8, 1, np.uint8)
    small.close()
    assert not small.big_tiff
    forced = TiffWriter(str(tmp_path / "f.tif"), 8, 8, 1, np.uint8, big_tiff=True)
    forced.close()
    assert forced.big_tiff
    # PIL can open the BigTIFF output too
    with Image.open(str(tmp_path / "f.tif")) as im:
        assert im.size == (8, 8)


