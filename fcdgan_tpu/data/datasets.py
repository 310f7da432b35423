"""Datasets: tiled scene pairs, regional references, OSCD multi-scene, WHU slices.

Host-side counterparts of /root/reference/data_utils.py, re-expressed over the
framework's raster codecs and pure TileGrid math, yielding (h, w, nband)
float32 numpy tiles (NHWC batches after collation — TPU conv layout):

  * :class:`ScenePairDataset`       — GDALDataset (data_utils.py:28-236), incl.
    the dataset-owns-the-output-raster stitched write-back,
  * :class:`RegionScenePairDataset` — GDALDataset_RSS (data_utils.py:239-290),
  * :class:`OSCDDataset`            — OSCD_Dataset_RSS (data_utils.py:294-446),
  * :class:`WHUDataset`             — WHU_Dataset (data_utils.py:449-563),
  * :class:`WHUPairDataset`         — WHU_Dataset_WSS (data_utils.py:570-625).

Normalisation (``enhance``) is applied to the raw read window *before* zero
padding, exactly like the reference (data_utils.py:110-120), so canvas padding
stays zero and the zero-pixel stats masking works.
"""

from __future__ import annotations

import math
import os
import random
from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

from .raster import create_raster, open_raster
from .tile_grid import TileGrid

IMAGE_EXTENSIONS = (".png", ".jpg", ".jpeg", ".PNG", ".JPG", ".tif")


class ScenePairDataset:
    """Overlap-tiled bi-temporal scene pair (+ optional 1-band reference)."""

    def __init__(
        self,
        img_path_x,
        img_path_y,
        ref_path=None,
        out_path: Optional[str] = None,
        transforms: Optional[Callable] = None,
        enhance: Optional[Callable] = None,
        patch_size: Tuple[int, int] = (200, 200),
        overlap_padding: Tuple[int, int] = (10, 10),
    ):
        self.img_path_x = img_path_x if isinstance(img_path_x, str) else None
        self.raster_x = open_raster(img_path_x)
        self.raster_y = open_raster(img_path_y)
        if (self.raster_x.xsize, self.raster_x.ysize, self.raster_x.nband) != (
            self.raster_y.xsize, self.raster_y.ysize, self.raster_y.nband
        ):
            raise ValueError("Image sizes don't match")

        self.transforms = transforms
        self.enhance = enhance
        self.patch_size = patch_size
        self.overlap_padding = overlap_padding
        self.grid = TileGrid(self.raster_x.xsize, self.raster_x.ysize, patch_size, overlap_padding)

        self.raster_ref = None
        if ref_path is not None:
            self.raster_ref = open_raster(ref_path)
            if (
                self.raster_ref.xsize != self.raster_x.xsize
                or self.raster_ref.ysize != self.raster_x.ysize
                or self.raster_ref.nband != 1
            ):
                raise ValueError("Reference sizes don't match image")

        self.out_path = out_path
        self._out = None

    # -- protocol ------------------------------------------------------------
    def __len__(self) -> int:
        return len(self.grid)

    def patch_count(self) -> Tuple[int, int]:
        return self.grid.patch_count

    def size(self) -> Tuple[int, int, int]:
        return self.raster_x.xsize, self.raster_x.ysize, self.raster_x.nband

    def slice_assign(self, item_x: int, item_y: int):
        return self.grid.slice_assign(item_x, item_y)

    def _canvas(self, read_window: np.ndarray, write) -> np.ndarray:
        h, w = self.patch_size[1], self.patch_size[0]
        canvas = np.zeros((h, w, read_window.shape[-1]), np.float32)
        canvas[write[1] : write[1] + write[3], write[0] : write[0] + write[2], :] = read_window
        return canvas

    def __getitem__(self, item: int):
        core, read, write = self.grid.slices(item)
        x = self.raster_x.read_block(*read).astype(np.float32)
        y = self.raster_y.read_block(*read).astype(np.float32)
        if self.enhance is not None:
            x = self.enhance(x, switch=1)
            y = self.enhance(y, switch=2)
        x = self._canvas(x, write)
        y = self._canvas(y, write)
        if self.transforms is not None:
            x, sync = self.transforms(x)
            y, sync = self.transforms(y, sync)
        ref = np.zeros((self.patch_size[1], self.patch_size[0], 1), np.float32)
        if self.raster_ref is not None:
            r = self.raster_ref.read_block(*read).astype(np.float32)
            ref[write[1] : write[1] + write[3], write[0] : write[0] + write[2], :] = r
        return x, y, item, ref

    # -- stitched write-back ---------------------------------------------------
    def _default_out_path(self) -> str:
        d, fname = os.path.split(self.img_path_x or "scene.tif")
        stem, ext = os.path.splitext(fname)
        return os.path.join(d, f"{stem}_cmp{ext}")

    def write_default(self, out_image: np.ndarray, item: int):
        """Stitch one predicted tile into the Float32 density raster
        (parity: GDALwriteDefault, data_utils.py:178-213). ``out_image`` is
        (h, w) or (h, w, 1)."""
        if self._out is None:
            if self.out_path is None:
                self.out_path = self._default_out_path()
            xs, ys, _ = self.size()
            self._out = create_raster(self.out_path, xs, ys, 1, np.float32, like=self.raster_x)
        self._write_interior(self._out, out_image, item)

    def write(self, out_image: np.ndarray, item: int, out_raster=None):
        """Multi-band stitched write into a caller-created raster
        (parity: GDALwrite, data_utils.py:215-236)."""
        if out_raster is None:
            self.write_default(out_image, item)
            return
        if out_image.ndim == 2:
            out_image = out_image[..., None]
        if out_image.shape[-1] != out_raster.nband:
            raise ValueError("The band of output image doesn't match the output raster")
        self._write_interior(out_raster, out_image, item)

    def _write_interior(self, raster, out_image: np.ndarray, item: int):
        if out_image.ndim == 2:
            out_image = out_image[..., None]
        core, _, _ = self.grid.slices(item)
        padx, pady = self.overlap_padding
        ph, pw = self.patch_size[1], self.patch_size[0]
        if out_image.shape[:2] == (ph - 2 * pady, pw - 2 * padx):
            # already interior-cropped on device (cuts device->host bytes on
            # low-bandwidth links); the core starts at the crop origin
            interior = out_image[: core[3], : core[2], :]
        else:
            interior = out_image[pady : pady + core[3], padx : padx + core[2], :]
        if interior.shape[-1] == 1:
            raster.write_block(interior[..., 0], core[0], core[1], band=0)
        else:
            raster.write_block(interior, core[0], core[1])

    def write_full(self, density: np.ndarray):
        """Write the WHOLE stitched density raster in one call.

        The fused device-stitched inference path (DeviceSceneCache.
        stitched_density) downloads the finished scene once; this publishes
        it with the same lazy creation + geo-metadata copy as the per-tile
        ``write_default`` (parity target: data_utils.py:190-198)."""
        if self._out is None:
            if self.out_path is None:
                self.out_path = self._default_out_path()
            xs, ys, _ = self.size()
            self._out = create_raster(self.out_path, xs, ys, 1, np.float32, like=self.raster_x)
        d = density[..., 0] if density.ndim == 3 else density
        self._out.write_block(d.astype(np.float32), 0, 0, band=0)

    def interior_sizes(self) -> np.ndarray:
        """(n_tiles, 2) core (h, w) per item for on-device interior masks."""
        return self.grid.interior_sizes()

    def close_outputs(self):
        if self._out is not None and hasattr(self._out, "close"):
            self._out.close()
            self._out = None


class RegionScenePairDataset:
    """Scene pair + coarse region raster, binarized at >125
    (parity: GDALDataset_RSS, data_utils.py:239-290)."""

    def __init__(self, img_path_x, img_path_y, region_path=None, ref_path=None,
                 out_path=None, transforms=None, enhance=None,
                 patch_size=(200, 200), overlap_padding=(10, 10)):
        self.ds = ScenePairDataset(
            img_path_x, img_path_y, ref_path=ref_path, out_path=out_path,
            transforms=transforms, enhance=enhance,
            patch_size=patch_size, overlap_padding=overlap_padding,
        )
        self.patch_size = patch_size
        self.raster_region = None
        if region_path is not None:
            self.raster_region = open_raster(region_path)
            if (
                self.raster_region.xsize != self.ds.raster_x.xsize
                or self.raster_region.ysize != self.ds.raster_x.ysize
                or self.raster_region.nband != 1
            ):
                raise ValueError("Reference sizes don't match image")

    def __len__(self):
        return len(self.ds)

    def __getitem__(self, item: int):
        x, y, item, ref = self.ds[item]
        region = np.zeros((self.patch_size[1], self.patch_size[0], 1), np.float32)
        if self.raster_region is not None:
            _, read, write = self.ds.grid.slices(item)
            r = self.raster_region.read_block(*read).astype(np.float32)
            region[write[1] : write[1] + write[3], write[0] : write[0] + write[2], :] = r
        region[region > 125] = 1
        return x, y, item, ref, region

    def write(self, out_image, item, out_raster=None):
        self.ds.write(out_image, item, out_raster)


class OSCDDataset:
    """Multi-scene concat dataset over the prepared OSCD layout
    (parity: OSCD_Dataset_RSS, data_utils.py:294-446).

    Scene list: a one-line comma-separated txt. Per scene dir
    ``{name}/ImagePair/``: two extension-less ENVI images whose names contain
    the scene name, ``*-cm.tif`` reference, ``*-region.tif`` region raster.
    Per-scene scalers/transforms; global indexing by cumulative lengths;
    per-(filter, scene) lazily created output rasters."""

    def __init__(self, img_dir: str, txt_name: str, scaler: Optional[Sequence] = None,
                 transforms: Optional[Sequence] = None,
                 patch_size=(200, 200), overlap_padding=(10, 10)):
        self.img_dir = img_dir
        self.txt_name = txt_name
        self.patch_size = patch_size
        self.overlap_padding = overlap_padding

        with open(os.path.join(img_dir, txt_name), "r") as f:
            line = f.readline().strip()
        filenames = [n for n in line.split(",") if n]

        # validate up-front, before any scene is opened (parity: the
        # reference checks inside its loop too late, data_utils.py:341-346 —
        # a wrong-length list should fail fast, not IndexError mid-build)
        if scaler is not None and len(scaler) != len(filenames):
            raise ValueError("The list of scaler doesn't match the file list")
        if transforms is not None and len(transforms) != len(filenames):
            raise ValueError("The list of transforms doesn't match the file list")

        self.dslist: List[RegionScenePairDataset] = []
        self.numlist: List[int] = []
        self.namelist: List[str] = []
        self.pathlist: List[List[str]] = []

        for idx, name in enumerate(filenames):
            cur = os.path.join(img_dir, name, "ImagePair")
            imgs = sorted(
                x for x in os.listdir(cur)
                if os.path.splitext(x)[-1] == "" and name in x
            )
            if len(imgs) != 2:
                raise ValueError(f"Error in finding image file {cur}")
            refs = [x for x in os.listdir(cur) if x.split("-")[-1] == "cm.tif"]
            if len(refs) != 1:
                raise ValueError(f"Error in finding reference file {cur}")
            regions = [x for x in os.listdir(cur) if x.split("-")[-1] == "region.tif"]
            if len(regions) != 1:
                raise ValueError(f"Error in finding region file {cur}")
            px = os.path.join(cur, imgs[0])
            py = os.path.join(cur, imgs[1])
            pr = os.path.join(cur, refs[0])
            pg = os.path.join(cur, regions[0])
            self.pathlist.append([px, py, pr, pg])

            cur_scaler = None if scaler is None else scaler[idx]
            cur_tf = None if transforms is None else transforms[idx]

            ds = RegionScenePairDataset(
                px, py, region_path=pg, ref_path=pr, enhance=cur_scaler,
                transforms=cur_tf, patch_size=patch_size, overlap_padding=overlap_padding,
            )
            self.dslist.append(ds)
            self.numlist.append(len(ds))
            self.namelist.append(name)

        self.cumlen = np.cumsum(self.numlist).tolist()
        self._writers = {}  # (filter_name, scene_idx) -> raster writer

    def __len__(self):
        return int(self.cumlen[-1]) if self.cumlen else 0

    def _locate(self, item: int) -> Tuple[int, int]:
        if item >= self.cumlen[-1]:
            raise IndexError("item exceeds the len")
        ds_idx = int(np.searchsorted(np.asarray(self.cumlen), item, side="right"))
        cur = item - self.cumlen[ds_idx - 1] if ds_idx > 0 else item
        return ds_idx, cur

    def __getitem__(self, item: int):
        ds_idx, cur = self._locate(item)
        x, y, _, ref, region = self.dslist[ds_idx][cur]
        return x, y, item, ref, region

    def eff_range(self, item: int) -> Tuple[int, int, int, int]:
        """Interior eval window (y0, y1, x0, x1) for a global item
        (parity: EffRange, data_utils.py:390-405)."""
        ds_idx, cur = self._locate(item)
        return self.dslist[ds_idx].ds.grid.interior(cur)

    # keep the reference's public name too
    EffRange = eff_range

    def interior_sizes(self) -> np.ndarray:
        """Concatenated per-scene core sizes, indexed by global item."""
        return np.concatenate([d.ds.grid.interior_sizes() for d in self.dslist])

    def write(self, out_image: np.ndarray, item: int, filter_name: str):
        """Stitch into the per-(filter, scene) output raster
        (parity: GDALwrite, data_utils.py:408-446)."""
        ds_idx, cur = self._locate(item)
        if out_image.ndim == 2:
            out_image = out_image[..., None]
        key = (filter_name, ds_idx)
        if key not in self._writers:
            base = self.dslist[ds_idx].ds
            xs, ys, _ = base.size()
            out_path = os.path.join(
                self.img_dir, self.namelist[ds_idx], "ImagePair", filter_name
            )
            self._writers[key] = create_raster(
                out_path, xs, ys, out_image.shape[-1], np.float32, like=base.raster_x
            )
        self.dslist[ds_idx].write(out_image, cur, self._writers[key])

    def write_full_scene(self, ds_idx: int, array: np.ndarray, filter_name: str):
        """Write one WHOLE scene raster for a (filter, scene) output in one
        call (the fused device-stitched serving path; same lazy creation +
        geo-metadata copy as :meth:`write`)."""
        if array.ndim == 2:
            array = array[..., None]
        key = (filter_name, ds_idx)
        if key not in self._writers:
            base = self.dslist[ds_idx].ds
            xs, ys, _ = base.size()
            out_path = os.path.join(
                self.img_dir, self.namelist[ds_idx], "ImagePair", filter_name
            )
            self._writers[key] = create_raster(
                out_path, xs, ys, array.shape[-1], np.float32, like=base.raster_x
            )
        w = self._writers[key]
        if array.shape[-1] == 1:
            w.write_block(array[..., 0].astype(np.float32), 0, 0, band=0)
        else:
            w.write_block(array.astype(np.float32), 0, 0)

    def close_outputs(self):
        for w in self._writers.values():
            if hasattr(w, "close"):
                w.close()
        self._writers = {}


class WHUDataset:
    """Slice-image dataset over before/after/Label dirs + label.txt
    (parity: WHU_Dataset, data_utils.py:449-563).

    label_selected: '1' changed only, '0' unchanged only, '-1' all listed,
    '-2' everything."""

    def __init__(self, img_dir_x: str, img_dir_y: str, ref_dir: str, label_dir: str,
                 label_selected: str = "-1", scale=None, transforms=None):
        with open(os.path.join(label_dir, "label.txt")) as f:
            self.label_list = [line.strip("\n").split(",") for line in f.readlines()]

        names_x = sorted(
            x for x in os.listdir(img_dir_x)
            if self._is_image_file(x) and self._is_image_label(x, label_selected)
        )
        names_y = sorted(
            y for y in os.listdir(img_dir_y)
            if self._is_image_file(y) and self._is_image_label(y, label_selected)
        )
        if names_x != names_y:
            raise ValueError("The multi-temporal images don't match")

        self.label_list = self._label_list_arrange(names_x)
        self.img_path_x = [os.path.join(img_dir_x, n) for n in names_x]
        self.img_path_y = [os.path.join(img_dir_y, n) for n in names_y]
        self.ref_path = [os.path.join(ref_dir, n) for n in names_x]
        self.transforms = transforms
        self.scale = scale

    def _is_image_file(self, filename: str) -> bool:
        return any(filename.endswith(e) for e in IMAGE_EXTENSIONS)

    def _is_image_label(self, filename: str, label_selected: str) -> bool:
        if label_selected == "-2":
            return True
        for label_item in self.label_list:
            if filename in label_item:
                if label_selected == "-1":
                    return True
                return label_item[3] == label_selected
        return False

    def _label_list_arrange(self, filename_list):
        out = []
        for filename in filename_list:
            tmp = [filename, "-1", "-1", "-2"]
            for label_item in self.label_list:
                if filename in label_item:
                    tmp = label_item
                    break
            out.append(tmp)
        return out

    def __len__(self):
        return len(self.img_path_x)

    def get_file_name(self, item: int) -> str:
        return os.path.split(self.img_path_x[item])[1]

    getFileName = get_file_name

    def __getitem__(self, item: int):
        from PIL import Image

        x = np.array(Image.open(self.img_path_x[item]), dtype=np.float32)
        y = np.array(Image.open(self.img_path_y[item]), dtype=np.float32)
        if x.ndim == 2:
            x = x[..., None]
        if y.ndim == 2:
            y = y[..., None]

        label_item = self.label_list[item]
        if int(label_item[3]) == 1:
            ref = np.array(Image.open(self.ref_path[item]))
            ref = (ref > 0).astype(np.float32)[..., None]
        else:
            ref = np.zeros((x.shape[0], x.shape[1], 1), np.float32)

        if self.scale is not None:
            x = self.scale(x, switch=1)
            y = self.scale(y, switch=2)

        label = np.array([int(v) for v in label_item[1:]], np.int32)

        if self.transforms is not None:
            x, sync = self.transforms(x)
            y, sync = self.transforms(y, sync)

        return x, y, ref, item, label


class WHUPairDataset:
    """Changed/unchanged pairing for weak supervision
    (parity: WHU_Dataset_WSS, data_utils.py:570-625).

    The class with larger count is the base; the smaller one is repeated
    through shuffled orders rebuilt by :meth:`order_reset` each epoch
    (``random_assign=False``), or picked uniformly per access."""

    def __init__(self, img_dir_x, img_dir_y, ref_dir, label_dir, scale=None,
                 transforms=None, random_assign: bool = True,
                 rng: Optional[random.Random] = None):
        self.c_ds = WHUDataset(img_dir_x, img_dir_y, ref_dir, label_dir,
                               scale=scale, label_selected="1")
        self.nc_ds = WHUDataset(img_dir_x, img_dir_y, ref_dir, label_dir,
                                scale=scale, label_selected="0", transforms=transforms)
        self.c_len = len(self.c_ds)
        self.nc_len = len(self.nc_ds)
        self.random_assign = random_assign
        self.rng = rng or random.Random()
        if not random_assign:
            self.order_reset()

    def order_reset(self):
        if self.c_len > self.nc_len:
            order_tmp = list(range(self.nc_len))
            reps = math.ceil(self.c_len / self.nc_len)
            order = []
            for _ in range(reps):
                self.rng.shuffle(order_tmp)
                order = order + order_tmp
            self.nc_order = order[: self.c_len]
            self.c_order = list(range(self.c_len))
        else:
            order_tmp = list(range(self.c_len))
            reps = math.ceil(self.nc_len / self.c_len)
            order = []
            for _ in range(reps):
                self.rng.shuffle(order_tmp)
                order = order + order_tmp
            self.c_order = order[: self.nc_len]
            self.nc_order = list(range(self.nc_len))

    def __len__(self):
        return max(self.c_len, self.nc_len)

    def __getitem__(self, item: int):
        if not self.random_assign:
            item_c, item_nc = self.c_order[item], self.nc_order[item]
        elif self.c_len > self.nc_len:
            item_c, item_nc = item, self.rng.randint(0, self.nc_len - 1)
        else:
            item_nc, item_c = item, self.rng.randint(0, self.c_len - 1)
        return self.c_ds[item_c], self.nc_ds[item_nc]
