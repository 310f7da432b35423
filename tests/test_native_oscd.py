"""Native OSCD loader vs Python loader — identical batches."""

import numpy as np
import pytest

from fcdgan_tpu.data.datasets import OSCDDataset
from fcdgan_tpu.data.normalize import Normalize
from fcdgan_tpu.data.pipeline import BatchLoader
from fcdgan_tpu.data.synthetic import make_oscd_dataset

native = pytest.importorskip("fcdgan_tpu.native")
pytestmark = pytest.mark.skipif(
    not native.native_available(),
    reason=f"native toolchain unavailable: {native.build_error()}",
)


def test_native_oscd_loader_matches_python(tmp_path):
    from fcdgan_tpu.data.pipeline import NativeOSCDBatchLoader

    root = str(tmp_path / "oscd")
    make_oscd_dataset(root, train_scenes=("alpha", "beta"), xsize=64, ysize=64)
    scalers = [
        Normalize([100.0] * 4, [30.0] * 4, [105.0] * 4, [31.0] * 4),
        Normalize([99.0] * 4, [29.0] * 4, [104.0] * 4, [32.0] * 4),
    ]
    ds = OSCDDataset(root, "train.txt", scaler=scalers,
                     patch_size=(40, 40), overlap_padding=(4, 4))

    py = BatchLoader(ds, 3, fields=("x", "y", "item", "ref", "region"),
                     shuffle=True, seed=7)
    nat = NativeOSCDBatchLoader(ds, 3, shuffle=True, seed=7)

    for pb, nb in zip(py, nat):
        np.testing.assert_array_equal(pb.item, nb.item)  # same shuffle stream
        np.testing.assert_array_equal(pb.weight, nb.weight)
        np.testing.assert_allclose(nb.x, pb.x, atol=1e-5)
        np.testing.assert_allclose(nb.y, pb.y, atol=1e-5)
        np.testing.assert_array_equal(nb.ref, pb.ref)
        np.testing.assert_array_equal(nb.region, pb.region)
