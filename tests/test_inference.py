"""Pipelined stitched inference: output equals the sequential path."""

import numpy as np
import jax
import jax.numpy as jnp

from fcdgan_tpu.data.datasets import ScenePairDataset
from fcdgan_tpu.data.synthetic import make_usss_scene
from fcdgan_tpu.data.tiff import TiffReader
from fcdgan_tpu.eval.inference import stitched_inference
from fcdgan_tpu.models import Segmentor
from fcdgan_tpu.train.optim import adam
from fcdgan_tpu.train.state import create_net_state


def test_stitched_inference_matches_sequential(tmp_path):
    d = str(tmp_path / "s")
    paths = make_usss_scene(d, 96, 80, 3)
    out_a = str(tmp_path / "a.tif")
    out_b = str(tmp_path / "b.tif")

    model = Segmentor(3, bilinear=True)
    zx = jnp.zeros((1, 48, 48, 3))
    sstate = create_net_state(model, jax.random.PRNGKey(0), (zx, zx), adam())
    infer = jax.jit(lambda st, x, y: model.apply(st.variables, x, y, train=False))

    # pipelined path
    ds_a = ScenePairDataset(paths["x"], paths["y"], out_path=out_a,
                            patch_size=(48, 48), overlap_padding=(4, 4))
    stats = stitched_inference(ds_a, infer, sstate, batch_size=4)
    assert stats["pixels"] == 96 * 80
    assert stats["px_per_s"] > 0

    # sequential reference path
    ds_b = ScenePairDataset(paths["x"], paths["y"], out_path=out_b,
                            patch_size=(48, 48), overlap_padding=(4, 4))
    for item in range(len(ds_b)):
        x, y, _, _ = ds_b[item]
        cmap = infer(sstate, x[None], y[None])
        ds_b.write_default(np.asarray(cmap)[0], item)
    ds_b.close_outputs()

    a = TiffReader(out_a).read_block()
    b = TiffReader(out_b).read_block()
    np.testing.assert_allclose(a, b, atol=1e-6)
