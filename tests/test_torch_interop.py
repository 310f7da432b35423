"""torch .pkl <-> flax checkpoint conversion (io/torch_interop.py).

Verifies the state_dict key structure matches the reference module layout
(Module.py via torch's Sequential/attribute naming rules), that layout
transforms round-trip bit-exactly, and that an exported Generator
state_dict drives a torch model to the same outputs as the flax source.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

from fcdgan_tpu.io.torch_interop import (  # noqa: E402
    detect_flax_kind, detect_torch_kind, torch_to_variables, variables_to_torch)
from fcdgan_tpu.models import Discriminator, Generator, Segmentor  # noqa: E402


def _init(model, *shapes):
    args = [jnp.zeros(s) for s in shapes]
    return model.init(jax.random.PRNGKey(0), *args, train=False)


def _assert_trees_equal(a, b):
    fa, fb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert jax.tree.structure(a) == jax.tree.structure(b)
    for x, y in zip(fa, fb):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


@pytest.mark.parametrize("kind,build,shapes", [
    ("segmentor", lambda: Segmentor(3, bilinear=True),
     ((1, 32, 32, 3), (1, 32, 32, 3))),
    ("generator", lambda: Generator(4), ((1, 32, 32, 4),)),
    ("discriminator", lambda: Discriminator(3),
     ((1, 32, 32, 3), (1, 32, 32, 3))),
])
def test_round_trip_exact(kind, build, shapes):
    vs = _init(build(), *shapes)
    assert detect_flax_kind(vs["params"]) == kind
    sd = variables_to_torch(vs["params"], vs["batch_stats"])
    assert detect_torch_kind(sd) == kind
    back = torch_to_variables(sd)
    _assert_trees_equal(back["params"], vs["params"])
    _assert_trees_equal(back["batch_stats"], vs["batch_stats"])


def test_reference_key_structure():
    """Exported keys follow the reference's module/Sequential naming
    (Module.py:25-32,43-46,59-64,85,101-111,145-158,174-181,195-217)."""
    vs = _init(Segmentor(3, bilinear=True), (1, 32, 32, 3), (1, 32, 32, 3))
    sd = variables_to_torch(vs["params"], vs["batch_stats"])
    for k in ("inc.double_conv.0.weight", "inc.double_conv.4.running_var",
              "down3.maxpool_conv.1.double_conv.1.running_mean",
              "up4.conv.double_conv.3.bias", "outc.conv.weight",
              "up1.conv.double_conv.0.weight"):
        assert k in sd, k
    # Up(2048, 512, bilinear) => DoubleConv(2048, 512, mid=1024)
    assert sd["up1.conv.double_conv.0.weight"].shape == (1024, 2048, 3, 3)
    assert sd["up1.conv.double_conv.3.weight"].shape == (512, 1024, 3, 3)

    vg = _init(Generator(3), ((1, 32, 32, 3)))
    sdg = variables_to_torch(vg["params"], vg["batch_stats"])
    for k in ("block1.0.weight", "block1.1.weight", "block5.bn2.running_mean",
              "block6.prelu.weight", "block7.1.weight", "block8.bias"):
        assert k in sdg, k
    assert sdg["block1.0.weight"].shape == (64, 3, 9, 9)
    assert sdg["block8.weight"].shape == (3, 64, 9, 9)

    vd = _init(Discriminator(3), (1, 32, 32, 3), (1, 32, 32, 3))
    sdd = variables_to_torch(vd["params"], vd["batch_stats"])
    for k in ("net.0.weight", "net.3.running_var", "net.9.weight",
              "classifier.1.weight", "classifier.3.bias"):
        assert k in sdd, k
    assert sdd["classifier.1.weight"].shape == (1024, 512, 1, 1)


def test_generator_export_drives_torch_forward():
    """Exported state_dict loaded into a torch model (via an attr-name remap
    onto the independent TorchGenerator) reproduces the flax forward."""
    from tests.test_torch_parity import TorchGenerator, nhwc_to_torch, torch_to_nhwc

    model = Generator(3)
    x = np.random.default_rng(3).normal(size=(2, 32, 32, 3)).astype(np.float32)
    vs = model.init(jax.random.PRNGKey(1), jnp.asarray(x), train=False)
    sd = variables_to_torch(vs["params"], vs["batch_stats"])

    rename = {"block1.0": "stem_conv", "block1.1": "stem_act",
              "block7.0": "post_conv", "block7.1": "post_bn",
              "block8": "out_conv"}
    rename.update({f"block{i + 2}": f"blocks.{i}" for i in range(5)})
    remapped = {}
    for k, v in sd.items():
        prefix, _, leaf = k.rpartition(".")
        if prefix in rename:
            remapped[f"{rename[prefix]}.{leaf}"] = torch.from_numpy(np.asarray(v))
        else:  # residual-block inner modules: block{n}.conv1.weight etc.
            blk, _, rest = prefix.partition(".")
            remapped[f"{rename[blk]}.{rest}.{leaf}"] = torch.from_numpy(np.asarray(v))

    tg = TorchGenerator(3)
    tg.load_state_dict(remapped, strict=True)
    tg.eval()
    ours = np.asarray(model.apply(vs, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


def test_restore_net_any_and_model_g_reuse_pkl(tmp_path):
    """Drivers/serving load reference .pkl checkpoints directly: the
    GModel.pkl reuse cache (Demo_WSSS.py:131-135) and --smodel SModel.pkl."""
    from fcdgan_tpu.io.checkpoint import model_g_reuse, restore_net_any
    from fcdgan_tpu.train.state import create_net_state

    model = Generator(3)
    x = np.random.default_rng(11).normal(size=(1, 32, 32, 3)).astype(np.float32)
    vs = model.init(jax.random.PRNGKey(4), jnp.asarray(x), train=False)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          variables_to_torch(vs["params"], vs["batch_stats"]).items()}
    torch.save(sd, str(tmp_path / "GModel.pkl"))

    template = create_net_state(model, jax.random.PRNGKey(0),
                                (jnp.asarray(x),), tx=None)
    state, epochs = model_g_reuse(str(tmp_path), template, 50)
    assert epochs == 0  # pkl cache honored: pretrain skipped
    out_src = np.asarray(model.apply(vs, jnp.asarray(x), train=False))
    out_pkl = np.asarray(model.apply(state.variables, jnp.asarray(x), train=False))
    np.testing.assert_array_equal(out_src, out_pkl)

    st2 = restore_net_any(str(tmp_path / "GModel.pkl"), template, kind="generator")
    out2 = np.asarray(model.apply(st2.variables, jnp.asarray(x), train=False))
    np.testing.assert_array_equal(out_src, out2)


def test_convert_checkpoint_tool_round_trip(tmp_path):
    """pkl -> ckpt -> pkl through the CLI tool: loadable at every hop."""
    from fcdgan_tpu.io.checkpoint import restore_net
    from fcdgan_tpu.tools.convert_checkpoint import ckpt_to_pkl, pkl_to_ckpt
    from fcdgan_tpu.train.state import create_net_state

    model = Generator(3)
    x = np.random.default_rng(7).normal(size=(1, 32, 32, 3)).astype(np.float32)
    vs = model.init(jax.random.PRNGKey(2), jnp.asarray(x), train=False)
    sd = {k: torch.from_numpy(np.asarray(v)) for k, v in
          variables_to_torch(vs["params"], vs["batch_stats"]).items()}
    pkl_in = str(tmp_path / "GModel.pkl")
    torch.save(sd, pkl_in)

    ckpt = str(tmp_path / "GModel.ckpt")
    info = pkl_to_ckpt(pkl_in, ckpt)
    assert info["model"] == "generator"

    template = create_net_state(model, jax.random.PRNGKey(0),
                                (jnp.asarray(x),), tx=None)
    restored = restore_net(ckpt, template)
    out_src = np.asarray(model.apply(vs, jnp.asarray(x), train=False))
    out_ckpt = np.asarray(model.apply(restored.variables, jnp.asarray(x),
                                      train=False))
    np.testing.assert_array_equal(out_src, out_ckpt)

    pkl_out = str(tmp_path / "GModel_back.pkl")
    info2 = ckpt_to_pkl(ckpt, pkl_out)
    assert info2["model"] == "generator"
    sd_back = torch.load(pkl_out, map_location="cpu", weights_only=True)
    assert set(sd_back) == set(sd)
    for k in sd:
        np.testing.assert_array_equal(sd_back[k].numpy(), sd[k].numpy())
