"""Torch-golden parity: same weights + same inputs => same outputs.

The reference cannot run here (no GDAL/CUDA), but torch-cpu can, so these
tests rebuild the reference's numerical semantics in torch (independently
written, matching /root/reference definitions by behavior) and compare against
this framework with **identical weights**: model forwards, the loss stack
(sharing the same VGG weights both ways), optimizer update rules, and the LR
schedule. This is the strongest achievable evidence that a reference user
gets the same numbers from this framework."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fcdgan_tpu.models import Discriminator, Generator, Segmentor  # noqa: E402
from fcdgan_tpu.models.vgg import load_vgg16_params, vgg16_features  # noqa: E402
from fcdgan_tpu.ops.losses import cnet_loss, region_loss  # noqa: E402
from fcdgan_tpu.train.optim import adam, apply_updates, rmsprop  # noqa: E402
from fcdgan_tpu.train.schedules import WarmupSustainDecay  # noqa: E402


# ---------------------------------------------------------------------------
# weight transport helpers
# ---------------------------------------------------------------------------


def _conv_to_torch(tconv, flax_leaf):
    k = np.asarray(flax_leaf["kernel"])  # HWIO
    tconv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
    if "bias" in flax_leaf:
        tconv.bias.data = torch.from_numpy(np.asarray(flax_leaf["bias"]).copy())


def _bn_to_torch(tbn, flax_params, flax_stats):
    tbn.weight.data = torch.from_numpy(np.asarray(flax_params["scale"]).copy())
    tbn.bias.data = torch.from_numpy(np.asarray(flax_params["bias"]).copy())
    tbn.running_mean.data = torch.from_numpy(np.asarray(flax_stats["mean"]).copy())
    tbn.running_var.data = torch.from_numpy(np.asarray(flax_stats["var"]).copy())


def nhwc_to_torch(x):
    return torch.from_numpy(np.transpose(np.asarray(x), (0, 3, 1, 2)).copy())


def torch_to_nhwc(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


# ---------------------------------------------------------------------------
# Generator forward parity (eval mode)
# ---------------------------------------------------------------------------


class TorchResidualBlock(tnn.Module):
    def __init__(self, c):
        super().__init__()
        self.conv1 = tnn.Conv2d(c, c, 3, padding=1)
        self.bn1 = tnn.BatchNorm2d(c)
        self.prelu = tnn.PReLU()
        self.conv2 = tnn.Conv2d(c, c, 3, padding=1)
        self.bn2 = tnn.BatchNorm2d(c)

    def forward(self, x):
        r = self.bn1(self.conv1(x))
        r = self.prelu(r)
        r = self.bn2(self.conv2(r))
        return x + r


class TorchGenerator(tnn.Module):
    """Reference Generator semantics (Module.py:142-172), independent code."""

    def __init__(self, nc):
        super().__init__()
        self.stem_conv = tnn.Conv2d(nc, 64, 9, padding=4)
        self.stem_act = tnn.PReLU()
        self.blocks = tnn.ModuleList([TorchResidualBlock(64) for _ in range(5)])
        self.post_conv = tnn.Conv2d(64, 64, 3, padding=1)
        self.post_bn = tnn.BatchNorm2d(64)
        self.out_conv = tnn.Conv2d(64, nc, 9, padding=4)

    def forward(self, x):
        stem = self.stem_act(self.stem_conv(x))
        h = stem
        for b in self.blocks:
            h = b(h)
        h = self.post_bn(self.post_conv(h))
        return self.out_conv(stem + h)


def test_generator_forward_matches_torch():
    model = Generator(3)
    x = np.random.default_rng(0).normal(size=(2, 32, 32, 3)).astype(np.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), train=False)
    p, bs = vs["params"], vs["batch_stats"]

    tg = TorchGenerator(3).eval()
    _conv_to_torch(tg.stem_conv, p["TorchConv_0"]["Conv_0"])
    tg.stem_act.weight.data = torch.from_numpy(np.asarray(p["PReLU_0"]["alpha"]).copy())
    for i, blk in enumerate(tg.blocks):
        rp = p[f"ResidualBlock_{i}"]
        rs = bs[f"ResidualBlock_{i}"]
        _conv_to_torch(blk.conv1, rp["TorchConv_0"]["Conv_0"])
        _conv_to_torch(blk.conv2, rp["TorchConv_1"]["Conv_0"])
        _bn_to_torch(blk.bn1, rp["BatchNorm_0"]["BatchNorm_0"], rs["BatchNorm_0"]["BatchNorm_0"])
        _bn_to_torch(blk.bn2, rp["BatchNorm_1"]["BatchNorm_0"], rs["BatchNorm_1"]["BatchNorm_0"])
        blk.prelu.weight.data = torch.from_numpy(np.asarray(rp["PReLU_0"]["alpha"]).copy())
    _conv_to_torch(tg.post_conv, p["TorchConv_1"]["Conv_0"])
    _bn_to_torch(tg.post_bn, p["BatchNorm_0"]["BatchNorm_0"], bs["BatchNorm_0"]["BatchNorm_0"])
    _conv_to_torch(tg.out_conv, p["TorchConv_2"]["Conv_0"])

    ours = np.asarray(model.apply(vs, jnp.asarray(x), train=False))
    with torch.no_grad():
        theirs = torch_to_nhwc(tg(nhwc_to_torch(x)))
    np.testing.assert_allclose(ours, theirs, atol=2e-4)


# ---------------------------------------------------------------------------
# Segmentor forward parity (eval mode, bilinear decoder)
# ---------------------------------------------------------------------------


class TorchDoubleConv(tnn.Module):
    def __init__(self, i, o, mid=None):
        super().__init__()
        mid = mid or o
        self.c1 = tnn.Conv2d(i, mid, 3, padding=1)
        self.b1 = tnn.BatchNorm2d(mid)
        self.c2 = tnn.Conv2d(mid, o, 3, padding=1)
        self.b2 = tnn.BatchNorm2d(o)

    def forward(self, x):
        x = tF.relu(self.b1(self.c1(x)))
        return tF.relu(self.b2(self.c2(x)))

    def load(self, fp, fs):
        _conv_to_torch(self.c1, fp["TorchConv_0"]["Conv_0"])
        _conv_to_torch(self.c2, fp["TorchConv_1"]["Conv_0"])
        _bn_to_torch(self.b1, fp["BatchNorm_0"]["BatchNorm_0"], fs["BatchNorm_0"]["BatchNorm_0"])
        _bn_to_torch(self.b2, fp["BatchNorm_1"]["BatchNorm_0"], fs["BatchNorm_1"]["BatchNorm_0"])


class TorchSegmentor(tnn.Module):
    """Reference siamese U-Net semantics (Module.py:93-140), bilinear decoder."""

    def __init__(self, nc):
        super().__init__()
        self.inc = TorchDoubleConv(nc, 64)
        self.downs = tnn.ModuleList([
            TorchDoubleConv(64, 128), TorchDoubleConv(128, 256),
            TorchDoubleConv(256, 512), TorchDoubleConv(512, 512)])
        self.ups = tnn.ModuleList([
            TorchDoubleConv(2048, 512, 1024), TorchDoubleConv(1024, 256, 512),
            TorchDoubleConv(512, 128, 256), TorchDoubleConv(256, 128, 192)])
        self.outc = tnn.Conv2d(128, 1, 1)

    def encode(self, x):
        f = [self.inc(x)]
        for d in self.downs:
            f.append(d(tF.max_pool2d(f[-1], 2)))
        return f

    def forward(self, x1, x2):
        a, b = self.encode(x1), self.encode(x2)
        cat = [torch.cat([p, q], dim=1) for p, q in zip(a, b)]
        h = cat[-1]
        for lvl, up in enumerate(self.ups):
            h = tF.interpolate(h, scale_factor=2, mode="bilinear", align_corners=True)
            skip = cat[-2 - lvl]
            dy, dx = skip.shape[2] - h.shape[2], skip.shape[3] - h.shape[3]
            h = tF.pad(h, [dx // 2, dx - dx // 2, dy // 2, dy - dy // 2])
            h = up(torch.cat([skip, h], dim=1))
        return torch.sigmoid(self.outc(h))


@pytest.mark.slow
def test_segmentor_forward_matches_torch():
    model = Segmentor(3, bilinear=True)
    rng = np.random.default_rng(5)
    x = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    y = rng.normal(size=(1, 32, 32, 3)).astype(np.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(y),
                    train=False)
    p, bs = vs["params"], vs["batch_stats"]

    ts = TorchSegmentor(3).eval()
    ts.inc.load(p["DoubleConv_0"], bs["DoubleConv_0"])
    for i, d in enumerate(ts.downs):
        d.load(p[f"Down_{i}"]["DoubleConv_0"], bs[f"Down_{i}"]["DoubleConv_0"])
    for i, u in enumerate(ts.ups):
        u.load(p[f"Up_{i}"]["DoubleConv_0"], bs[f"Up_{i}"]["DoubleConv_0"])
    _conv_to_torch(ts.outc, p["OutConv_0"]["TorchConv_0"]["Conv_0"])

    ours = np.asarray(model.apply(vs, jnp.asarray(x), jnp.asarray(y), train=False))
    with torch.no_grad():
        theirs = torch_to_nhwc(ts(nhwc_to_torch(x), nhwc_to_torch(y)))
    np.testing.assert_allclose(ours, theirs, atol=5e-4)


# ---------------------------------------------------------------------------
# Discriminator forward parity (eval mode)
# ---------------------------------------------------------------------------


class TorchDiscriminator(tnn.Module):
    """Reference Discriminator_SRGAN_simple semantics (Module.py:192-223)."""

    def __init__(self, nc=3):
        super().__init__()
        self.convs = tnn.ModuleList([
            tnn.Conv2d(nc, 64, 3, 2, 1), tnn.Conv2d(64, 128, 3, 2, 1),
            tnn.Conv2d(128, 256, 3, 2, 1), tnn.Conv2d(256, 512, 3, 2, 1)])
        self.bns = tnn.ModuleList([tnn.BatchNorm2d(c) for c in (128, 256, 512)])
        self.cls1 = tnn.Conv2d(512, 1024, 1)
        self.cls2 = tnn.Conv2d(1024, 1, 1)

    def trunk(self, x):
        x = tF.leaky_relu(self.convs[0](x), 0.2)
        for conv, bn in zip(self.convs[1:], self.bns):
            x = tF.leaky_relu(bn(conv(x)), 0.2)
        return x

    def forward(self, x, y):
        d = tF.adaptive_avg_pool2d(self.trunk(x) - self.trunk(y), 1)
        d = tF.leaky_relu(self.cls1(d), 0.2)
        return torch.sigmoid(self.cls2(d)).view(x.shape[0])


def test_discriminator_forward_matches_torch():
    model = Discriminator(3)
    rng = np.random.default_rng(6)
    x = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    y = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    vs = model.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x), jnp.asarray(y),
                    train=False)
    p, bs = vs["params"], vs["batch_stats"]

    td = TorchDiscriminator(3).eval()
    for i in range(4):
        _conv_to_torch(td.convs[i], p[f"TorchConv_{i}"]["Conv_0"])
    for i in range(3):
        _bn_to_torch(td.bns[i], p[f"BatchNorm_{i}"]["BatchNorm_0"],
                     bs[f"BatchNorm_{i}"]["BatchNorm_0"])
    _conv_to_torch(td.cls1, p["TorchConv_4"]["Conv_0"])
    _conv_to_torch(td.cls2, p["TorchConv_5"]["Conv_0"])

    ours = np.asarray(model.apply(vs, jnp.asarray(x), jnp.asarray(y), train=False))
    with torch.no_grad():
        theirs = td(nhwc_to_torch(x), nhwc_to_torch(y)).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


# ---------------------------------------------------------------------------
# Loss parity: CNetLoss semantics with shared VGG weights
# ---------------------------------------------------------------------------


class TorchVgg(tnn.Module):
    """VGG16 features from the framework's weight dict (shared both ways)."""

    CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
           512, 512, 512, "M", 512, 512, 512, "M")

    def __init__(self, params):
        super().__init__()
        layers = []
        li = 0
        in_c = 3
        for c in self.CFG:
            if c == "M":
                layers.append(tnn.MaxPool2d(2))
            else:
                conv = tnn.Conv2d(in_c, c, 3, padding=1)
                k = params[f"conv{li}_kernel"]  # HWIO
                conv.weight.data = torch.from_numpy(np.transpose(k, (3, 2, 0, 1)).copy())
                conv.bias.data = torch.from_numpy(params[f"conv{li}_bias"].copy())
                layers += [conv, tnn.ReLU()]
                li += 1
                in_c = c
        self.net = tnn.Sequential(*layers)


def torch_cnet_loss(target, generated, cmap, vgg, feature_layers, per_band):
    """Reference CNetLoss semantics (Loss.py:64-95), independent code, NCHW."""
    num_pixel = target.shape[2] * target.shape[3]
    num_wnc = (1 - cmap).sum(dim=(1, 2, 3))
    tm = target * (1 - cmap)
    gm = generated * (1 - cmap)
    gen = 0.0
    for i in range(target.shape[0]):
        gen = gen + (tm[i] - gm[i]).abs().mean() * num_pixel / num_wnc[i]
    gen = gen / target.shape[0]
    l1 = cmap.abs().mean()

    def feats(img):
        outs = []
        h = img
        for idx, layer in enumerate(vgg.net):
            h = layer(h)
            if idx in feature_layers:
                outs.append(h)
        return outs

    perc = 0.0
    n_layers = len(feature_layers)
    if per_band:
        nc = target.shape[1]
        for b in range(nc):
            xb = (target[:, b : b + 1] * (1 - cmap)).repeat(1, 3, 1, 1)
            yb = (generated[:, b : b + 1] * (1 - cmap)).repeat(1, 3, 1, 1)
            for fa, fb in zip(feats(xb), feats(yb)):
                perc = perc + tF.mse_loss(fa, fb) / n_layers / nc
    else:
        xm = target[:, :3] * (1 - cmap)
        ym = generated[:, :3] * (1 - cmap)
        for fa, fb in zip(feats(xm), feats(ym)):
            perc = perc + tF.mse_loss(fa, fb) / n_layers
    return float(gen.detach()), float(l1.detach()), float(perc.detach())


@pytest.mark.parametrize("per_band", [False, True])
def test_cnet_loss_matches_torch(per_band):
    rng = np.random.default_rng(1)
    t = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    g = rng.uniform(size=(2, 48, 48, 3)).astype(np.float32)
    cmap = rng.uniform(0.1, 0.4, size=(2, 48, 48, 1)).astype(np.float32)
    vggp = load_vgg16_params()

    # torch path needs relu layer indices: conv->relu pairs from our layout
    # our tap list index 3 == relu1_2 in the sequential (conv,relu,conv,relu,pool..)
    feature_layers = (3,)
    tv = TorchVgg(vggp).eval()
    want_gen, want_l1, want_perc = torch_cnet_loss(
        nhwc_to_torch(t), nhwc_to_torch(g), nhwc_to_torch(cmap), tv,
        feature_layers, per_band)

    got_gen, got_l1, got_perc, _ = cnet_loss(
        jnp.asarray(t), jnp.asarray(g), jnp.asarray(cmap), vggp,
        feature_layers=feature_layers, perception_per_band=per_band,
        msssim_weights=(0.5, 0.5))
    assert float(got_gen) == pytest.approx(want_gen, rel=1e-4)
    assert float(got_l1) == pytest.approx(want_l1, rel=1e-5)
    assert float(got_perc) == pytest.approx(want_perc, rel=1e-3)


def test_region_loss_matches_torch():
    rng = np.random.default_rng(2)
    cmap = rng.uniform(size=(3, 16, 16, 1)).astype(np.float32)
    region = (rng.uniform(size=(3, 16, 16, 1)) > 0.6).astype(np.float32)
    region[2] = 0.0  # empty -> skipped

    tc = nhwc_to_torch(cmap)
    tr = nhwc_to_torch(region)
    num_pixel = 16 * 16
    want = 0.0
    crit = tnn.L1Loss()
    for i in range(3):
        nr = tr[i].sum()
        if nr == 0:
            continue
        want = want + float(crit(tc[i] * tr[i], torch.zeros_like(tr[i]))) * num_pixel / float(nr)
    want /= 3
    got = float(region_loss(jnp.asarray(cmap), jnp.asarray(region), "l1"))
    assert got == pytest.approx(want, rel=1e-5)


# ---------------------------------------------------------------------------
# Optimizer update parity
# ---------------------------------------------------------------------------


def _torch_steps(opt_cls, kwargs, grads_seq, p0, lr):
    p = torch.tensor(p0.copy(), requires_grad=True)
    opt = opt_cls([p], lr=lr, **kwargs)
    for gstep in grads_seq:
        opt.zero_grad()
        p.grad = torch.tensor(gstep)
        opt.step()
    return p.detach().numpy()


def _ours_steps(tx, grads_seq, p0, lr):
    params = {"w": jnp.asarray(p0)}
    opt_state = tx.init(params)
    for gstep in grads_seq:
        params, opt_state = apply_updates(params, opt_state, {"w": jnp.asarray(gstep)}, tx, lr)
    return np.asarray(params["w"])


def test_adam_matches_torch():
    rng = np.random.default_rng(3)
    p0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]
    want = _torch_steps(torch.optim.Adam, dict(betas=(0.9, 0.99)), grads, p0, 2e-4)
    got = _ours_steps(adam(), grads, p0, 2e-4)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_rmsprop_matches_torch():
    rng = np.random.default_rng(4)
    p0 = rng.normal(size=(7,)).astype(np.float32)
    grads = [rng.normal(size=(7,)).astype(np.float32) for _ in range(5)]
    want = _torch_steps(torch.optim.RMSprop, dict(), grads, p0, 1e-3)
    got = _ours_steps(rmsprop(), grads, p0, 1e-3)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-7)


def test_lr_schedule_matches_reference_formula():
    # independent re-derivation of CommonFunc.py:23-37
    def ref_lr(epoch, lr_start, lr_max, lr_min, w, s, decay):
        if epoch < w:
            return (lr_max - lr_start) / w * epoch + lr_start
        if epoch < w + s:
            return lr_max
        return (lr_max - lr_min) * decay ** (epoch - w - s) + lr_min

    sched = WarmupSustainDecay(1e-5, 3e-4, 1e-6, 10, 10, 0.8)
    for e in range(0, 60, 3):
        assert sched(e) == pytest.approx(ref_lr(e, 1e-5, 3e-4, 1e-6, 10, 10, 0.8))
