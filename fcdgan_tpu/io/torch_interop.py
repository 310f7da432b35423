"""Bidirectional mapping between reference PyTorch ``state_dict`` pickles
and this framework's flax variable trees.

The reference persists models as ``torch.save(net.state_dict(), '*.pkl')``
(Demo_USSS.py:477-481, Demo_WSSS.py:454-461, Demo_RSSS.py:506-514). A user
switching frameworks carries those pickles; this module converts them into
the exact param/batch_stats trees our ``Segmentor``/``Generator``/
``Discriminator`` init (so any driver or the serving tool can load them),
and converts our checkpoints back into reference-keyed state_dicts torch
can ``load_state_dict`` strictly.

Key structure follows the reference module layout (Module.py):
  Segmentor     inc/down1-4/up1-4/outc with nn.Sequential ``double_conv``
                indices {0 conv, 1 bn, 3 conv, 4 bn} (Module.py:25-32,
                43-46, 59-64, 85, 101-111)
  Generator     block1 Sequential(conv9x9, PReLU), block2-6 ResidualBlock
                (conv1/bn1/prelu/conv2/bn2), block7 Sequential(conv, bn),
                block8 conv9x9 (Module.py:145-158, 174-181)
  Discriminator net Sequential convs at {0,2,5,8}, bns at {3,6,9};
                classifier convs at {1,3} (Module.py:195-217)

Layouts: torch conv weight (O,I,kh,kw) <-> flax kernel (kh,kw,I,O); BN
weight/bias/running_mean/running_var <-> scale/bias + batch_stats mean/var;
PReLU weight <-> alpha. ``num_batches_tracked`` is ignored on import and
emitted as int64(0) on export (torch's strict load expects it).

Only the bilinear Segmentor decoder is supported — every reference demo
constructs ``Segmentor(..., bilinear=True)`` (Demo_USSS.py:110,
Demo_WSSS.py:106, Demo_RSSS.py:140); a ConvTranspose checkpoint
(``up1.up.weight`` present) raises with that explanation.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np

KINDS = ("segmentor", "generator", "discriminator")


def _doubleconv_units(tp: str, fp: str) -> List[Tuple[str, str, str]]:
    return [
        ("conv", f"{tp}.0", f"{fp}/TorchConv_0/Conv_0"),
        ("bn", f"{tp}.1", f"{fp}/BatchNorm_0/BatchNorm_0"),
        ("conv", f"{tp}.3", f"{fp}/TorchConv_1/Conv_0"),
        ("bn", f"{tp}.4", f"{fp}/BatchNorm_1/BatchNorm_0"),
    ]


def units(kind: str) -> List[Tuple[str, str, str]]:
    """(unit type, torch prefix, flax path) triples, in reference order."""
    if kind == "segmentor":
        u = _doubleconv_units("inc.double_conv", "DoubleConv_0")
        for i in range(4):
            u += _doubleconv_units(
                f"down{i + 1}.maxpool_conv.1.double_conv", f"Down_{i}/DoubleConv_0")
        for i in range(4):
            u += _doubleconv_units(f"up{i + 1}.conv.double_conv",
                                   f"Up_{i}/DoubleConv_0")
        u.append(("conv", "outc.conv", "OutConv_0/TorchConv_0/Conv_0"))
        return u
    if kind == "generator":
        u = [("conv", "block1.0", "TorchConv_0/Conv_0"),
             ("prelu", "block1.1", "PReLU_0")]
        for i in range(5):
            b, f = f"block{i + 2}", f"ResidualBlock_{i}"
            u += [
                ("conv", f"{b}.conv1", f"{f}/TorchConv_0/Conv_0"),
                ("bn", f"{b}.bn1", f"{f}/BatchNorm_0/BatchNorm_0"),
                ("prelu", f"{b}.prelu", f"{f}/PReLU_0"),
                ("conv", f"{b}.conv2", f"{f}/TorchConv_1/Conv_0"),
                ("bn", f"{b}.bn2", f"{f}/BatchNorm_1/BatchNorm_0"),
            ]
        u += [("conv", "block7.0", "TorchConv_1/Conv_0"),
              ("bn", "block7.1", "BatchNorm_0/BatchNorm_0"),
              ("conv", "block8", "TorchConv_2/Conv_0")]
        return u
    if kind == "discriminator":
        u = []
        for i, ti in enumerate((0, 2, 5, 8)):
            u.append(("conv", f"net.{ti}", f"TorchConv_{i}/Conv_0"))
        for i, ti in enumerate((3, 6, 9)):
            u.append(("bn", f"net.{ti}", f"BatchNorm_{i}/BatchNorm_0"))
        u += [("conv", "classifier.1", "TorchConv_4/Conv_0"),
              ("conv", "classifier.3", "TorchConv_5/Conv_0")]
        return u
    raise ValueError(f"unknown model kind {kind!r}; expected one of {KINDS}")


def detect_torch_kind(sd) -> str:
    if any(k.startswith("inc.double_conv.") for k in sd):
        return "segmentor"
    if any(k.startswith("block1.0.") for k in sd):
        return "generator"
    if any(k.startswith("net.0.") for k in sd):
        return "discriminator"
    raise ValueError("state_dict does not look like a reference "
                     "Segmentor/Generator/Discriminator_SRGAN_simple")


def detect_flax_kind(params: Dict) -> str:
    if "OutConv_0" in params:
        return "segmentor"
    if "ResidualBlock_0" in params:
        return "generator"
    if "TorchConv_5" in params:
        return "discriminator"
    raise ValueError("params tree does not look like a "
                     "Segmentor/Generator/Discriminator")


def _set(tree: Dict, path: str, value: np.ndarray) -> None:
    parts = path.split("/")
    for p in parts[:-1]:
        tree = tree.setdefault(p, {})
    tree[parts[-1]] = value


def _get(tree: Dict, path: str) -> np.ndarray:
    for p in path.split("/"):
        tree = tree[p]
    return tree


def _np(x) -> np.ndarray:
    if hasattr(x, "detach"):  # torch tensor without importing torch
        x = x.detach().cpu().numpy()
    return np.asarray(x)


def torch_to_variables(sd: Dict, kind: Optional[str] = None) -> Dict:
    """Reference state_dict -> {'params': ..., 'batch_stats': ...} trees
    matching what the corresponding flax model's ``init`` produces."""
    sd = {k: _np(v) for k, v in sd.items()}
    detected = detect_torch_kind(sd)
    if kind and kind != detected:
        raise ValueError(
            f"state_dict looks like a {detected} but a {kind} was expected "
            f"(e.g. a GModel.pkl passed where an SModel is required)")
    kind = detected
    if kind == "segmentor" and "up1.up.weight" in sd:
        raise NotImplementedError(
            "ConvTranspose (bilinear=False) Segmentor checkpoints are not "
            "supported; every reference demo uses bilinear=True "
            "(Demo_USSS.py:110)")
    params: Dict = {}
    stats: Dict = {}
    used = set()
    for typ, tkey, fpath in units(kind):
        if typ == "conv":
            w = sd[f"{tkey}.weight"]
            _set(params, f"{fpath}/kernel",
                 np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0))))
            _set(params, f"{fpath}/bias", sd[f"{tkey}.bias"])
            used |= {f"{tkey}.weight", f"{tkey}.bias"}
        elif typ == "bn":
            _set(params, f"{fpath}/scale", sd[f"{tkey}.weight"])
            _set(params, f"{fpath}/bias", sd[f"{tkey}.bias"])
            _set(stats, f"{fpath}/mean", sd[f"{tkey}.running_mean"])
            _set(stats, f"{fpath}/var", sd[f"{tkey}.running_var"])
            used |= {f"{tkey}.weight", f"{tkey}.bias",
                     f"{tkey}.running_mean", f"{tkey}.running_var",
                     f"{tkey}.num_batches_tracked"}
        else:  # prelu
            _set(params, f"{fpath}/alpha", sd[f"{tkey}.weight"])
            used.add(f"{tkey}.weight")
    leftover = set(sd) - used
    if leftover:
        raise ValueError(
            f"unrecognized state_dict keys for kind={kind}: {sorted(leftover)[:8]}")
    return {"params": params, "batch_stats": stats}


def variables_to_torch(params: Dict, batch_stats: Dict,
                       kind: Optional[str] = None) -> Dict[str, np.ndarray]:
    """Flax param/batch_stats trees -> reference-keyed state_dict arrays
    (convert to torch tensors with ``torch.from_numpy`` before
    ``load_state_dict``; `num_batches_tracked` entries are int64 zeros)."""
    kind = kind or detect_flax_kind(params)
    out: Dict[str, np.ndarray] = {}
    for typ, tkey, fpath in units(kind):
        if typ == "conv":
            k = _np(_get(params, f"{fpath}/kernel"))
            out[f"{tkey}.weight"] = np.ascontiguousarray(
                np.transpose(k, (3, 2, 0, 1)).astype(np.float32))
            out[f"{tkey}.bias"] = _np(_get(params, f"{fpath}/bias")).astype(np.float32)
        elif typ == "bn":
            out[f"{tkey}.weight"] = _np(_get(params, f"{fpath}/scale")).astype(np.float32)
            out[f"{tkey}.bias"] = _np(_get(params, f"{fpath}/bias")).astype(np.float32)
            out[f"{tkey}.running_mean"] = _np(
                _get(batch_stats, f"{fpath}/mean")).astype(np.float32)
            out[f"{tkey}.running_var"] = _np(
                _get(batch_stats, f"{fpath}/var")).astype(np.float32)
            out[f"{tkey}.num_batches_tracked"] = np.zeros((), np.int64)
        else:  # prelu
            out[f"{tkey}.weight"] = _np(_get(params, f"{fpath}/alpha")).astype(np.float32)
    return out
