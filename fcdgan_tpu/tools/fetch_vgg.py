"""One-shot, sha-pinned VGG16 perception-weight fetch + convert.

The perception loss wants the frozen torchvision-pretrained VGG16 features
(/root/reference/Loss.py:25-34). This image has zero egress, so the asset
cannot be produced HERE (VGG16_WEIGHTS.md) — this tool is the bit-reproducible
recipe for any egress-capable machine:

    python -m fcdgan_tpu.tools.fetch_vgg --verify-sha \
        --out fcdgan_tpu/assets/vgg16_features.npz

It downloads torchvision's pinned checkpoint, verifies its sha256 against the
url-embedded prefix (torchvision's own integrity convention: the filename
``vgg16-397923af.pth`` carries the digest's first 8 hex chars) and any full
``--sha256`` pin, converts the 13 feature convs to the ``.npz`` schema that
``models/vgg.py::load_vgg16_params`` consumes (HWIO kernels, keys
``conv{i}_kernel``/``conv{i}_bias`` — same schema as tools/convert_vgg.py,
round-trip pinned by tests/test_vgg_substitution.py), and writes the zip
members with a FIXED timestamp so the output npz is byte-identical across
machines and runs (its sha256 is printed for pinning). Copy the npz into
``fcdgan_tpu/assets/`` (or point ``$FCDGAN_VGG16_NPZ`` at it) and every
driver picks it up — no code change.

Needs only ``torch`` (to deserialize the .pth) + ``numpy`` — NOT torchvision.
"""

from __future__ import annotations

import argparse
import hashlib
import io
import os
import sys
import zipfile

import numpy as np

# torchvision's published IMAGENET1K_V1 VGG16 checkpoint. The 8-hex suffix in
# the filename is the sha256 prefix torchvision itself verifies on download.
VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
VGG16_SHA256_PREFIX = "397923af"

# conv layer positions inside vgg16().features (state_dict keys
# features.{i}.weight) — the 13 convs of configuration 'D'
_CONV_IDX = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def download(url: str, dest: str) -> str:
    import urllib.request

    print(f"downloading {url} -> {dest}")
    urllib.request.urlretrieve(url, dest)
    return dest


def convert_state_dict(pth_path: str) -> dict:
    """Map the torchvision .pth state_dict to the npz schema (no torchvision
    import: keys are stable ``features.{i}.weight``/``.bias``)."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    params = {}
    for li, i in enumerate(_CONV_IDX):
        w = sd[f"features.{i}.weight"].numpy()  # (O, I, KH, KW)
        b = sd[f"features.{i}.bias"].numpy()
        params[f"conv{li}_kernel"] = np.transpose(w, (2, 3, 1, 0))  # HWIO
        params[f"conv{li}_bias"] = b
    return params


def write_npz_reproducible(out_path: str, params: dict) -> None:
    """np.savez writes zip members stamped with the CURRENT time — two runs
    produce different bytes. Write the same .npy members with a fixed
    timestamp so the artifact hash is pinnable."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with zipfile.ZipFile(out_path, "w", zipfile.ZIP_STORED) as zf:
        for name in sorted(params):
            buf = io.BytesIO()
            np.lib.format.write_array(buf, np.asarray(params[name]),
                                      allow_pickle=False)
            info = zipfile.ZipInfo(name + ".npy", date_time=(1980, 1, 1, 0, 0, 0))
            zf.writestr(info, buf.getvalue())


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(__file__), "..", "assets", "vgg16_features.npz"))
    ap.add_argument("--pth", default=None,
                    help="already-downloaded vgg16-397923af.pth (skips egress)")
    ap.add_argument("--url", default=VGG16_URL)
    ap.add_argument("--sha256", default=None,
                    help="full sha256 pin for the downloaded .pth (optional; "
                         "the url-embedded 8-hex prefix is always enforced)")
    ap.add_argument("--verify-sha", action="store_true",
                    help="verify digests (prefix + any --sha256 pin) and "
                         "print the full sha256 of both artifacts")
    args = ap.parse_args(argv)

    pth = args.pth or download(args.url, os.path.join(
        os.path.dirname(os.path.abspath(args.out)), os.path.basename(args.url)))

    digest = _sha256(pth)
    print(f"sha256({os.path.basename(pth)}) = {digest}")
    if args.verify_sha or args.sha256:
        prefix = os.path.splitext(os.path.basename(args.url))[0].rsplit("-", 1)[-1]
        if not digest.startswith(prefix):
            print(f"ERROR: sha256 prefix mismatch: expected {prefix}…", file=sys.stderr)
            return 1
        if args.sha256 and digest != args.sha256.lower():
            print("ERROR: sha256 does not match the --sha256 pin", file=sys.stderr)
            return 1
        print("sha256 verified")

    params = convert_state_dict(pth)
    assert len(params) == 2 * len(_CONV_IDX)
    write_npz_reproducible(args.out, params)
    print(f"wrote {len(_CONV_IDX)} conv layers to {args.out}")
    print(f"sha256({os.path.basename(args.out)}) = {_sha256(args.out)}  "
          "(bit-reproducible: fixed zip timestamps)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
