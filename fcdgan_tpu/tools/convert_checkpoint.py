"""Convert checkpoints between the reference's torch .pkl format and ours.

The reference saves ``torch.save(net.state_dict(), 'SModel....pkl')``
(Demo_USSS.py:477-481); this framework saves orbax ``.ckpt`` directories
(io/checkpoint.py). This tool converts both ways, so

  * reference users bring their trained pickles straight to the TPU
    drivers / serving tool (``--model-g-reuse`` caches included), and
  * models trained here can be handed back to a torch deployment.

Run:
  python -m fcdgan_tpu.tools.convert_checkpoint --src SModel.pkl --dst SModel.ckpt
  python -m fcdgan_tpu.tools.convert_checkpoint --src GModel.ckpt --dst GModel.pkl

Direction and model kind are inferred (``.pkl`` file vs ``.ckpt`` orbax
dir; Segmentor/Generator/Discriminator detected from the key structure);
``--model`` overrides detection. Conversions are exact float32 round-trips
of params + BN running stats; optimizer state is not carried (the
reference never saves it).
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Dict, Optional

import numpy as np


@dataclasses.dataclass
class ConvertConfig:
    src: str = ""
    dst: str = ""
    model: str = ""          # '' = autodetect | segmentor|generator|discriminator
    platform: str = "cpu"    # conversion is pure host work; never touch the TPU


def _load_torch_pickle(path: str) -> Dict:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if not isinstance(sd, dict):
        raise SystemExit(f"{path}: expected a state_dict pickle")
    return sd


def pkl_to_ckpt(src: str, dst: str, kind: Optional[str] = None) -> Dict:
    from ..io.checkpoint import save_net
    from ..io.torch_interop import detect_torch_kind, torch_to_variables
    from ..train.state import NetState

    sd = _load_torch_pickle(src)
    kind = kind or detect_torch_kind(sd)
    variables = torch_to_variables(sd, kind)
    save_net(dst, NetState(params=variables["params"],
                           batch_stats=variables["batch_stats"],
                           opt_state=None), include_opt=False)
    return {"src": src, "dst": dst, "model": kind, "direction": "pkl->ckpt",
            "keys": len(sd)}


def ckpt_to_pkl(src: str, dst: str, kind: Optional[str] = None) -> Dict:
    import orbax.checkpoint as ocp
    import torch

    from ..io.torch_interop import detect_flax_kind, variables_to_torch

    raw = ocp.PyTreeCheckpointer().restore(os.path.abspath(src))
    kind = kind or detect_flax_kind(raw["params"])
    sd_np = variables_to_torch(raw["params"], raw["batch_stats"], kind)
    sd = {k: torch.from_numpy(np.ascontiguousarray(v)) for k, v in sd_np.items()}
    torch.save(sd, dst)
    return {"src": src, "dst": dst, "model": kind, "direction": "ckpt->pkl",
            "keys": len(sd)}


def run(cfg: ConvertConfig) -> Dict:
    if cfg.platform:
        import jax

        jax.config.update("jax_platforms", cfg.platform)
    if not cfg.src or not cfg.dst:
        raise SystemExit("--src and --dst are required")
    kind = cfg.model or None
    if os.path.isdir(cfg.src):  # orbax checkpoints are directories
        out = ckpt_to_pkl(cfg.src, cfg.dst, kind)
    else:
        out = pkl_to_ckpt(cfg.src, cfg.dst, kind)
    print(json.dumps(out))
    return out


def main(argv=None):
    from ..config import parse_cli

    run(parse_cli(ConvertConfig, argv))


if __name__ == "__main__":
    main()
