"""Checkpointing: orbax-backed save/restore + the modelG_reuse protocol.

The reference saves ``state_dict`` pickles at end of run only
(SModel/GModel/DModel .pkl, Demo_USSS.py:477-481) and its single resume path
is generator reuse: if ``GModel.pkl`` exists, load it and skip G pretraining
(Demo_WSSS.py:131-135, Demo_RSSS.py:167-171). This module keeps that protocol
(same decision logic, orbax format under a ``.ckpt`` directory) and extends it
with full NetState checkpoints (params + BN stats + optimizer state) so every
phase is resumable — a strict superset of the reference (SURVEY.md section 5).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..train.state import NetState


def _to_host(tree):
    return jax.tree.map(lambda x: np.asarray(x), tree)


def save_net(path: str, state: NetState, include_opt: bool = True) -> None:
    """Save a NetState under ``path`` (an orbax directory, e.g. SModel.ckpt)."""
    payload = {"params": state.params, "batch_stats": state.batch_stats}
    if include_opt and state.opt_state is not None:
        payload["opt_state"] = state.opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_host(payload), force=True)
    ckptr.wait_until_finished()


def restore_net(path: str, template: NetState) -> NetState:
    """Restore into the shape of ``template`` (opt_state optional on disk).

    The raw tree is restored without a template (orbax's strict matching
    rejects optax's empty-namedtuple states) and its leaves are grafted back
    into the template's pytree structure — leaf order is stable because both
    sides flatten dict keys sorted and sequences in order, and empty nodes
    contribute no leaves."""
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))

    def graft(tpl_tree, raw_tree):
        treedef = jax.tree.structure(tpl_tree)
        leaves = jax.tree.leaves(raw_tree)
        return jax.tree.unflatten(treedef, leaves)

    params = graft(template.params, raw["params"])
    batch_stats = graft(template.batch_stats, raw["batch_stats"])
    opt_state = template.opt_state
    if template.opt_state is not None and "opt_state" in raw:
        opt_state = graft(template.opt_state, raw["opt_state"])
    return NetState(params=params, batch_stats=batch_stats, opt_state=opt_state)


def model_g_reuse(
    g_model_dir: str,
    template: NetState,
    init_num_epochs_g: int,
    enabled: bool = True,
    name: str = "GModel.ckpt",
):
    """Generator-reuse shortcut (parity: Demo_WSSS.py:131-135).

    Returns (state, epochs): when enabled and the checkpoint exists, the
    pretrained generator is loaded and the pretrain epoch count becomes 0."""
    path = os.path.join(g_model_dir, name)
    if enabled and os.path.exists(path):
        return restore_net(path, template), 0
    return template, init_num_epochs_g
