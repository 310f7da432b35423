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
    """Save a NetState under ``path`` (an orbax directory, e.g. SModel.ckpt).

    Multi-host: EVERY process must make this call — orbax's save is itself
    collective (it runs sync_global_devices barriers internally), so gating
    it to process 0 deadlocks/mismatches against any other barrier the rest
    of the pod reaches. Orbax's host-array type handler already makes the
    primary host the single writer for the replicated state, which is the
    write-once behavior wanted on shared storage."""
    payload = {"params": state.params, "batch_stats": state.batch_stats}
    if include_opt and state.opt_state is not None:
        payload["opt_state"] = state.opt_state
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), _to_host(payload), force=True)
    ckptr.wait_until_finished()


def _graft(tpl_tree, raw_tree):
    treedef = jax.tree.structure(tpl_tree)
    leaves = jax.tree.leaves(raw_tree)
    return jax.tree.unflatten(treedef, leaves)


def restore_net(path: str, template: NetState) -> NetState:
    """Restore into the shape of ``template`` (opt_state optional on disk).

    The raw tree is restored without a template (orbax's strict matching
    rejects optax's empty-namedtuple states) and its leaves are grafted back
    into the template's pytree structure — leaf order is stable because both
    sides flatten dict keys sorted and sequences in order, and empty nodes
    contribute no leaves."""
    ckptr = ocp.PyTreeCheckpointer()
    raw = ckptr.restore(os.path.abspath(path))

    params = _graft(template.params, raw["params"])
    batch_stats = _graft(template.batch_stats, raw["batch_stats"])
    opt_state = template.opt_state
    if template.opt_state is not None and "opt_state" in raw:
        opt_state = _graft(template.opt_state, raw["opt_state"])
    return NetState(params=params, batch_stats=batch_stats, opt_state=opt_state)


def restore_net_any(path: str, template: NetState, kind: str = "") -> NetState:
    """Restore from either an orbax ``.ckpt`` dir or a reference torch
    ``state_dict`` pickle (``SModel/GModel/DModel*.pkl``, Demo_USSS.py:477-481),
    auto-converted via io/torch_interop — reference users' trained pickles
    load directly into the drivers and the serving tool."""
    if os.path.isfile(path):  # orbax checkpoints are directories
        import torch

        from .torch_interop import torch_to_variables

        sd = torch.load(path, map_location="cpu", weights_only=True)
        v = torch_to_variables(sd, kind or None)
        return NetState(params=_graft(template.params, v["params"]),
                        batch_stats=_graft(template.batch_stats, v["batch_stats"]),
                        opt_state=template.opt_state)
    return restore_net(path, template)


class TrainCheckpointer:
    """Periodic in-training checkpoints: every phase resumable at epoch
    granularity (a strict superset of the reference's end-of-run saves,
    SURVEY.md section 5).

    Saves each network's full NetState (params + BN stats + optimizer state)
    plus a meta record (phase name, last completed epoch). Resume restores
    states and reports where to continue; the data shuffle order is re-derived
    from the seed, not persisted (documented approximation)."""

    def __init__(self, directory: str, every: int = 0):
        self.dir = directory
        self.every = int(every)

    @property
    def enabled(self) -> bool:
        return self.every > 0

    def _meta_path(self) -> str:
        return os.path.join(self.dir, "meta.json")

    def exists(self) -> bool:
        return os.path.exists(self._meta_path())

    def due(self, epoch: int) -> bool:
        """True when ``maybe_save`` after ``epoch`` will write. Drivers use
        this to run checkpoint epochs inline instead of deferring them: the
        save closure would otherwise capture donated state buffers that the
        next epoch's step deletes on TPU."""
        return self.enabled and (epoch + 1) % self.every == 0

    def maybe_save(self, phase: str, epoch: int, **states) -> bool:
        """Save after ``epoch`` when it hits the cadence. Returns True if saved."""
        if not self.enabled or (epoch + 1) % self.every != 0:
            return False
        import json

        os.makedirs(self.dir, exist_ok=True)
        for name, state in states.items():
            save_net(os.path.join(self.dir, f"{name}.ckpt"), state)
        with open(self._meta_path(), "w") as f:
            json.dump({"phase": phase, "epoch": epoch}, f)
        return True

    def restore(self, templates: dict):
        """(states dict, meta dict) — templates supply pytree structure."""
        import json

        with open(self._meta_path()) as f:
            meta = json.load(f)
        states = {}
        for name, tpl in templates.items():
            path = os.path.join(self.dir, f"{name}.ckpt")
            states[name] = restore_net(path, tpl) if os.path.exists(path) else tpl
        return states, meta

    @staticmethod
    def start_epochs(meta: Optional[dict], phase_order) -> dict:
        """Per-phase start epochs implied by a meta record.

        Phases before the recorded one are complete (their start = a large
        sentinel handled by the caller's range()), the recorded phase resumes
        at epoch+1, later phases start at 0."""
        starts = {p: 0 for p in phase_order}
        if not meta:
            return starts
        seen = False
        for p in phase_order:
            if p == meta["phase"]:
                starts[p] = meta["epoch"] + 1
                seen = True
            elif not seen:
                starts[p] = 10**9  # completed phase: skip entirely
        return starts


def model_g_reuse(
    g_model_dir: str,
    template: NetState,
    init_num_epochs_g: int,
    enabled: bool = True,
    name: str = "GModel.ckpt",
):
    """Generator-reuse shortcut (parity: Demo_WSSS.py:131-135).

    Returns (state, epochs): when enabled and the checkpoint exists, the
    pretrained generator is loaded and the pretrain epoch count becomes 0.
    A reference-trained ``GModel.pkl`` cache in the same directory is
    honored too (converted on load via io/torch_interop)."""
    path = os.path.join(g_model_dir, name)
    if enabled and os.path.exists(path):
        return restore_net(path, template), 0
    pkl = os.path.join(g_model_dir, os.path.splitext(name)[0] + ".pkl")
    if enabled and os.path.isfile(pkl):
        return restore_net_any(pkl, template, kind="generator"), 0
    return template, init_num_epochs_g
