"""Per-network train state: params + BatchNorm stats + optimizer state."""

from __future__ import annotations

from typing import Any, Tuple

import jax
from flax import struct
from flax.core import FrozenDict


@struct.dataclass
class NetState:
    """One network's mutable training state (a pytree; jit/donate friendly)."""

    params: Any
    batch_stats: Any
    opt_state: Any = None

    @property
    def variables(self):
        return {"params": self.params, "batch_stats": self.batch_stats}


def create_net_state(model, rng, example_inputs: Tuple, tx=None, train: bool = True) -> NetState:
    """Initialize a flax model and (optionally) its optimizer state.

    Both inits run under jit: eager initialization dispatches one device op
    per layer, which is prohibitively slow on remote-dispatch TPU runtimes
    (~100x slower than a single compiled program)."""
    import functools

    init_fn = jax.jit(functools.partial(model.init, train=train))
    variables = init_fn({"params": rng}, *example_inputs)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    opt_state = jax.jit(tx.init)(params) if tx is not None else None
    return NetState(params=params, batch_stats=batch_stats, opt_state=opt_state)
