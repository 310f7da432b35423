"""Optimizers with torch-exact update semantics, LR injected per step.

The reference mutates optimizer LR once per epoch (CommonFunc.py:23-37).
Here every transform is built **without** a learning rate and the jitted train
step multiplies the update by the epoch's LR — no recompilation, no
hyperparam-injection pytree surgery.

  * :func:`adam` — torch Adam semantics (bias correction, eps outside the
    bias-corrected sqrt). The demos use betas (0.9, 0.99) (Demo_USSS.py:121).
  * :func:`rmsprop` — torch RMSprop semantics: alpha 0.99, eps added
    **outside** sqrt, no bias correction ("according to WGAN",
    Demo_WSSS.py:120-122).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax


def adam(b1: float = 0.9, b2: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    """Unit-LR torch-Adam: chain(scale_by_adam, scale(-1))."""
    return optax.chain(
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps, eps_root=0.0),
        optax.scale(-1.0),
    )


class RmsPropState(NamedTuple):
    sq_avg: optax.Updates


def _scale_by_torch_rms(alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    def init(params):
        return RmsPropState(sq_avg=jax.tree.map(jnp.zeros_like, params))

    def update(updates, state, params=None):
        sq = jax.tree.map(
            lambda s, g: alpha * s + (1 - alpha) * (g * g), state.sq_avg, updates
        )
        out = jax.tree.map(lambda g, s: g / (jnp.sqrt(s) + eps), updates, sq)
        return out, RmsPropState(sq_avg=sq)

    return optax.GradientTransformation(init, update)


def rmsprop(alpha: float = 0.99, eps: float = 1e-8) -> optax.GradientTransformation:
    """Unit-LR torch-RMSprop (eps outside sqrt, no bias correction)."""
    return optax.chain(_scale_by_torch_rms(alpha, eps), optax.scale(-1.0))


def apply_updates(params, opt_state, grads, tx: optax.GradientTransformation, lr):
    """One optimizer step with the LR applied multiplicatively."""
    updates, opt_state = tx.update(grads, opt_state, params)
    updates = jax.tree.map(lambda u: u * lr, updates)
    return optax.apply_updates(params, updates), opt_state
