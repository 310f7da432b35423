"""_phase_pool_exit (models/vgg.py): value + VJP parity with the composite
where + reduce_window under XLA's default gradients, including tie routing."""

import numpy as np

import jax
import jax.numpy as jnp

from fcdgan_tpu.models.vgg import _phase_pool_exit


def _composite(h):
    c = h.shape[-1] // 2
    a, b = h[..., :c], h[..., c:]
    m = jnp.where(a >= b, a, b)
    return jax.lax.reduce_window(
        m, -jnp.inf, jax.lax.max, (1, 2, 1, 1), (1, 2, 1, 1), "VALID"
    )


def test_phase_pool_exit_matches_composite():
    rng = np.random.default_rng(0)
    h = rng.normal(size=(3, 12, 10, 16)).astype(np.float32)
    # inject ties: duplicate some phase pairs and H pairs
    h[0, :, :, :8] = h[0, :, :, 8:]          # phase ties
    h[1, 0::2] = h[1, 1::2]                  # H-pair ties
    h[2, 2:4, 3:5] = 1.25                    # block of full ties
    hj = jnp.asarray(h)

    y0 = _composite(hj)
    y1 = _phase_pool_exit(hj)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))

    dy = jnp.asarray(rng.normal(size=y0.shape).astype(np.float32))
    g0 = jax.vjp(_composite, hj)[1](dy)[0]
    g1 = jax.vjp(_phase_pool_exit, hj)[1](dy)[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_phase_pool_exit_odd_height():
    rng = np.random.default_rng(1)
    hj = jnp.asarray(rng.normal(size=(2, 9, 6, 8)).astype(np.float32))
    y0, y1 = _composite(hj), _phase_pool_exit(hj)
    np.testing.assert_array_equal(np.asarray(y0), np.asarray(y1))
    dy = jnp.asarray(rng.normal(size=y0.shape).astype(np.float32))
    g0 = jax.vjp(_composite, hj)[1](dy)[0]
    g1 = jax.vjp(_phase_pool_exit, hj)[1](dy)[0]
    np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))
