"""Madam: the NNMF multiplicative optimizer as an optax transform.

Reference: nnmf/optimizer.py:11-244.  ``Madam`` subclasses torch Adam; param
groups flagged ``nnmf: True`` take the ``madam`` path whose single-tensor
update ends in a MULTIPLICATIVE step (optimizer.py:224,244):

    m <- lerp(m, g, 1-b1);  v <- b2 v + (1-b2) g^2
    denom = sqrt(v)/sqrt(1-b2^t) + eps
    p <- p * (0.5 * tanh(-(lr/(1-b1^t)) * m/denom) + 1.0)

The factor lives in (0.5, 1.5), so positive NNMF weights stay positive.
Weight decay is added into the gradient first (torch-style L2).

Non-nnmf groups use stock adam — composed in train/optim.py via
optax.multi_transform with name-based routing (network.py:90-96).
"""

from __future__ import annotations

from typing import NamedTuple

import chex
import jax
import jax.numpy as jnp
import optax


class ScaleByMadamState(NamedTuple):
    count: chex.Array
    mu: optax.Updates
    nu: optax.Updates


def scale_by_madam(
    learning_rate,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.0,
) -> optax.GradientTransformation:
    """Returns updates u with p + u == p * madam_factor (optimizer.py:224-244)."""

    def init_fn(params):
        return ScaleByMadamState(
            count=jnp.zeros((), jnp.int32),
            mu=jax.tree_util.tree_map(jnp.zeros_like, params),
            nu=jax.tree_util.tree_map(jnp.zeros_like, params),
        )

    def update_fn(updates, state, params):
        assert params is not None, "scale_by_madam requires params"
        count = state.count + 1
        if weight_decay:
            updates = jax.tree_util.tree_map(
                lambda g, p: g + weight_decay * p, updates, params
            )
        mu = jax.tree_util.tree_map(
            lambda m, g: m + (1.0 - b1) * (g - m), state.mu, updates
        )
        nu = jax.tree_util.tree_map(
            lambda v, g: b2 * v + (1.0 - b2) * g * g, state.nu, updates
        )
        bc1 = 1.0 - b1**count.astype(jnp.float32)
        bc2 = 1.0 - b2**count.astype(jnp.float32)
        lr = learning_rate(state.count) if callable(learning_rate) else learning_rate
        step_size = lr / bc1

        def factor_minus_one(m, v, p):
            denom = jnp.sqrt(v) / jnp.sqrt(bc2) + eps
            factor = 0.5 * jnp.tanh(-step_size * (m / denom)) + 1.0
            return p * (factor - 1.0)

        new_updates = jax.tree_util.tree_map(factor_minus_one, mu, nu, params)
        return new_updates, ScaleByMadamState(count=count, mu=mu, nu=nu)

    return optax.GradientTransformation(init_fn, update_fn)
