"""Training state pytree.

The reference's mutable training state is scattered across the
LightningModule: model params, optimizer state, epoch counters, NNMF grad
bookkeeping, persistent hamburger bases, AE-internal optimizer state
(network.py, layers.py:844).  Under jit all of it becomes one explicit,
donate-able pytree.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax.numpy as jnp


class TrainState(flax.struct.PyTreeNode):
    step: jnp.ndarray  # global step, int32
    params: Any  # model parameters (fp32 master copies)
    model_state: Any  # non-param variable collections (e.g. md bases EMA)
    opt_state: Any  # optax state
    ae_opt_state: Any  # AE-internal optimizer state (layers.py:844) or None
    rng: jnp.ndarray  # base PRNG key; per-step keys are fold_in(rng, step)
    # running per-epoch metric sums, accumulated INSIDE the jitted step (so
    # epoch-mean train metrics cost zero extra dispatches — the reference logs
    # loss/acc per step, network.py:206-208, and Lightning averages them).
    # None when the caller does not want accumulation (unit tests, bench).
    metrics_acc: Any = None
