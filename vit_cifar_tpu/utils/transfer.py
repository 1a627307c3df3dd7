"""Batched device->host transfer.

On this environment's tunneled TPU runtime every host read costs a full
relay round-trip (~25 ms), and ``jax.device_get`` of a pytree pays it PER
LEAF — fetching the flagship's ~90-leaf checkpoint payload took ~2.5 s per
best-checkpoint save (measured, round 3).  ``device_fetch_tree`` concatenates
same-dtype leaves into one device array per dtype group first, so the whole
tree moves in a handful of transfers (~0.5 s).  Semantically identical to
``jax.device_get`` (host numpy tree, shapes/dtypes preserved).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def device_fetch_tree(tree):
    """jax.device_get with one transfer per dtype group instead of per leaf."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    out = list(leaves)
    groups: dict[str, list[int]] = {}
    for i, leaf in enumerate(leaves):
        if isinstance(leaf, jax.Array):
            groups.setdefault(str(leaf.dtype), []).append(i)
    catted = {
        dt: jnp.concatenate([jnp.ravel(leaves[i]) for i in idx])
        if len(idx) > 1
        else jnp.ravel(leaves[idx[0]])
        for dt, idx in groups.items()
    }
    host = jax.device_get(catted)
    for dt, idx in groups.items():
        vec = host[dt]
        off = 0
        for i in idx:
            n = leaves[i].size
            out[i] = np.asarray(vec[off:off + n]).reshape(leaves[i].shape)
            off += n
    for i, leaf in enumerate(leaves):
        if out[i] is leaf:  # non-jax leaf (python scalar, numpy array, ...)
            out[i] = jax.device_get(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)
