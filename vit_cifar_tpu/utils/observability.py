"""Observability: model summary, layer-output capture, histogram logging,
profiler hooks.

Reference equivalents:
  * Lightning ModelSummary at fit start (network.py:124-132) -> model_summary
  * forward-hook layer-output capture (utils.py:21-44, get_layer_outputs)
    -> flax ``capture_intermediates``
  * Comet 3D histograms of weights / layer outputs / AE inputs each epoch
    (network.py:229-323) and gradients every ``log_gradients_interval`` steps
    (network.py:335-374) -> ``log_histograms``; with the CSV logger the
    histograms land in ``{log_dir}/{experiment}/histograms/`` as .npz
  * no profiler in the reference (SURVEY §5) -> ``profile_trace`` wraps
    ``jax.profiler`` trace capture
"""

from __future__ import annotations

import contextlib
import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def model_summary(params, depth: int = -1) -> str:
    """Parameter-count table by module path (ModelSummary equivalent)."""
    rows: dict[str, int] = {}
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    total = 0
    for path, leaf in flat:
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        n = int(np.prod(leaf.shape)) if leaf.shape else 1
        total += n
        key = "/".join(names if depth < 0 else names[:depth])
        rows[key] = rows.get(key, 0) + n
    width = max((len(k) for k in rows), default=10) + 2
    lines = [f"{'module':<{width}} params"]
    lines += [f"{k:<{width}} {v:,}" for k, v in rows.items()]
    lines.append(f"{'TOTAL':<{width}} {total:,}")
    return "\n".join(lines)


def get_layer_outputs(model, variables, x, **apply_kwargs) -> dict[str, Any]:
    """Every submodule's output, keyed by module path (utils.py:21-44 equiv)."""
    _, inter = model.apply(
        variables,
        x,
        deterministic=True,
        capture_intermediates=True,
        mutable=["intermediates"],
        rngs={"mask": jax.random.PRNGKey(0)},
        **apply_kwargs,
    )
    out: dict[str, Any] = {}

    def visit(node, prefix):
        if isinstance(node, dict):
            for k, v in node.items():
                visit(v, f"{prefix}/{k}" if prefix else k)
        elif isinstance(node, (tuple, list)):
            for i, v in enumerate(node):
                if hasattr(v, "shape"):
                    out[f"{prefix}" if i == 0 else f"{prefix}.{i}"] = v
                else:
                    visit(v, f"{prefix}.{i}")

    visit(inter["intermediates"], "")
    return out


@functools.partial(jax.jit, static_argnums=(1,))
def _hist_tree(tree, bins: int):
    """All leaf histograms in ONE executable (single dispatch)."""

    def leaf_hist(leaf):
        vals = jnp.asarray(leaf, jnp.float32).reshape(-1)
        return jnp.histogram(vals, bins=bins)

    return jax.tree_util.tree_map(leaf_hist, tree)


def compute_histograms(tree, bins: int = 64) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Per-leaf (counts, bin_edges) histograms.

    One jitted whole-tree computation + ONE device_get: on this relay every
    host read costs a round-trip, so the previous per-leaf jnp.histogram +
    np.asarray pattern (~140 reads for the 70-leaf flagship) took ~23 s per
    histogram epoch — measured down to <0.5 s batched this way.
    """
    flat_in = [
        (path, leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]
        if hasattr(leaf, "shape")
    ]
    sub = {i: leaf for i, (_, leaf) in enumerate(flat_in)}
    host = jax.device_get(_hist_tree(sub, bins))
    out = {}
    for i, (path, _) in enumerate(flat_in):
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        counts, edges = host[i]
        out["/".join(names)] = (np.asarray(counts), np.asarray(edges))
    return out


def log_histograms(logger, tree, prefix: str, step: int, epoch: int, bins: int = 64):
    """Comet path: log_histogram_3d per leaf; CSV path: one .npz per call."""
    if hasattr(logger, "comet") and logger.comet is not None:
        # comet wants raw values, not pre-binned hists — skip
        # compute_histograms and fetch the tree in one transfer per dtype
        # group (per-leaf device_get costs a relay round-trip each)
        from .transfer import device_fetch_tree

        flat = jax.tree_util.tree_flatten_with_path(device_fetch_tree(tree))[0]
        for path, leaf in flat:
            names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
            logger.comet.log_histogram_3d(
                np.asarray(leaf).reshape(-1), name=f"{prefix}/{'/'.join(names)}",
                step=step, epoch=epoch,
            )
        return
    hists = compute_histograms(tree, bins=bins)
    hist_dir = os.path.join(logger.dir, "histograms")
    os.makedirs(hist_dir, exist_ok=True)
    payload = {}
    for name, (counts, edges) in hists.items():
        flat_name = name.replace("/", ".")
        payload[f"{flat_name}__counts"] = counts
        payload[f"{flat_name}__edges"] = edges
    np.savez_compressed(
        os.path.join(hist_dir, f"{prefix}_e{epoch:04d}_s{step}.npz"), **payload
    )


@contextlib.contextmanager
def profile_trace(profile_dir: str):
    """jax.profiler trace capture (the reference has no profiler; SURVEY §5)."""
    if not profile_dir:
        yield
        return
    os.makedirs(profile_dir, exist_ok=True)
    with jax.profiler.trace(profile_dir):
        yield
