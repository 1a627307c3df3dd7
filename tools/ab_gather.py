"""A/B: per-step 128-row batch gather vs pre-permuted epoch + contiguous slice.

docs/PERFORMANCE.md attributes the ~0.9 ms/step fixed cost to "gather +
small-kernel overhead" inside the executable.  The gather component is the
per-step `dynamic_slice(perm) + take(x_all, idx)` fetch of 128 rows from the
HBM-resident 50k-row uint8 dataset.  The alternative: permute the WHOLE
dataset once per epoch (one big gather amortized over ~390 steps, into a
second HBM buffer) and fetch each batch with a pure contiguous
`dynamic_slice` (steps.py `contiguous_batches=True`).  Training semantics are
identical — the same shuffled batches, just materialized per epoch instead of
per step.

Measures real steady state (read-synced windows, warm; `jax.block_until_ready`
is a no-op on this runtime — see docs/PERFORMANCE.md) for both variants, full
flagship recipe, plus the per-epoch permute cost for the slice variant.

Usage: python tools/ab_gather.py [--window 384] [--no-aa]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.data.datasets import load_dataset
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.parallel.mesh import make_mesh, replicated_sharding
from vit_cifar_tpu.train.loop import MATMUL_PRECISION, init_state
from vit_cifar_tpu.train.optim import make_optimizer
from vit_cifar_tpu.train.steps import make_metrics_zeros, make_train_step


def measure(step_fn, state, x_all, y_all, perm, window, steps_per_epoch, batch):
    def timed_window(state):
        t0 = time.perf_counter()
        metrics = None
        for i in range(window):
            state, metrics = step_fn(state, x_all, y_all, perm, i % steps_per_epoch)
        float(jax.device_get(metrics["loss"]))  # the ONLY real sync here
        return state, time.perf_counter() - t0

    times = []
    for _ in range(8):
        state, dt = timed_window(state)
        times.append(dt)
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    dt = min(times[-2:]) if len(times) >= 2 else times[-1]
    return dict(
        ms_per_step=round(1e3 * dt / window, 3),
        img_per_sec=round(window * batch / dt, 1),
        windows=[round(t, 2) for t in times],
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--window", type=int, default=384)
    ap.add_argument("--no-aa", action="store_true")
    args = ap.parse_args()

    cfg = Config(
        model_name="vit", num_layers=7, hidden=384, mlp_hidden=384, head=12,
        batch_size=128, label_smoothing=True, autoaugment=not args.no_aa,
        precision="bf16-mixed",
    )
    jax.config.update(
        "jax_default_matmul_precision", MATMUL_PRECISION[cfg.matmul_precision]
    )
    from vit_cifar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(cfg.compile_cache_dir)
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    raw = load_dataset(cfg.dataset, cfg.data_dir, cfg.synthetic_data)
    steps_per_epoch = len(raw.x_train) // cfg.batch_size
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    sample = jnp.zeros((2, 32, 32, 3), cfg.compute_dtype)

    repl = replicated_sharding(mesh)
    x_all = jax.device_put(raw.x_train.reshape(len(raw.x_train), -1), repl)
    y_all = jax.device_put(raw.y_train, repl)
    perm = jax.device_put(
        np.random.default_rng(0).permutation(len(raw.x_train)).astype(np.int32), repl
    )

    results = {}

    # --- A: per-step gather (current production path) ---
    state = init_state(cfg, model, tx, sample)
    state = state.replace(metrics_acc=jax.device_put(make_metrics_zeros(cfg), repl))
    step_a = jax.jit(make_train_step(cfg, model, tx, mesh=mesh), donate_argnums=(0,))
    results["gather"] = measure(
        step_a, state, x_all, y_all, perm, args.window, steps_per_epoch, cfg.batch_size
    )
    print(f"gather: {results['gather']}", flush=True)

    # --- B: pre-permuted epoch + contiguous dynamic_slice ---
    @jax.jit
    def permute_epoch(x, y, p):
        return jnp.take(x, p, axis=0), jnp.take(y, p, axis=0)

    # per-epoch permute cost (read-synced: force materialization via a reads)
    t0 = time.perf_counter()
    x_p, y_p = permute_epoch(x_all, y_all, perm)
    float(jax.device_get(x_p[0, 0]))  # sync
    permute_cold_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    x_p, y_p = permute_epoch(x_all, y_all, perm)
    float(jax.device_get(x_p[0, 0]))
    permute_warm_s = time.perf_counter() - t0

    state = init_state(cfg, model, tx, sample)
    state = state.replace(metrics_acc=jax.device_put(make_metrics_zeros(cfg), repl))
    step_b = jax.jit(
        make_train_step(cfg, model, tx, mesh=mesh, contiguous_batches=True),
        donate_argnums=(0,),
    )
    results["slice"] = measure(
        step_b, state, x_p, y_p, perm, args.window, steps_per_epoch, cfg.batch_size
    )
    results["slice"]["permute_warm_s"] = round(permute_warm_s, 4)
    results["slice"]["permute_cold_s"] = round(permute_cold_s, 4)
    results["slice"]["permute_ms_per_step_amortized"] = round(
        1e3 * permute_warm_s / steps_per_epoch, 3
    )
    print(f"slice: {results['slice']}", flush=True)

    print(json.dumps({"ab": "gather", "aa": not args.no_aa, "results": results}))


if __name__ == "__main__":
    main()
