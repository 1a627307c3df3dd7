"""A/B: k-step Python-unrolled macro-step jit vs per-step dispatch.

Round-2 verdict weak #6: the flagship step is dispatch/overhead-bound
(~0.9 ms/step fixed + ~0.65 ms/layer, docs/PERFORMANCE.md).  `lax.scan` was
ruled out (multi-ms per-iteration cost on this relay runtime), but a k-step
*Python-unrolled* macro jit — k train steps traced inline into ONE
executable — amortizes the fixed per-execution cost over k steps without any
XLA while-loop.  This tool measures the real steady-state throughput (read-
synced windows, warm; see docs/PERFORMANCE.md for why timings MUST end in a
device_get on this runtime) for k in --ks, full flagship recipe.

Usage: python tools/ab_macrostep.py [--ks 1,2,4,8] [--window 384] [--no-aa]
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
from vit_cifar_tpu.train.steps import make_train_step


def make_macro_step(train_step, k: int):
    """k train steps unrolled inline into one traced function (NOT lax.scan:
    while-loop iterations carry a multi-ms fixed cost on this runtime)."""

    def macro(state, x_all, y_all, perm, i0):
        metrics = None
        for j in range(k):
            state, metrics = train_step(state, x_all, y_all, perm, i0 + j)
        return state, metrics

    return macro


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ks", default="1,2,4,8")
    ap.add_argument("--window", type=int, default=384, help="steps per timed window")
    ap.add_argument("--no-aa", action="store_true")
    args = ap.parse_args()
    ks = [int(s) for s in args.ks.split(",")]

    cfg = Config(
        model_name="vit", num_layers=7, hidden=384, mlp_hidden=384, head=12,
        batch_size=128, label_smoothing=True, autoaugment=not args.no_aa,
        precision="bf16-mixed",
    )
    jax.config.update(
        "jax_default_matmul_precision", MATMUL_PRECISION[cfg.matmul_precision]
    )
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
    train_step = make_train_step(cfg, model, tx, mesh=mesh)

    results = {}
    for k in ks:
        state = init_state(cfg, model, tx, sample)
        from vit_cifar_tpu.train.steps import make_metrics_zeros

        state = state.replace(
            metrics_acc=jax.device_put(make_metrics_zeros(cfg), repl)
        )
        step_fn = jax.jit(make_macro_step(train_step, k), donate_argnums=(0,))
        window = (args.window // k) * k
        n_macro = window // k
        t_c0 = time.perf_counter()

        def timed_window(state):
            t0 = time.perf_counter()
            metrics = None
            for m in range(n_macro):
                i0 = (m * k) % steps_per_epoch
                state, metrics = step_fn(state, x_all, y_all, perm, i0)
            float(jax.device_get(metrics["loss"]))  # the ONLY real sync here
            return state, time.perf_counter() - t0

        # warm past cold-executable slow mode; report best stable window
        times = []
        for _ in range(8):
            state, dt = timed_window(state)
            times.append(dt)
            if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
                break
        dt = min(times[-2:]) if len(times) >= 2 else times[-1]
        compile_s = times[0] - dt * 0  # first window includes compile+cold
        img_s = window * cfg.batch_size / dt
        results[k] = dict(
            ms_per_step=round(1e3 * dt / window, 3),
            img_per_sec=round(img_s, 1),
            first_window_s=round(times[0], 1),
            windows=[round(t, 2) for t in times],
        )
        print(f"k={k}: {results[k]}", flush=True)
        del compile_s

    print(json.dumps({"ab": "macrostep", "aa": not args.no_aa, "results": results}))


if __name__ == "__main__":
    main()
