"""Diagnose the superlinear batch-size scaling found by tools/ab_batch.py.

ab_batch measured per-step time growing ~B^1.2 (2.25-2.37x per batch
doubling) in BOTH in-step-AA and preaugment modes — so the growth is not the
augmentation.  This tool isolates the components at each batch size:

  * fwdbwd   — value_and_grad of the flagship loss on a FIXED HBM batch +
               a trivial sgd update (no gather, no augmentation, no optax)
  * fwd      — inference forward only
  * gather   — jnp.take of B rows from the flat (50k, 3072) uint8 dataset +
               reshape + normalize + cast (the step's data fetch)
  * optstep  — the flat-ravel adam update alone (batch-independent; sanity)

Methodology per docs/PERFORMANCE.md: warm first, every timed window ends in
a device_get (block_until_ready is a no-op on this relay), repeat windows
until two consecutive agree within 5%.

Usage: python tools/ab_scaling_diag.py [--batch-sizes 128,256,512,1024]
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
from vit_cifar_tpu.data import augment
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.train.loop import MATMUL_PRECISION, init_state
from vit_cifar_tpu.train.losses import make_criterion
from vit_cifar_tpu.train.optim import make_optimizer


def _steady(run_window, n_windows=8):
    times = []
    for _ in range(n_windows):
        times.append(run_window())
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    return min(times[-2:]) if len(times) >= 2 else times[-1], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-sizes", default="128,256,512,1024")
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()

    jax.config.update("jax_default_matmul_precision", MATMUL_PRECISION["medium"])
    from vit_cifar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(Config().compile_cache_dir)

    cfg = Config(model_name="vit", num_layers=7, hidden=384, mlp_hidden=384,
                 head=12, label_smoothing=True, precision="bf16-mixed")
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=390)
    state = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), cfg.compute_dtype))
    criterion = make_criterion(cfg)

    rng = np.random.default_rng(0)
    n = 50_000
    x_flat = jnp.asarray(rng.integers(0, 255, (n, 32 * 32 * 3), dtype=np.uint8))
    K = args.steps

    results = []
    for B in (int(s) for s in args.batch_sizes.split(",")):
        y = jnp.asarray(rng.integers(0, 10, B, dtype=np.int32))
        xb = jnp.asarray(
            rng.standard_normal((B, 32, 32, 3)).astype(np.float32)
        ).astype(cfg.compute_dtype)

        # --- fwd/bwd + trivial update (keeps params changing so nothing
        # folds; sgd so the optimizer itself is ~free) ---
        def loss_fn(params, x):
            logits = model.apply({"params": params}, x, deterministic=False,
                                 rngs={"dropout": jax.random.PRNGKey(0),
                                       "mask": jax.random.PRNGKey(0)})
            return criterion(logits, y, {})

        @jax.jit
        def fwdbwd(params, x):
            loss, g = jax.value_and_grad(loss_fn)(params, x)
            new = jax.tree_util.tree_map(lambda p, gg: p - 1e-6 * gg.astype(p.dtype),
                                         params, g)
            return new, loss

        @jax.jit
        def fwd(params, x):
            return criterion(
                model.apply({"params": params}, x, deterministic=True), y, {}
            )

        idx0 = jnp.asarray(
            rng.integers(0, n, (K, B)).astype(np.int32)
        )  # with-replacement pool: K*B can exceed the dataset

        @jax.jit
        def gather(i):
            img = jnp.take(x_flat, idx0[i], axis=0).reshape(B, 32, 32, 3)
            img = augment.normalize(img, cfg.mean, cfg.std)
            return img.astype(cfg.compute_dtype).sum()

        def win_fwdbwd():
            p = state.params
            t0 = time.perf_counter()
            for _ in range(K):
                p, loss = fwdbwd(p, xb)
            float(jax.device_get(loss))
            return time.perf_counter() - t0

        def win_fwd():
            t0 = time.perf_counter()
            for _ in range(K):
                loss = fwd(state.params, xb)
            float(jax.device_get(loss))
            return time.perf_counter() - t0

        def win_gather():
            t0 = time.perf_counter()
            s = None
            for i in range(K):
                s = gather(i % K)
            float(jax.device_get(s))
            return time.perf_counter() - t0

        # raw-matmul probe at the model's shapes: a chain of (B*65, 384) x
        # (384, 384) matmuls — if THIS scales linearly while the model bwd
        # does not, the superlinearity is compilation (fusion/layout), not a
        # chip- or relay-level cliff
        a0 = jnp.asarray(
            rng.standard_normal((B * 65, 384)).astype(np.float32)
        ).astype(jnp.bfloat16)
        w0 = jnp.asarray(
            rng.standard_normal((384, 384)).astype(np.float32)
        ).astype(jnp.bfloat16)

        @jax.jit
        def mm_chain(a, w):
            for _ in range(16):
                a = jnp.tanh(a @ w)
            return a

        def win_mm():
            t0 = time.perf_counter()
            a = a0
            for _ in range(K):
                a = mm_chain(a, w0)
            float(jax.device_get(a.sum()))
            return time.perf_counter() - t0

        row = {"batch_size": B}
        for name, w in (("fwdbwd", win_fwdbwd), ("fwd", win_fwd),
                        ("gather", win_gather), ("mm16", win_mm)):
            dt, times = _steady(w)
            row[f"{name}_ms"] = round(1e3 * dt / K, 3)
            row[f"{name}_windows"] = [round(t, 2) for t in times]
        results.append(row)
        print(f"[diag] {row}", flush=True)

    print(json.dumps({"ab": "scaling_diag", "results": results}))


if __name__ == "__main__":
    main()
