"""Benchmark: training throughput of the flagship ViT recipe on real hardware.

Prints ONE JSON line:
    {"metric": "train_images_per_sec", "value": N, "unit": "img/s", "vs_baseline": R}

Baseline: the reference trains CIFAR-10 for 200 epochs in 02:14:22 on 1x V100
with AMP (README.md:33) -> 50_000*200/8062s = 1240 img/s.  ``vs_baseline`` is
our throughput / 1240 (per chip).

The benchmark runs the REAL jitted train step (augmentation + fwd/bwd +
optimizer) of the 6.3M-param README-recipe ViT (7 layers, hidden 384, head 12,
batch 128, label smoothing) on whatever data is available (real CIFAR-10 if on
disk, else synthetic with identical shapes — compute is identical either way).
"""

from __future__ import annotations

import json
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.data.datasets import load_dataset
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.parallel.mesh import make_mesh, replicated_sharding
from vit_cifar_tpu.train.loop import init_state, MATMUL_PRECISION
from vit_cifar_tpu.train.optim import make_optimizer
from vit_cifar_tpu.train.steps import make_train_step

BASELINE_IMG_PER_SEC = 50_000 * 200 / (2 * 3600 + 14 * 60 + 22)  # 1240 (V100)


def main():
    cfg = Config(
        model_name="vit",
        num_layers=7,
        hidden=384,
        mlp_hidden=384,
        head=12,
        batch_size=128,
        label_smoothing=True,
        autoaugment=True,
        precision="bf16-mixed",
    )
    jax.config.update("jax_default_matmul_precision", MATMUL_PRECISION[cfg.matmul_precision])
    from vit_cifar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(cfg.compile_cache_dir)  # 20.8 -> 3.9 s warm compile

    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    n_chips = int(np.prod(mesh.devices.shape))

    raw = load_dataset(cfg.dataset, cfg.data_dir, cfg.synthetic_data)
    steps_per_epoch = len(raw.x_train) // cfg.batch_size
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch)
    sample = jnp.zeros((2, 32, 32, 3), cfg.compute_dtype)
    state = init_state(cfg, model, tx, sample)

    repl = replicated_sharding(mesh)
    # flat layout: see train_step's HBM-layout note (4D uint8 can trigger a
    # whole-dataset relayout copy every step)
    x_all = jax.device_put(raw.x_train.reshape(len(raw.x_train), -1), repl)
    y_all = jax.device_put(raw.y_train, repl)
    rng = np.random.default_rng(0)
    perm = jax.device_put(rng.permutation(len(raw.x_train)).astype(np.int32), repl)

    step_fn = jax.jit(make_train_step(cfg, model, tx, mesh=mesh), donate_argnums=(0,))

    def timed_window(state, n_steps):
        t0 = time.perf_counter()
        metrics = None
        for i in range(n_steps):
            state, metrics = step_fn(state, x_all, y_all, perm, i % steps_per_epoch)
        # The ONLY real synchronization on this runtime is a host value read:
        # jax.block_until_ready returns immediately whether or not the queued
        # steps have executed (measured: 390 steps "complete" in 0.15 s by
        # block_until_ready, then a single device_get drains for 98 s).  Any
        # timing that does not end in a device_get measures enqueue rate, not
        # execution.  Steps still pipeline freely WITHIN the window; the one
        # scalar read per window is what a real training loop does per epoch.
        float(jax.device_get(metrics["loss"]))
        return state, time.perf_counter() - t0

    # Warm up past the cold-executable slow mode: the FIRST several hundred
    # executions of a freshly compiled TPU executable run 20-100x slow before
    # settling (measured: window 0 of 390 steps takes 70-190 s, window 1 is
    # steady).  Run windows until two consecutive agree within 5% (or the
    # attempt cap is hit), then report the best stable window.
    window = 390
    times = []
    for _ in range(8):
        state, dt = timed_window(state, window)
        times.append(dt)
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    dt = min(times[-2:]) if len(times) >= 2 else times[-1]

    img_per_sec = window * cfg.batch_size / dt  # full recipe incl. AutoAugment
    per_chip = img_per_sec / n_chips
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec",
                "value": round(img_per_sec, 1),
                "unit": "img/s",
                "vs_baseline": round(per_chip / BASELINE_IMG_PER_SEC, 3),
            }
        )
    )


def _backend_ready() -> bool:
    """True once the backend grants a device.  On a relay outage the first
    backend touch hangs ~25 min in-process and then raises UNAVAILABLE; a
    hung client's session never recovers (CLAUDE.md), so recovery must
    re-exec a FRESH process rather than retry in this one."""
    try:
        return len(jax.devices()) > 0
    except Exception as e:  # RuntimeError UNAVAILABLE on a downed relay
        print(f"[bench] backend unavailable: {e}", file=sys.stderr, flush=True)
        return False


def main_with_retries(max_retries: int = 5, retry_sleep_s: float = 180.0):
    """Relay-outage resilience for unattended runs: if backend init fails,
    sleep and re-exec a fresh process (bounded retries via the BENCH_RETRY
    env var), since a client that failed init holds no grant and never
    recovers in-process.  After the retry budget, still print ONE well-formed
    JSON line (the driver parses stdout) and exit 1."""
    retry = int(os.environ.get("BENCH_RETRY", "0"))
    if not _backend_ready():
        if retry >= max_retries:
            print(
                json.dumps(
                    {
                        "metric": "train_images_per_sec",
                        "value": 0.0,
                        "unit": "img/s",
                        "vs_baseline": 0.0,
                        "error": "TPU backend unavailable after retries",
                    }
                )
            )
            sys.exit(1)
        time.sleep(retry_sleep_s)
        os.environ["BENCH_RETRY"] = str(retry + 1)
        os.execv(sys.executable, [sys.executable] + sys.argv)
    main()


if __name__ == "__main__":
    main_with_retries()
