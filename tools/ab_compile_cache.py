"""Probe: does jax's persistent compilation cache work on the axon relay?

Runs the flagship train-step compile with jax_compilation_cache_dir set and
reports compile wall time.  Run twice: if the second run's compile time
collapses, the cache works and the training CLI should enable it by default
(round-2 verdict: every run re-pays ~2 min of compile).

Usage: python tools/ab_compile_cache.py /tmp/jaxcache
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    cache_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/jaxcache"
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

    from vit_cifar_tpu.config import Config
    from vit_cifar_tpu.data.datasets import load_dataset
    from vit_cifar_tpu.models import get_model
    from vit_cifar_tpu.parallel.mesh import make_mesh, replicated_sharding
    from vit_cifar_tpu.train.loop import MATMUL_PRECISION, init_state
    from vit_cifar_tpu.train.optim import make_optimizer
    from vit_cifar_tpu.train.steps import make_train_step

    cfg = Config(model_name="vit", num_layers=7, hidden=384, mlp_hidden=384,
                 head=12, batch_size=128, label_smoothing=True,
                 autoaugment=True, precision="bf16-mixed")
    jax.config.update(
        "jax_default_matmul_precision", MATMUL_PRECISION[cfg.matmul_precision]
    )
    mesh = make_mesh(cfg.mesh_shape, cfg.mesh_axes)
    raw = load_dataset(cfg.dataset, cfg.data_dir, cfg.synthetic_data)
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, 390)
    state = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), cfg.compute_dtype))
    repl = replicated_sharding(mesh)
    x_all = jax.device_put(raw.x_train.reshape(len(raw.x_train), -1), repl)
    y_all = jax.device_put(raw.y_train, repl)
    perm = jax.device_put(np.arange(len(raw.x_train), dtype=np.int32), repl)

    step = jax.jit(make_train_step(cfg, model, tx, mesh=mesh), donate_argnums=(0,))
    t0 = time.perf_counter()
    compiled = step.lower(state, x_all, y_all, perm, 0).compile()
    t_compile = time.perf_counter() - t0
    del compiled
    n_entries = len(os.listdir(cache_dir)) if os.path.isdir(cache_dir) else 0
    print(f"compile_s={t_compile:.1f} cache_entries={n_entries}")


if __name__ == "__main__":
    main()
