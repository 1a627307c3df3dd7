"""A/B: eval-loop structure on the relay runtime.

Round-2 verdict weak #5: eval runs synchronously every epoch (~7 min of the
21-min 200-epoch run is eval/histogram/ckpt overhead).  The eval SUMS are
batching-independent (per-example loss + correct masked sums), so the inner
batch size and loop structure are pure perf knobs.  Candidates:

  * lax.scan over n batches (current; CLAUDE.md: scan iterations carry a
    multi-ms fixed cost on this runtime)
  * Python-dispatched per-batch steps, one device_get of the running sums
  * one whole-test-set batch

Each timing ends in a device_get (the only real sync here — see
docs/PERFORMANCE.md).  Usage: python tools/ab_eval.py
"""

from __future__ import annotations

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
from vit_cifar_tpu.train.loop import MATMUL_PRECISION, _pad_eval, init_state
from vit_cifar_tpu.train.optim import make_optimizer
from vit_cifar_tpu.train.steps import make_eval_step


def main():
    cfg0 = Config(model_name="vit", num_layers=7, hidden=384, mlp_hidden=384,
                  head=12, batch_size=128, label_smoothing=True,
                  precision="bf16-mixed")
    jax.config.update(
        "jax_default_matmul_precision", MATMUL_PRECISION[cfg0.matmul_precision]
    )
    mesh = make_mesh(cfg0.mesh_shape, cfg0.mesh_axes)
    repl = replicated_sharding(mesh)
    raw = load_dataset(cfg0.dataset, cfg0.data_dir, cfg0.synthetic_data)
    model, _ = get_model(cfg0)
    tx = make_optimizer(cfg0, 390)
    state = init_state(cfg0, model, tx, jnp.zeros((2, 32, 32, 3), cfg0.compute_dtype))

    results = {}
    for ebs in (256, 1024, 2000):
        cfg = cfg0.replace(eval_batch_size=ebs)
        x_np, y_np, mask_np, steps = _pad_eval(raw.x_test, raw.y_test, ebs)
        x = jax.device_put(x_np.reshape(len(x_np), -1), repl)
        y = jax.device_put(y_np, repl)
        mask = jax.device_put(mask_np, repl)
        eval_step = make_eval_step(cfg, model)

        def eval_scan(params, mstate):
            def body(carry, i):
                out = eval_step(
                    params, mstate,
                    jax.lax.dynamic_slice_in_dim(x, i * ebs, ebs),
                    jax.lax.dynamic_slice_in_dim(y, i * ebs, ebs),
                    jax.lax.dynamic_slice_in_dim(mask, i * ebs, ebs),
                )
                return carry, out

            _, outs = jax.lax.scan(body, None, jnp.arange(steps))
            return jax.tree_util.tree_map(lambda a: a.sum(), outs)

        jit_scan = jax.jit(eval_scan)

        def eval_slice(params, mstate, i):
            return eval_step(
                params, mstate,
                jax.lax.dynamic_slice_in_dim(x, i * ebs, ebs),
                jax.lax.dynamic_slice_in_dim(y, i * ebs, ebs),
                jax.lax.dynamic_slice_in_dim(mask, i * ebs, ebs),
            )

        jit_slice = jax.jit(eval_slice)

        def run_scan():
            s = jax.device_get(jit_scan(state.params, state.model_state))
            return float(s["loss_sum"]), float(s["count"])

        def run_dispatch():
            outs = [jit_slice(state.params, state.model_state, i)
                    for i in range(steps)]
            sums = jax.device_get(
                jax.tree_util.tree_map(lambda *a: sum(a), *outs)
            )
            return float(sums["loss_sum"]), float(sums["count"])

        for name, fn in (("scan", run_scan), ("dispatch", run_dispatch)):
            # warm past cold-executable slow mode, then time 5 evals
            ts = []
            for _ in range(10):
                t0 = time.perf_counter()
                loss, count = fn()
                ts.append(time.perf_counter() - t0)
                if len(ts) >= 3 and abs(ts[-1] - ts[-2]) <= 0.1 * min(ts[-2:]):
                    break
            dt = min(ts[-2:])
            results[f"{name}_ebs{ebs}"] = dict(
                eval_s=round(dt, 3), loss_sum=round(loss, 2), count=count,
                all=[round(t, 2) for t in ts],
            )
            print(f"{name} ebs={ebs}: {results[f'{name}_ebs{ebs}']}", flush=True)

    print(json.dumps({"ab": "eval", "results": results}))


if __name__ == "__main__":
    main()
