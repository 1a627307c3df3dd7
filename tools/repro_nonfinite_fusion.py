"""Repro for the XLA fusion bug guarded by the optimization_barrier in
ops/nnmf/functional.py's custom-VJP backward.

Symptom (without the barrier): training gnnmf_sbs with madam + trainable
bases, the LAST encoder block's ``nnmf_weights`` gradient comes out ALL-NaN
from step ~9 onward — 187/200 steps skipped by the nonfinite guard.  The
cotangent entering that layer's backward is finite, ``grad_input`` is finite,
and the identical math is finite under ``jax.disable_jit()``; only the jitted
full-graph ``grad_w`` NaNs.  Reproduces on BOTH the CPU and TPU backends, in
fp32 ("32") as well as bf16-mixed — i.e. an XLA rewrite across the custom-VJP
boundary (the forward's ``x / (x.sum + 1e-20)`` L1-normalization fusing into
the backward's renormalization + ratio math), not a precision or hardware
issue.

Bisect record (2026-08-16, jax 0.8.x): optimization_barrier on the saved
``inp`` residual alone fixes it; barriers on ``g`` or ``h`` alone do not.

Usage: [NSTEPS=16] python tools/repro_nonfinite_fusion.py [32|bf16-mixed]
Expected WITH the barrier in place: "total skips 0.0/N".
To reproduce the bug, remove the barrier line in functional.py and rerun.
"""
import sys
import jax, jax.numpy as jnp, numpy as np
sys.path.insert(0, "/root/repo")
from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.train.loop import init_state
from vit_cifar_tpu.train.optim import make_optimizer
from vit_cifar_tpu.train.steps import make_train_step

precision = sys.argv[1] if len(sys.argv) > 1 else "bf16-mixed"
cfg = Config(model_name="gnnmf_sbs", num_layers=7, hidden=384, mlp_hidden=384,
             head=12, ffn_features=768, batch_size=128, md_iter=7,
             train_md_bases=True, optimizer="madam", label_smoothing=True,
             precision=precision, warmup_epoch=0, synthetic_data=True,
             nonfinite_guard=True)
model, _ = get_model(cfg)
tx = make_optimizer(cfg, steps_per_epoch=390)
state = init_state(cfg, model, tx, jnp.zeros((2,32,32,3), cfg.compute_dtype))
rng = np.random.default_rng(0)
n = 2048
x_all = jnp.asarray(rng.integers(0,255,(n,32,32,3),dtype=np.uint8).reshape(n,-1))
y_all = jnp.asarray(rng.integers(0,10,n,dtype=np.int32))
perm = jnp.asarray(rng.permutation(n).astype(np.int32))
step = jax.jit(make_train_step(cfg, model, tx))
skips = 0
import os
NSTEPS = int(os.environ.get("NSTEPS", "200"))
for i in range(NSTEPS):
    state, m = step(state, x_all, y_all, perm, i % (n//cfg.batch_size))
    s = float(m["skipped_nonfinite"]); l = float(m["loss"])
    skips += s
    if s or not np.isfinite(l):
        print(f"step {i}: loss={l} skipped={s}")
print(f"precision={precision}: total skips {skips}/{NSTEPS}, final loss {float(m['loss']):.4f}")
