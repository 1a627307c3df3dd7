"""Guard matrix: every documented parallel/config guard raises its specific
message, and every ALLOWED zoo-entry x parallel-mode combination trains one
step on the 8-virtual-device mesh (round-4 verdict next-step #5 — the config
surface grew combinatorially; this fences it).

No reference equivalent: the reference is DP-only (main.py:223-224), so its
combination space is trivial; this repo's mesh vocabulary (data/model/pipe/
seq/expert) needs its composition rules pinned by tests.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import MODEL_NAMES, Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.parallel.mesh import make_mesh, replicated_sharding, shard_params
from vit_cifar_tpu.parallel.pipeline import PipelineViT
from vit_cifar_tpu.parallel.sequence import seq_parallel_model

TINY = dict(num_layers=2, hidden=32, mlp_hidden=32, head=4, batch_size=8,
            precision="32", warmup_epoch=0, synthetic_data=True,
            ffn_features=16, md_iter=2, kernel_size=3)

CNN_MODELS = ("cnn_baseline", "lgcnn", "wlgcnn")
TRUNK_MODELS = tuple(n for n in MODEL_NAMES if n not in CNN_MODELS)


def _cfg(name, **kw):
    base = dict(TINY)
    base.update(model_name=name, **kw)
    if name.startswith(("aft", "hamburger", "gnnmf")) or name == "ae":
        base["head"] = 1
    if name == "wlgcnn":
        # weight-gated mixer requires hidden_features == 2*channels
        # (models/cnn.py WeightLocalGlobalConvolution, layers.py:690)
        base["ffn_features"] = 2 * base["hidden"]
    return Config(**base)


# --------------------------------------------------------------------------
# (a) every documented guard raises its specific message
# --------------------------------------------------------------------------

def _pp(name, mesh_shape=(4,), axes=("pipe",), microbatches=0, **kw):
    model, _ = get_model(_cfg(name, **kw))
    return PipelineViT(model, make_mesh(mesh_shape, axes), microbatches)


def _sp(name, mesh_shape=(2, 4), axes=("data", "seq"), **kw):
    model, _ = get_model(_cfg(name, **kw))
    return seq_parallel_model(model, make_mesh(mesh_shape, axes))


def _shard(name, axes, **kw):
    from vit_cifar_tpu.train.loop import init_state
    from vit_cifar_tpu.train.optim import make_optimizer

    cfg = _cfg(name, **kw)
    model, _ = get_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 4),
                       jnp.zeros((2, 32, 32, 3), jnp.float32))
    return shard_params(make_mesh((4, 2), axes), state.params)


GUARDS = [
    # pipeline (parallel/pipeline.py)
    ("pp_non_vit", lambda: _pp("lgcnn"), "ViT trunk"),
    ("pp_dropout", lambda: _pp("vit", dropout=0.1), "dropout"),
    ("pp_moe", lambda: _pp("vit", moe_experts=4), "does not compose with the MoE"),
    ("pp_mask_rng", lambda: _pp("hamburger"), "mask"),
    ("pp_mask_rng_gnnmf_ham", lambda: _pp("gnnmf_ham"), "mask"),
    ("pp_no_pipe_axis", lambda: _pp("vit", (8,), ("data",)), "no 'pipe' axis"),
    ("pp_layer_split", lambda: _pp("vit", num_layers=3), "stages"),
    # sequence (parallel/sequence.py)
    ("sp_non_vit", lambda: _sp("lgcnn"), "no token stream"),
    ("sp_non_mhsa", lambda: _sp("gmlp"), "scoped to the MultiHeadSelfAttention"),
    ("sp_no_seq_axis", lambda: _sp("vit", (8,), ("data",)), "no 'seq' axis"),
    ("sp_pad_moe", lambda: _sp("vit", moe_experts=4),
     "stealing per-example expert"),
    # weight layouts (parallel/mesh.py)
    ("tp_uncovered", lambda: _shard("lgcnn", ("data", "model")),
     "data-only mesh"),
    ("ep_dense", lambda: _shard("vit", ("data", "expert")),
     "no MoE expert stacks"),
    # model factory (models/__init__.py)
    ("moe_on_cnn", lambda: get_model(_cfg("lgcnn", moe_experts=4)),
     "no encoder MLP"),
    ("moe_no_mlp", lambda: get_model(_cfg("vit", moe_experts=4,
                                          use_encoder_mlp=False)),
     "requires the encoder MLP"),
]


@pytest.mark.parametrize("label,trigger,match",
                         GUARDS, ids=[g[0] for g in GUARDS])
def test_documented_guard_raises(label, trigger, match):
    with pytest.raises(ValueError, match=match):
        trigger()


def test_seq_plus_pipe_mesh_rejected(tmp_path):
    from vit_cifar_tpu.train.loop import train

    cfg = _cfg("vit", mesh_shape=(2, 2, 2), mesh_axes=("data", "seq", "pipe"),
               max_epochs=1, eval_batch_size=8,
               log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    with pytest.raises(ValueError, match="do not compose"):
        train(cfg, verbose=False)


def test_pipeline_rejects_other_big_axes():
    model, _ = get_model(_cfg("vit"))
    mesh = make_mesh((2, 2, 2), ("pipe", "data", "expert"))
    pv = PipelineViT(model, mesh, 2)
    x = jnp.zeros((8, 32, 32, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), x)["params"]
    with pytest.raises(ValueError, match="supports \\(data, pipe"):
        pv.apply({"params": params}, x, deterministic=True)


# --------------------------------------------------------------------------
# (b) every ALLOWED zoo-entry x parallel-mode combination trains one step
# --------------------------------------------------------------------------

# pipeline excludes: mask-rng mixers (hamburger*/gnnmf_ham/ae-random; guards
# above).  With train_md_bases the same models carry mutable EMA 'state' ->
# the stateful apply falls back to the numerically-identical sequential path
# (documented in PipelineViT), exercised here via the _ema variants.
PP_MODELS = tuple(n for n in TRUNK_MODELS
                  if not n.startswith("hamburger") and n != "gnnmf_ham") + (
    "hamburger_ema", "hamburger_attention_ema", "gnnmf_ham_ema")


def _combo_cases():
    cases = []
    for n in MODEL_NAMES:
        cases.append((n, "dp"))
    for n in TRUNK_MODELS:  # fc1/fc2 always match the Megatron table
        cases.append((n, "dptp"))
    for n in PP_MODELS:
        cases.append((n, "dppp"))
    cases.append(("vit", "dpsp"))
    cases.append(("vit_moe", "dpep"))
    # the padded-seq x MoE guard's own escape hatch: no cls token -> T=64
    # divides the seq axis, no pad tokens reach the Switch router
    cases.append(("vit_moe_nocls", "dpsp"))
    return cases


MODE_MESH = {
    "dp": ((8,), ("data",)),
    "dptp": ((4, 2), ("data", "model")),
    "dppp": ((4, 2), ("data", "pipe")),
    "dpsp": ((2, 4), ("data", "seq")),
    "dpep": ((2, 4), ("data", "expert")),
}


@pytest.mark.parametrize("name,mode", _combo_cases(),
                         ids=[f"{n}-{m}" for n, m in _combo_cases()])
def test_allowed_zoo_parallel_combination_trains(name, mode):
    from vit_cifar_tpu.train.loop import init_state
    from vit_cifar_tpu.train.optim import make_optimizer
    from vit_cifar_tpu.train.steps import make_train_step

    kw = {}
    base = name
    if name.endswith("_ema"):
        base, kw = name[: -len("_ema")], {"train_md_bases": True}
    if name == "vit_moe":
        base, kw = "vit", {"moe_experts": 4}
    if name == "vit_moe_nocls":
        base, kw = "vit", {"moe_experts": 4, "is_cls_token": False}
    shape, axes = MODE_MESH[mode]
    cfg = _cfg(base, mesh_shape=shape, mesh_axes=axes, **kw)
    mesh = make_mesh(shape, axes)
    model, _ = get_model(cfg)
    if mode == "dppp":
        model = PipelineViT(model, mesh, 2)
    if mode == "dpsp":
        model = seq_parallel_model(model, mesh)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    state = init_state(cfg, model, tx,
                       jnp.zeros((2, 32, 32, 3), jnp.float32))
    if mode in ("dptp", "dpep"):
        state = state.replace(params=shard_params(mesh, state.params))

    rng = np.random.default_rng(0)
    n = 16
    repl = replicated_sharding(mesh)
    x = jax.device_put(
        rng.integers(0, 255, (n, 32 * 32 * 3), dtype=np.uint8), repl)
    y = jax.device_put(rng.integers(0, 10, n, dtype=np.int32), repl)
    perm = jax.device_put(np.arange(n, dtype=np.int32), repl)
    step = jax.jit(make_train_step(cfg, model, tx, mesh=mesh))
    state, m = step(state, x, y, perm, 0)
    loss = float(jax.device_get(m["loss"]))
    assert np.isfinite(loss), f"{name} x {mode}: non-finite loss {loss}"
