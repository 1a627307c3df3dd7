"""End-to-end train smoke tests (the fast_dev_run equivalent, main.py:55) and
multi-device sharding tests on the 8-virtual-CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.parallel.mesh import make_mesh
from vit_cifar_tpu.train.loop import init_state
from vit_cifar_tpu.train.optim import make_optimizer
from vit_cifar_tpu.train.steps import make_eval_step, make_train_step

# warmup_epoch=0: with the reference's warmup semantics, epoch 0 has lr=0
# (GradualWarmupScheduler multiplier=1.0 — see test_optim.test_schedule_shape),
# so single-step tests need warmup disabled to observe parameter movement.
SMALL = dict(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48, head=4,
             batch_size=16, eval_batch_size=16, precision="32",
             label_smoothing=True, synthetic_data=True, warmup_epoch=0)


def _setup(cfg, n=256, mesh=None):
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    state = init_state(cfg, model, tx, sample)
    rng = np.random.default_rng(0)
    x_all = jnp.asarray(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8))
    y_all = jnp.asarray(rng.integers(0, 10, n, dtype=np.int32))
    step = make_train_step(cfg, model, tx, mesh=mesh)
    return model, state, x_all, y_all, jax.jit(step)


def test_train_step_updates_params_and_loss_finite():
    cfg = Config(**SMALL)
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
    assert 0.0 <= float(metrics["acc"]) <= 1.0
    assert int(state.step) == 1
    changed = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), p0, state.params
    )
    assert any(jax.tree_util.tree_leaves(changed))


def test_train_step_with_cutmix_and_mixup():
    for flags in ({"cutmix": True}, {"mixup": True}):
        cfg = Config(**{**SMALL, **flags})
        model, state, x_all, y_all, step = _setup(cfg)
        perm = jnp.arange(len(x_all), dtype=jnp.int32)
        state, metrics = step(state, x_all, y_all, perm, 0)
        assert np.isfinite(float(metrics["loss"]))


def test_ae_detached_params_skipped_by_main_optimizer():
    """torch's main Adam SKIPS params whose .grad is None: for the ae model
    under the plain ce criterion that is the whole AE subtree and the
    detached norm1 (everything downstream is stop-gradient'd) — in particular
    they must receive NO weight decay (network.py:70-112 + torch None-grad
    skip).  With unsupervised_steps=0 those leaves must stay bit-identical
    while the rest of the model trains."""
    cfg = Config(**{**SMALL, "model_name": "ae", "ae_type": "simple",
                    "unsupervised_steps": 0, "weight_decay": 5e-5})
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(3):
        state, _ = step(state, x_all, y_all, perm, i)

    def frozen_path(names):
        return any(a == "mixer" and b in ("AE", "norm1")
                   for a, b in zip(names, names[1:]))

    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = {tuple(str(getattr(k, "key", k)) for k in path): leaf
             for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    saw_frozen = saw_trained = False
    for path, before in flat0:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        after = np.asarray(flat1[names])
        if frozen_path(names):
            saw_frozen = True
            np.testing.assert_array_equal(before, after, err_msg=str(names))
        elif "U" in names or "V" in names:
            saw_trained = True
            assert not np.allclose(before, after), names
    assert saw_frozen and saw_trained


def test_nontrainable_nnmf_weights_skipped_by_main_optimizer():
    """Without --train-md-bases the reference builds NNMF weights with
    requires_grad=False, so torch's optimizer never touches them (no weight
    decay either).  They must stay bit-identical under our optimizer too."""
    cfg = Config(**{**SMALL, "model_name": "gnnmf_sbs", "train_md_bases": False,
                    "weight_decay": 5e-5})
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    for i in range(2):
        state, _ = step(state, x_all, y_all, perm, i)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = {tuple(str(getattr(k, "key", k)) for k in path): leaf
             for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    saw = False
    for path, before in flat0:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        if names[-1] == "nnmf_weights":
            saw = True
            np.testing.assert_array_equal(before, np.asarray(flat1[names]),
                                          err_msg=str(names))
    assert saw


def test_aece_frozen_mask_covers_ae_nnmf_weights():
    """Under the aece criterion the AE subtree gets real main-optimizer grads
    (the ae freeze rule is off), but NNMF weights inside it with effective
    w_trainable=False still return grad None in torch (NNMFLinear.py:377-381)
    and must stay in the frozen mask — no weight decay, no moments
    (frozen-mask leak found by the round-3 package review).  Unit-level
    because the aece + use-nnmf-layers forward is non-finite in the torch
    reference itself (NNMFLinear L1-normalizes the LayerNormed — i.e. signed —
    AE input, NNMFLinear.py:216; verified: reference AE_output contains
    non-finite values for this config), so an end-to-end run skips every
    update via the nonfinite guard."""
    from vit_cifar_tpu.train.optim import main_optimizer_frozen_fn

    cfg = Config(**{**SMALL, "model_name": "ae", "ae_type": "simple",
                    "use_nnmf_layers": True, "criterion": "aece",
                    "train_md_bases": False, "unsupervised_steps": 0,
                    "weight_decay": 5e-5})
    frozen = main_optimizer_frozen_fn(cfg)
    assert frozen is not None
    # AE-internal NNMFLinear weights: grad None in torch -> frozen
    assert frozen(("enc0", "mixer", "AE", "encoder", "nnmf", "nnmf_weights"))
    assert frozen(("enc0", "mixer", "AE", "decoder", "nnmf", "nnmf_weights"))
    # everything else in the AE trains under aece
    assert not frozen(("enc0", "mixer", "AE", "encoder", "fc", "kernel"))
    assert not frozen(("enc0", "mixer", "U", "kernel"))

    # heads: the AE weight is w_trainable=True unconditionally -> NOT frozen
    cfg_h = Config(**{**SMALL, "model_name": "ae", "ae_type": "heads",
                      "legacy_heads": False, "use_nnmf_layers": True,
                      "criterion": "aece", "train_md_bases": False})
    frozen_h = main_optimizer_frozen_fn(cfg_h)
    assert frozen_h is None or not frozen_h(
        ("enc0", "mixer", "AE", "nnmf_weights")
    )


def test_heads_nnmf_ae_after_care_runs_without_train_md_bases():
    """The heads-NNMF AE weight is built w_trainable=True unconditionally
    (reference layers.py:941), so the per-batch after-care
    (norm -> clamp -> norm, network.py:380-386 gated per-layer on
    _w_trainable) applies to it even with --train-md-bases off.  The clamp at
    threshold/1 = 1e-3 must lift the sub-threshold entries of the
    column-stochastic init (columns have seq_len*heads entries, mean ~1/260),
    so the weight changes and stays column-stochastic."""
    cfg = Config(**{**SMALL, "model_name": "ae", "ae_type": "heads",
                    "legacy_heads": False, "use_nnmf_layers": True,
                    "train_md_bases": False, "unsupervised_steps": 0})
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    p0 = jax.tree_util.tree_map(np.asarray, state.params)
    state, _ = step(state, x_all, y_all, perm, 0)
    flat0 = jax.tree_util.tree_flatten_with_path(p0)[0]
    flat1 = {tuple(str(getattr(k, "key", k)) for k in path): leaf
             for path, leaf in jax.tree_util.tree_flatten_with_path(state.params)[0]}
    saw = False
    for path, before in flat0:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        if names[-1] == "nnmf_weights":
            assert "AE" in names, names  # the heads AE is the only NNMF layer
            saw = True
            after = np.asarray(flat1[names])
            assert (before.min() < 1e-3), "init should have sub-threshold entries"
            assert not np.array_equal(before, after), names
            np.testing.assert_allclose(after.sum(0), 1.0, rtol=1e-5)
            assert after.min() >= 1e-3 / (1.0 + after.shape[0] * 1e-3) - 1e-9
    assert saw


def test_contiguous_batches_matches_gather_path():
    """`contiguous_batches=True` (pre-permuted epoch + dynamic_slice fetch,
    tools/ab_gather.py) must train identically to the production gather path
    when fed the pre-permuted dataset."""
    from vit_cifar_tpu.models import get_model as _gm

    cfg = Config(**SMALL)
    model, state_a, x_all, y_all, step_a = _setup(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    state_b = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), jnp.float32))
    step_b = jax.jit(make_train_step(cfg, model, tx, contiguous_batches=True))

    rng = np.random.default_rng(3)
    perm = jnp.asarray(rng.permutation(len(x_all)).astype(np.int32))
    x_p, y_p = jnp.take(x_all, perm, axis=0), jnp.take(y_all, perm, axis=0)
    for i in range(3):
        state_a, ma = step_a(state_a, x_all, y_all, perm, i)
        state_b, mb = step_b(state_b, x_p, y_p, perm, i)
        assert np.allclose(float(ma["loss"]), float(mb["loss"]), rtol=1e-6)
    la = jax.tree_util.tree_leaves(state_a.params)
    lb = jax.tree_util.tree_leaves(state_b.params)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7)


def test_nan_parameter_guard_halts_training(tmp_path):
    """The epoch-end NaN parameter guard (network.py:226-228) still halts
    training after being folded into the eval executable's host read."""
    from vit_cifar_tpu.train.loop import train

    cfg = Config(**{**SMALL, "batch_size": 2000, "eval_batch_size": 5000,
                    "lr": 1e25, "nonfinite_guard": False, "max_epochs": 1,
                    "log_weights": True},
                 log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    with pytest.raises(ValueError, match="NaN parameter"):
        train(cfg, verbose=False)
    # guard must fire BEFORE the epoch-end histograms (reference order,
    # network.py:226-228 then :229-323): no all-NaN histogram artifacts
    import glob

    assert not glob.glob(str(tmp_path / "l" / "**" / "histograms" / "*.npz"),
                         recursive=True)


def test_grad_debug_step_reproduces_training_gradients():
    """make_grad_debug_step called with the pre-update state must return the
    EXACT gradients the train step's optimizer consumes — same batch, same
    folded rng (crop/flip/AutoAugment/mixup draws), same criterion
    (network.py:335-374 logs from on_after_backward).  Proven by replaying
    the optimizer update on the debug grads and matching the train step's
    new params (up to eager-vs-jit fusion ULPs in the Adam math; a wrong
    batch/rng/criterion would diverge at the 1e-1 scale, not 1e-6)."""
    from jax.flatten_util import ravel_pytree

    from vit_cifar_tpu.train.steps import make_grad_debug_step

    cfg = Config(**{**SMALL, "autoaugment": True, "mixup": True})
    model, state, x_all, y_all, step = _setup(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    x_flat = x_all.reshape(len(x_all), -1)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    debug = jax.jit(make_grad_debug_step(cfg, model))

    # advance one step so rng/opt state are non-trivial, then compare step 1
    state, _ = step(state, x_flat, y_all, perm, 0)
    grads, dbg_loss = debug(state, x_flat, y_all, perm, 1)
    flat_g, _ = ravel_pytree(grads)
    flat_p, unravel = ravel_pytree(state.params)
    u, _ = tx.update(flat_g, state.opt_state, flat_p)
    expected = unravel(flat_p + u.astype(flat_p.dtype))

    new_state, metrics = step(state, x_flat, y_all, perm, 1)
    assert float(dbg_loss) == pytest.approx(float(metrics["loss"]), rel=1e-6)
    jax.tree_util.tree_map(
        lambda e, g: np.testing.assert_allclose(
            np.asarray(e), np.asarray(g), rtol=1e-5, atol=1e-6
        ),
        expected, new_state.params,
    )


def test_multichip_data_parallel_step():
    """Full train step jitted over an 8-device mesh; grads psum over ICI."""
    assert len(jax.devices()) == 8, "conftest must force 8 virtual devices"
    cfg = Config(**{**SMALL, "batch_size": 32})
    mesh = make_mesh((8,), ("data",))
    model, state, x_all, y_all, step = _setup(cfg, mesh=mesh)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
    state, metrics = step(state, x_all, y_all, perm, 1)
    assert np.isfinite(float(metrics["loss"]))


def test_multichip_matches_single_chip():
    """DP over 8 devices must be numerically equal to 1 device (same batch)."""
    cfg = Config(**{**SMALL, "batch_size": 32, "dropout": 0.0})
    mesh = make_mesh((8,), ("data",))
    _, state1, x_all, y_all, step1 = _setup(cfg)
    _, state8, _, _, step8 = _setup(cfg, mesh=mesh)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    s1, m1 = step1(state1, x_all, y_all, perm, 0)
    s8, m8 = step8(state8, x_all, y_all, perm, 0)
    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    l1 = jax.tree_util.tree_leaves(s1.params)
    l8 = jax.tree_util.tree_leaves(s8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_multichip_ae_model_matches_single_chip():
    """The ae model's full step — including the sown-intermediates collection
    and the AE-internal Adam update — under 8-device DP must equal 1 device.
    Covers the sharding of the unsupervised-update tree ops, which no other
    mesh test exercises."""
    cfg = Config(**{**SMALL, "model_name": "ae", "ae_type": "simple",
                    "batch_size": 32, "unsupervised_steps": 1})
    mesh = make_mesh((8,), ("data",))
    _, state1, x_all, y_all, step1 = _setup(cfg)
    _, state8, _, _, step8 = _setup(cfg, mesh=mesh)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    for i in range(2):
        state1, m1 = step1(state1, x_all, y_all, perm, i)
        state8, m8 = step8(state8, x_all, y_all, perm, i)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
        np.testing.assert_allclose(
            float(m1["unsupervised_loss"]), float(m8["unsupervised_loss"]), rtol=1e-5
        )
    l1 = jax.tree_util.tree_leaves(state1.params)
    l8 = jax.tree_util.tree_leaves(state8.params)
    for a, b in zip(l1, l8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6)


def test_eval_step_mask():
    cfg = Config(**SMALL)
    model, state, x_all, y_all, _ = _setup(cfg)
    ev = jax.jit(make_eval_step(cfg, model))
    img = x_all[:16]
    lab = y_all[:16]
    mask = jnp.concatenate([jnp.ones(10), jnp.zeros(6)])
    out = ev(state.params, state.model_state, img, lab, mask)
    assert float(out["count"]) == 10.0
    assert np.isfinite(float(out["loss_sum"]))


@pytest.mark.parametrize("local_learning", [False, True])
def test_multichip_nnmf_madam_matches_single_chip(local_learning):
    """The full NNMF research path — hand-derived custom VJP + Madam +
    per-step after-care — under 8-device DP must equal single-chip, for BOTH
    learning rules (round-3 verdict weak #3: the riskiest interaction was
    untested).  The VJP's grad_w divides by B*P (ops/nnmf/functional.py) where
    B is the TRACED (global) batch: under GSPMD the batch-contracted einsums
    psum across chips, so the division is by the global contribution count —
    this test pins that.  Params AND the after-care'd nnmf_weights compared
    over 4 steps.  Reference interplay: network.py:326-386 +
    nnmf/optimizer.py:224,244."""
    cfg = Config(**{**SMALL, "model_name": "gnnmf_sbs", "head": 1, "patch": 8,
                    "hidden": 32, "mlp_hidden": 32, "ffn_features": 16,
                    "md_iter": 3, "train_md_bases": True, "optimizer": "madam",
                    "local_learning": local_learning, "batch_size": 32,
                    "dropout": 0.0})
    mesh = make_mesh((8,), ("data",))
    _, state1, x_all, y_all, step1 = _setup(cfg)
    _, state8, _, _, step8 = _setup(cfg, mesh=mesh)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    for i in range(4):
        state1, m1 = step1(state1, x_all, y_all, perm, i)
        state8, m8 = step8(state8, x_all, y_all, perm, i)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]),
                                   rtol=1e-5)
    flat1 = jax.tree_util.tree_flatten_with_path(state1.params)[0]
    flat8 = {tuple(str(getattr(k, "key", k)) for k in path): leaf
             for path, leaf in
             jax.tree_util.tree_flatten_with_path(state8.params)[0]}
    saw_nnmf = False
    for path, a in flat1:
        names = tuple(str(getattr(k, "key", k)) for k in path)
        saw_nnmf = saw_nnmf or names[-1] == "nnmf_weights"
        # madam is multiplicative (p *= exp(±lr·sign)), so reduction-order
        # noise in the psummed grads passes through an exp — slightly looser
        # than the additive-optimizer mesh tests
        np.testing.assert_allclose(np.asarray(a), np.asarray(flat8[names]),
                                   rtol=1e-4, atol=1e-6, err_msg=str(names))
    assert saw_nnmf, "config produced no nnmf_weights leaves"


def test_multichip_eval_matches_single_chip():
    """Eval sharded over the data axis must equal single-device eval — incl.
    the masked padding tail — and the compiled HLO must actually partition
    (round-3 verdict weak #2: eval used to run fully replicated on every
    chip).  Reference: validation runs under the same DDP devices as training
    (main.py:223-231)."""
    cfg = Config(**SMALL)
    model, state, x_all, y_all, _ = _setup(cfg)
    mesh = make_mesh((8,), ("data",))
    ev1 = jax.jit(make_eval_step(cfg, model))
    ev8 = jax.jit(make_eval_step(cfg, model, mesh=mesh))
    img = x_all[:16]
    lab = y_all[:16]
    mask = jnp.concatenate([jnp.ones(10), jnp.zeros(6)])  # padded tail
    o1 = jax.device_get(ev1(state.params, state.model_state, img, lab, mask))
    o8 = jax.device_get(ev8(state.params, state.model_state, img, lab, mask))
    assert float(o1["count"]) == float(o8["count"]) == 10.0
    np.testing.assert_allclose(
        float(o1["loss_sum"]), float(o8["loss_sum"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(o1["correct_sum"]), float(o8["correct_sum"]), rtol=1e-6
    )
    # the partition proof: the masked sums must reduce across chips
    hlo = (
        jax.jit(make_eval_step(cfg, model, mesh=mesh))
        .lower(state.params, state.model_state, img, lab, mask)
        .compile()
        .as_text()
    )
    assert "all-reduce" in hlo, "eval HLO did not partition over the mesh"


def test_dry_run_end_to_end(tmp_path):
    from vit_cifar_tpu.train.loop import train

    cfg = Config(**SMALL).replace(
        dry_run=True, log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "models")
    )
    res = train(cfg, verbose=False)
    assert np.isfinite(res["val_loss"])
    assert (tmp_path / "models").exists()


def test_checkpoint_roundtrip(tmp_path):
    from vit_cifar_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg = Config(**SMALL)
    model, state, x_all, y_all, step = _setup(cfg)
    payload = {"params": jax.device_get(state.params), "step": 0}
    save_checkpoint(str(tmp_path / "ck"), payload, cfg)
    restored, cfg2 = load_checkpoint(str(tmp_path / "ck"), target=payload)
    assert cfg2 == cfg
    a = jax.tree_util.tree_leaves(payload["params"])
    b = jax.tree_util.tree_leaves(restored["params"])
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))


def test_nonfinite_guard_skips_update():
    """A poisoned parameter makes loss/grads non-finite; the guard must leave
    params and optimizer state untouched instead of spreading NaN."""
    cfg = Config(**SMALL)
    model, state, x_all, y_all, step = _setup(cfg)
    bad_params = jax.tree_util.tree_map(np.asarray, state.params)
    bad_params["emb"]["kernel"] = bad_params["emb"]["kernel"] + np.inf
    state = state.replace(params=jax.tree_util.tree_map(jnp.asarray, bad_params))
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    new_state, metrics = step(state, x_all, y_all, perm, 0)
    assert float(metrics["skipped_nonfinite"]) == 1.0
    # every parameter bit-identical to before (update skipped)
    for a, b in zip(jax.tree_util.tree_leaves(state.params),
                    jax.tree_util.tree_leaves(new_state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_nonfinite_guard_passes_clean_steps():
    cfg = Config(**SMALL)
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert float(metrics["skipped_nonfinite"]) == 0.0


def test_train_step_with_rcpaste():
    cfg = Config(**{**SMALL, "rcpaste": True})
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_multichip_batchnorm_model_matches_single_chip():
    """lgcnn with normalization="batch_norm" under 8-device DP must equal
    1 device — params, losses, AND the BN running stats.  This is the SyncBN
    parity claim (reference hamburger/sync_bn.py, SURVEY #56) re-proven for
    TorchBatchNorm: under GSPMD the batch mean/var reductions run over the
    GLOBAL batch (XLA inserts the cross-device psums), which is exactly what
    SynchronizedBatchNorm does with its thread-queue machinery."""
    # sgd, not adam: adam's early updates are ~sign(g)*lr, so a reduction-
    # order sign flip on a noise-scale gradient element shifts a param by
    # 2*lr — sgd keeps noise proportional, which is what an equality test
    # of the BN *sync* (not the optimizer) needs
    cfg = Config(**{**SMALL, "model_name": "lgcnn", "num_layers": 1,
                    "hidden": 32, "ffn_features": 64, "mlp_hidden": 32,
                    "batch_size": 32, "cnn_normalization": "batch_norm",
                    "optimizer": "sgd"})
    mesh = make_mesh((8,), ("data",))
    _, state1, x_all, y_all, step1 = _setup(cfg)
    _, state8, _, _, step8 = _setup(cfg, mesh=mesh)
    assert "batch_stats" in state1.model_state
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    for i in range(2):
        state1, m1 = step1(state1, x_all, y_all, perm, i)
        state8, m8 = step8(state8, x_all, y_all, perm, i)
        np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # tolerances: the cross-device mean/var psums reduce in a different
    # order than the single-device sums; the fp32 noise passes through the
    # BN rsqrt and two sgd steps (vit/ae mesh tests have no such reduction)
    for a, b in zip(jax.tree_util.tree_leaves(state1.params),
                    jax.tree_util.tree_leaves(state8.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=3e-5)
    bs1 = jax.tree_util.tree_leaves(state1.model_state["batch_stats"])
    bs8 = jax.tree_util.tree_leaves(state8.model_state["batch_stats"])
    assert bs1 and len(bs1) == len(bs8)
    for a, b in zip(bs1, bs8):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("dataset", ["c100", "svhn"])
def test_train_step_runs_for_every_dataset(dataset):
    """The reference's headline table covers c10/c100/svhn (README.md:29-39);
    c10 is exercised everywhere, this pins the other two end-to-end through
    the full train step: the 100-way head, each dataset's mean/std
    normalization, the svhn AutoAugment policy, and svhn's no-flip rule
    (utils.py:348-359 skips RandomHorizontalFlip for svhn)."""
    ncls = {"c100": 100, "svhn": 10}[dataset]
    cfg = Config(**{**SMALL, "dataset": dataset, "autoaugment": True})
    assert cfg.num_classes == ncls
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, steps_per_epoch=4)
    state = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), jnp.float32))
    rng = np.random.default_rng(0)
    n = 64
    x_all = jnp.asarray(rng.integers(0, 255, (n, 32, 32, 3), dtype=np.uint8))
    y_all = jnp.asarray(rng.integers(0, ncls, n, dtype=np.int32))
    perm = jnp.arange(n, dtype=jnp.int32)
    step = jax.jit(make_train_step(cfg, model, tx))
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
    assert state.params["fc"]["kernel"].shape[-1] == ncls
    # eval path too (per-dataset normalization constants)
    ev = jax.jit(make_eval_step(cfg, model))
    sums = ev(state.params, state.model_state, x_all[:16], y_all[:16],
              jnp.ones(16, jnp.float32))
    assert np.isfinite(float(sums["loss_sum"]))


def test_moe_fit_logs_router_balance_metric(tmp_path):
    """A MoE fit must log the epoch-mean Switch balance loss (moe_aux ~ 1.0
    for a balanced router) into metrics.csv alongside loss/acc."""
    import csv

    from vit_cifar_tpu.train.loop import train

    cfg = Config(**SMALL).replace(
        moe_experts=4, dry_run=True, log_dir=str(tmp_path / "logs"),
        ckpt_dir=str(tmp_path / "models"))
    res = train(cfg, verbose=False)
    assert np.isfinite(res["val_loss"])
    csvs = list((tmp_path / "logs").glob("*/metrics.csv"))
    assert len(csvs) == 1
    with open(csvs[0]) as f:
        rows = list(csv.DictReader(f))
    vals = [float(r["moe_aux"]) for r in rows if r.get("moe_aux")]
    assert vals and all(0.9 < v < 4.0 for v in vals)


def _tiny_raw(monkeypatch, n_train=256, n_test=64):
    """Swap the 50k synthetic dataset for a tiny one (whole-dataset paths —
    preaugment, profiling — would otherwise trace/augment 50k images on the
    CPU test box)."""
    from vit_cifar_tpu.data.datasets import RawData
    from vit_cifar_tpu.train import loop as loop_mod

    rng = np.random.default_rng(7)
    raw = RawData(
        x_train=rng.integers(0, 255, (n_train, 32, 32, 3), dtype=np.uint8),
        y_train=rng.integers(0, 10, n_train).astype(np.int32),
        x_test=rng.integers(0, 255, (n_test, 32, 32, 3), dtype=np.uint8),
        y_test=rng.integers(0, 10, n_test).astype(np.int32),
        num_classes=10, synthetic=True,
    )
    monkeypatch.setattr(loop_mod, "load_dataset", lambda *a, **k: raw)


def test_preaugment_epoch_fit(tmp_path, monkeypatch):
    """--preaugment-epoch (whole-dataset augmentation once per epoch instead
    of per-step in-step augmentation) must train end-to-end. Kept as a CLI
    option after losing the round-4 A/B (tools/ab_batch.py) because it is
    the reference's actual data-path shape (utils.py:337-368: torchvision
    transforms run per-sample before batching, not inside the train step)."""
    from vit_cifar_tpu.train.loop import train

    _tiny_raw(monkeypatch)
    cfg = Config(**SMALL).replace(
        preaugment_epoch=True, autoaugment=True, dry_run=True,
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "models"))
    res = train(cfg, verbose=False)
    assert np.isfinite(res["val_loss"])


def test_profile_dir_writes_trace(tmp_path, monkeypatch):
    """--profile-dir (SURVEY §5 tracing/profiling) must capture a jax.profiler
    trace of the steady epoch: the trace directory must exist and contain the
    plugins/profile/<ts>/ artifacts tools/profile_kernels.py consumes."""
    from vit_cifar_tpu.train.loop import train

    _tiny_raw(monkeypatch)
    prof = tmp_path / "xprof"
    cfg = Config(**SMALL).replace(
        dry_run=True, profile_dir=str(prof),
        log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "models"))
    res = train(cfg, verbose=False)
    assert np.isfinite(res["val_loss"])
    captures = list(prof.glob("plugins/profile/*"))
    assert captures, f"no profiler capture under {prof}"
