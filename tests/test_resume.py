"""Checkpoint-resume: optimizer state survives the round-trip and a resumed
run continues the interrupted one bit-for-bit.

Reference capability: Lightning checkpoints embed optimizer + scheduler state
(``trainer.save_checkpoint``, main.py:234-236), so ``fit(ckpt_path=...)``
continues seamlessly.  Here the checkpoint carries the full TrainState.
"""

import jax
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.train.loop import train

# big batch -> few steps/epoch so the CPU run stays fast
SMALL = dict(model_name="vit", num_layers=1, hidden=32, mlp_hidden=32, head=4,
             batch_size=12800, eval_batch_size=5000, precision="32",
             synthetic_data=True, warmup_epoch=0, max_epochs=3,
             label_smoothing=True)


def _params_of(ckpt_dir):
    from vit_cifar_tpu.train.checkpoint import load_checkpoint

    payload, _ = load_checkpoint(ckpt_dir, prefer="last")
    return payload


def test_resume_continues_bit_for_bit(tmp_path):
    # run A: 3 epochs straight through
    cfg_a = Config(**SMALL).replace(
        log_dir=str(tmp_path / "la"), ckpt_dir=str(tmp_path / "ma"))
    res_a = train(cfg_a, verbose=False)

    # run B: interrupted after 2 epochs (same max_epochs — the LR schedule
    # depends on it), then resumed for the 3rd
    cfg_b1 = Config(**SMALL).replace(
        log_dir=str(tmp_path / "lb1"), ckpt_dir=str(tmp_path / "mb1"))
    res_b1 = train(cfg_b1, verbose=False, stop_after=2)
    cfg_b2 = Config(**SMALL).replace(
        resume=res_b1["ckpt_dir"],
        log_dir=str(tmp_path / "lb2"), ckpt_dir=str(tmp_path / "mb2"))
    res_b2 = train(cfg_b2, verbose=False)

    # the resumed run executed only epoch 2
    assert len(res_b2["history"]) == 1
    # and its final state equals the straight-through run's
    pa = _params_of(res_a["ckpt_dir"])
    pb = _params_of(res_b2["ckpt_dir"])
    assert pa["step"] == pb["step"]
    for a, b in zip(jax.tree_util.tree_leaves(pa["params"]),
                    jax.tree_util.tree_leaves(pb["params"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # optimizer moments too (the whole point of full-state checkpoints)
    for a, b in zip(jax.tree_util.tree_leaves(pa["opt_state"]),
                    jax.tree_util.tree_leaves(pb["opt_state"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # and the training curve continues seamlessly
    np.testing.assert_allclose(
        res_a["history"][2]["loss"], res_b2["history"][0]["loss"], rtol=1e-6)


def test_resume_of_finished_run_evaluates(tmp_path):
    """Resuming a run whose epochs are exhausted must not crash: it restores,
    evaluates, and reports the same val metrics as the original run."""
    cfg = Config(**SMALL).replace(
        max_epochs=1, log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    res = train(cfg, verbose=False)
    cfg2 = cfg.replace(resume=res["ckpt_dir"],
                       log_dir=str(tmp_path / "l2"), ckpt_dir=str(tmp_path / "m2"))
    res2 = train(cfg2, verbose=False)
    assert res2["val_loss"] is not None
    np.testing.assert_allclose(res2["val_loss"], res["val_loss"], rtol=1e-6)
    np.testing.assert_allclose(res2["val_acc"], res["val_acc"], rtol=1e-6)


def test_resume_seeds_best_val_loss(tmp_path):
    """Lightning's ModelCheckpoint restores best_model_score on resume; the
    BestCheckpointer must seed best_val_loss from the prior run's best.json so
    the first post-resume epoch cannot overwrite 'best' with a worse model
    (round-2 advisor, medium)."""
    import json
    import os

    from vit_cifar_tpu.train.checkpoint import BestCheckpointer

    cfg = Config(**SMALL).replace(
        max_epochs=1, log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    res = train(cfg, verbose=False)
    with open(os.path.join(res["ckpt_dir"], "best.json")) as f:
        prior_best = json.load(f)["val_loss"]

    ckpt = BestCheckpointer(str(tmp_path / "m2"), "exp", cfg)
    assert ckpt.best_val_loss == float("inf")
    ckpt.seed_best_from(res["ckpt_dir"])
    assert ckpt.best_val_loss == prior_best
    # a worse epoch must NOT become the new best
    assert not ckpt.maybe_save_best(prior_best + 1.0, 0, {"x": np.zeros(1)})
    assert ckpt.maybe_save_best(prior_best - 0.1, 1, {"x": np.zeros(1)})


def test_checkpoint_payload_contains_optimizer_state(tmp_path):
    cfg = Config(**SMALL).replace(
        max_epochs=1, log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    res = train(cfg, verbose=False)
    payload = _params_of(res["ckpt_dir"])
    assert "opt_state" in payload and "rng" in payload
    # adam moments are non-trivial after a step
    leaves = jax.tree_util.tree_leaves(payload["opt_state"])
    assert any(np.abs(np.asarray(l)).max() > 0 for l in leaves if hasattr(l, "shape"))
