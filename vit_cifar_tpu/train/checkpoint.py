"""Checkpoint save/restore via Orbax.

Reference: Lightning ``ModelCheckpoint(save_top_k=1, monitor="val_loss",
mode="min")`` (main.py:213-219), final ``trainer.save_checkpoint`` to
``models/{experiment}.ckpt`` (main.py:234-236), and ``load_run_model``
rebuilding the model from the checkpoint's embedded hyperparameters
(run_model.py:6-37).  Here a checkpoint is (params, model_state, opt_state,
step, epoch) plus the full Config JSON, so a checkpoint is self-describing
the same way.
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from ..config import Config


def _abspath(p: str) -> str:
    return os.path.abspath(os.path.expanduser(p))


class BestCheckpointer:
    """save_top_k=1 on min val_loss + a 'last' checkpoint, Orbax-backed."""

    def __init__(self, ckpt_dir: str, experiment: str, cfg: Config):
        self.root = _abspath(os.path.join(ckpt_dir, experiment))
        os.makedirs(self.root, exist_ok=True)
        self.cfg = cfg
        self.best_val_loss = float("inf")
        self._ckptr = ocp.StandardCheckpointer()
        with open(os.path.join(self.root, "config.json"), "w") as f:
            f.write(cfg.to_json())

    def _save(self, name: str, payload: dict[str, Any]):
        path = os.path.join(self.root, name)
        payload = jax.tree_util.tree_map(np.asarray, jax.device_get(payload))
        self._ckptr.save(path, payload, force=True)
        self._ckptr.wait_until_finished()

    def seed_best_from(self, resume_dir: str):
        """Restore the best-so-far val_loss from a prior run's best.json —
        parity with Lightning ModelCheckpoint restoring best_model_score on
        resume (otherwise the first post-resume epoch overwrites 'best' with
        a possibly-worse model)."""
        for root in (_abspath(resume_dir), self.root):
            best_json = os.path.join(root, "best.json")
            if os.path.exists(best_json):
                with open(best_json) as f:
                    self.best_val_loss = float(json.load(f)["val_loss"])
                return

    def maybe_save_best(self, val_loss: float, epoch: int, payload: dict[str, Any]) -> bool:
        if val_loss < self.best_val_loss:
            self.best_val_loss = float(val_loss)
            self._save("best", payload)
            with open(os.path.join(self.root, "best.json"), "w") as f:
                json.dump({"val_loss": self.best_val_loss, "epoch": epoch}, f)
            return True
        return False

    def save_last(self, payload: dict[str, Any]):
        self._save("last", payload)


def save_checkpoint(path: str, payload: dict[str, Any], cfg: Config):
    path = _abspath(path)
    os.makedirs(path, exist_ok=True)
    ckptr = ocp.StandardCheckpointer()
    payload = jax.tree_util.tree_map(np.asarray, jax.device_get(payload))
    ckptr.save(os.path.join(path, "state"), payload, force=True)
    ckptr.wait_until_finished()
    with open(os.path.join(path, "config.json"), "w") as f:
        f.write(cfg.to_json())


def load_checkpoint(path: str, target=None, prefer: str = "best") -> tuple[dict[str, Any], Config]:
    """Restore (payload, cfg).  ``target`` is an example pytree for structure.

    ``prefer`` picks between the BestCheckpointer's 'best' and 'last' states
    (analysis wants best; training resume wants last)."""
    path = _abspath(path)
    with open(os.path.join(path, "config.json")) as f:
        cfg = Config.from_json(f.read())
    ckptr = ocp.StandardCheckpointer()
    state_path = os.path.join(path, "state")
    if not os.path.exists(state_path):  # BestCheckpointer layout
        order = ("best", "last") if prefer == "best" else ("last", "best")
        for name in order:
            cand = os.path.join(path, name)
            if os.path.exists(cand):
                state_path = cand
                break
    payload = ckptr.restore(state_path, target)
    return payload, cfg
