"""Load a trained checkpoint and run one attention-capturing forward pass.

Reference: run_model.py — ``torch.load`` the checkpoint, rebuild args from the
embedded ``hyper_parameters`` (with back-compat patching, run_model.py:17-24),
``load_state_dict(strict=False)``, flip ``save_attn_map`` on every module, one
no-grad forward on a test batch (run_model.py:6-62).

Here a checkpoint directory is self-describing (config.json + orbax state),
so the equivalent is: read the config, rebuild the model with
``save_attn_map=True``, restore params, forward a test batch with
``mutable=['intermediates']``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from ..config import Config
from ..data.augment import normalize
from ..data.datasets import load_dataset
from ..models import get_model
from ..train.checkpoint import load_checkpoint


def load_run_model(
    model_path: str,
    batch_size: int | None = None,
    which: str = "best",
):
    """-> (model, variables, imgs_u8, out, intermediates).

    ``model_path`` is a checkpoint directory produced by training
    (``models/{experiment}/`` with config.json + best/last).
    """
    payload, cfg = load_checkpoint(model_path)
    if batch_size is not None:
        cfg = cfg.replace(eval_batch_size=batch_size)
    cfg = cfg.replace(save_attn_map=True)

    model, _ = get_model(cfg)
    params = payload["params"]
    model_state = payload.get("model_state", {}) or {}

    raw = load_dataset(cfg.dataset, cfg.data_dir, cfg.synthetic_data)
    imgs = raw.x_test[: cfg.eval_batch_size]
    x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(cfg.compute_dtype)

    variables = {"params": params, **model_state}
    out, inter = model.apply(
        variables,
        x,
        deterministic=True,
        rngs={"mask": jax.random.PRNGKey(0)},
        mutable=["intermediates"],
    )
    return model, variables, np.asarray(imgs), np.asarray(out), inter["intermediates"]


def run_on_images(model_path: str, imgs_u8, which: str = "best"):
    """Attention-capturing forward on USER-SUPPLIED uint8 images.

    Same restore + ``save_attn_map`` path as :func:`load_run_model`, but the
    batch is caller-provided (the live dashboard server's ad-hoc-input
    exploration — reference dashboard.py:176-200 recomputes on the picked
    model server-side the same way).  ``imgs_u8``: (B, img_size, img_size,
    in_c) uint8.  -> (cfg, logits, intermediates).
    """
    payload, cfg = load_checkpoint(model_path, prefer=which)
    cfg = cfg.replace(save_attn_map=True)
    model, _ = get_model(cfg)
    variables = {"params": payload["params"],
                 **(payload.get("model_state", {}) or {})}
    imgs = np.asarray(imgs_u8, np.uint8)
    assert imgs.ndim == 4 and imgs.shape[1:] == (
        cfg.img_size, cfg.img_size, cfg.in_c
    ), f"expected (B,{cfg.img_size},{cfg.img_size},{cfg.in_c}) uint8, got {imgs.shape}"
    x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(cfg.compute_dtype)
    out, inter = model.apply(
        variables, x, deterministic=True,
        rngs={"mask": jax.random.PRNGKey(0)}, mutable=["intermediates"],
    )
    return cfg, np.asarray(out), inter["intermediates"]


def find_checkpoints(ckpt_dir: str = "models") -> list[str]:
    """Checkpoint directories under ``ckpt_dir``, oldest first (dashboard
    model picker — its ``[-max_models:]`` slice then keeps the newest)."""
    if not os.path.isdir(ckpt_dir):
        return []
    out = []
    for name in os.listdir(ckpt_dir):
        p = os.path.join(ckpt_dir, name)
        if os.path.isdir(p) and os.path.exists(os.path.join(p, "config.json")):
            out.append(p)
    return sorted(out, key=lambda p: (os.path.getmtime(p), p))
