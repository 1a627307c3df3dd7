"""Optimizers and LR schedule.

Reference: ``Net.configure_optimizers`` (network.py:70-122).

Schedule: CosineAnnealingLR(T_max=max_epochs, eta_min=min_lr) wrapped in
GradualWarmupScheduler(multiplier=1.0, total_epoch=warmup_epoch) and stepped
**per epoch** (network.py:113-122).  Three deliberate quirks preserved
(verified by simulating the actual warmup_scheduler package + torch
CosineAnnealingLR under Lightning's per-epoch stepping):
  * warmup is linear from 0 (multiplier=1.0 semantics), reaching base lr at
    ``warmup_epoch``;
  * epochs ``warmup_epoch`` AND ``warmup_epoch + 1`` BOTH run at base lr:
    GradualWarmupScheduler returns the un-stepped after_scheduler's lr for
    one extra epoch before it starts stepping it, so the cosine phase is
    delayed by one epoch (cos_epoch = epoch - warmup_epoch - 1);
  * the cosine phase uses T_max = max_epochs while fewer cosine epochs
    actually run, so the lr never quite reaches ``min_lr`` — exactly like
    the reference.
With ``warmup_epoch=0`` the reference package raises ZeroDivisionError at
construction; our extension runs pure cosine from epoch 0 (no double-base
epoch) — the only reachable deviation, documented here.

Optimizers: adam/sgd are torch-semantics (weight decay added to the gradient
*before* the moment updates — classic L2, not AdamW).  ``madam``
(nnmf/optimizer.py) routes NNMF weights to a multiplicative tanh update and
everything else to adam; it is wired in ``make_optimizer`` via an optax
multi_transform keyed on parameter names containing ``nnmf``/``_weights``
(network.py:90-96).
"""

from __future__ import annotations

import jax.numpy as jnp
import optax

from ..config import Config


def warmup_cosine_epoch_schedule(
    base_lr: float,
    min_lr: float,
    warmup_epoch: int,
    max_epochs: int,
    steps_per_epoch: int,
):
    """Per-epoch warmup->cosine, evaluated from the global step count."""

    def schedule(count):
        epoch = count // steps_per_epoch
        warm = base_lr * epoch / max(warmup_epoch, 1)
        # the package holds base lr for epochs W and W+1 before stepping the
        # cosine (see module docstring); with W=0 it runs pure cosine from 0
        delay = 1 if warmup_epoch > 0 else 0
        cos_epoch = jnp.maximum(epoch - warmup_epoch - delay, 0)
        cos = min_lr + (base_lr - min_lr) * 0.5 * (
            1.0 + jnp.cos(jnp.pi * cos_epoch / max_epochs)
        )
        return jnp.where(epoch < warmup_epoch, warm, cos)

    return schedule


def flatten_transform(inner: optax.GradientTransformation) -> optax.GradientTransformation:
    """Run ``inner`` on one raveled parameter vector instead of per-leaf.

    The per-leaf update lowers to a few small kernels per parameter tensor —
    measured 1.45 ms/step for the 70-leaf flagship ViT, 3.5x the cost of the
    entire forward+backward — while the same elementwise math on a single
    flat (6.3M,) vector takes 0.02 ms.  Exactly equivalent for elementwise
    transforms (adam moments, sgd momentum, weight decay, lr scaling): they
    all commute with concatenation.  ``ravel_pytree``'s unravel restores each
    leaf's original dtype, so the applied updates are bit-identical
    (tests/test_optim_flat.py).
    """
    from jax.flatten_util import ravel_pytree

    def init(params):
        flat, _ = ravel_pytree(params)
        return inner.init(flat)

    def update(grads, state, params=None):
        flat_g, unravel = ravel_pytree(grads)
        flat_p = ravel_pytree(params)[0] if params is not None else None
        flat_u, state = inner.update(flat_g, state, flat_p)
        return unravel(flat_u), state

    return optax.GradientTransformation(init, update)


def main_optimizer_frozen_fn(cfg):
    """torch optimizers SKIP params whose ``.grad`` is None (no autograd
    path).  For the AE family under the plain ``ce`` criterion the AE subtree
    and (except heads-without-chunk, layers.py:989-992, where x itself is
    normalized) the detached ``norm1`` have no grad path — everything
    downstream of them is stop-gradient'd — so the reference's main optimizer
    never touches them (network.py:70-112 passes all params, but torch skips
    None-grads): in particular they receive NO weight decay and no adam
    moments.  Our grads for those leaves are exactly zero; masking the decay
    term to zero as well (steps.py passes decay-masked params to tx.update)
    makes the main update exactly zero — the optax equivalent of torch's
    skip.  Returns ``frozen(path)->bool`` or None when no leaf is frozen.

    Two frozen classes:
      * ae + ce: the detached AE/norm1 subtrees (above);
      * non-trainable NNMF weights (effective ``w_trainable`` False): the
        reference's custom backward returns ``grad_weights = None`` for them
        (NNMFLinear.py:377-381) so torch's optimizer skips them EVERYWHERE —
        including AE-internal NNMFLinears under the ``aece`` criterion, where
        the rest of the AE does get main-optimizer grads; our custom VJP
        zeroes their grad (functional.py), leaving only the decay term to
        mask.  Effective trainability comes from
        ``nnmf_weight_trainable`` (ops/nnmf/layers.py): everything follows
        ``--train-md-bases`` except the heads-NNMF AE weight, which the
        reference builds ``w_trainable=True`` unconditionally
        (layers.py:941).

    The masked-params view is exact for madam too: its update is
    ``p * (factor(mu(g+wd*p), nu, p) - 1)``, and every factor reads the same
    zeroed view, so the update is exactly zero and moments stay zero.
    """
    rules = []
    if cfg.model_name == "ae" and cfg.criterion != "aece":
        norm1_has_path = (
            cfg.ae_type == "heads" and not cfg.legacy_heads and not cfg.chunk
        )

        def ae_rule(names) -> bool:
            for a, b in zip(names, names[1:]):
                if a == "mixer" and b == "AE":
                    return True
                if a == "mixer" and b == "norm1" and not norm1_has_path:
                    return True
            return False

        rules.append(ae_rule)
    if not cfg.train_md_bases:
        from ..ops.nnmf.layers import nnmf_weight_trainable

        def nnmf_rule(names) -> bool:
            return (
                bool(names)
                and names[-1] == "nnmf_weights"
                and not nnmf_weight_trainable(names, cfg.train_md_bases)
            )

        rules.append(nnmf_rule)
    if not rules:
        return None

    def frozen(path: tuple) -> bool:
        names = [str(p) for p in path]
        return any(r(names) for r in rules)

    return frozen


def zero_frozen_leaves(params, frozen):
    """Zero the leaves ``frozen(path)`` selects (for the decay-params view
    passed to tx.update); other leaves pass through untouched."""
    import jax

    def f(path, p):
        names = tuple(getattr(k, "key", getattr(k, "name", k)) for k in path)
        return jnp.zeros_like(p) if frozen(names) else p

    return jax.tree_util.tree_map_with_path(f, params)


def _nnmf_param_label(path: tuple) -> str:
    """Reference routes params whose name contains 'nnmf' or '_weights' to the
    NNMF group (network.py:90-96)."""
    flat = "/".join(str(p) for p in path).lower()
    return "nnmf" if ("nnmf" in flat or "_weights" in flat) else "other"


def uses_flat_optimizer(cfg: Config) -> bool:
    """True when make_optimizer wraps the chain in flatten_transform — the
    train step then runs guard + update + apply on the raveled vector too
    (steps.py), collapsing hundreds of per-leaf kernels into a handful.

    Disabled under tensor parallelism: a raveled vector concatenates params
    with different "model"-axis layouts, which would force an all-gather per
    step; the treewise update keeps each shard local."""
    if "model" in cfg.mesh_axes and cfg.mesh_shape:
        if cfg.mesh_shape[cfg.mesh_axes.index("model")] > 1:
            return False
    return cfg.flat_optimizer and cfg.optimizer in ("adam", "sgd")


def make_optimizer(cfg: Config, steps_per_epoch: int, params=None) -> optax.GradientTransformation:
    schedule = warmup_cosine_epoch_schedule(
        cfg.lr, cfg.min_lr, cfg.warmup_epoch, cfg.max_epochs, steps_per_epoch
    )

    # adam/sgd are elementwise chains -> run them on one raveled vector
    # (cfg.flat_optimizer); madam needs per-name routing and stays treewise.
    maybe_flat = flatten_transform if uses_flat_optimizer(cfg) else (lambda tx: tx)
    if cfg.optimizer == "adam":
        return maybe_flat(optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        ))
    if cfg.optimizer == "sgd":
        return maybe_flat(optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.trace(decay=cfg.beta1),
            optax.scale_by_learning_rate(schedule),
        ))
    if cfg.optimizer == "madam":
        from ..ops.nnmf.optimizer import scale_by_madam

        nnmf_schedule = warmup_cosine_epoch_schedule(
            cfg.lr_nnmf, cfg.min_lr, cfg.warmup_epoch, cfg.max_epochs, steps_per_epoch
        )
        adam_tx = optax.chain(
            optax.add_decayed_weights(cfg.weight_decay),
            optax.scale_by_adam(b1=cfg.beta1, b2=cfg.beta2, eps=1e-8),
            optax.scale_by_learning_rate(schedule),
        )
        madam_tx = scale_by_madam(
            nnmf_schedule, b1=cfg.beta1, b2=cfg.beta2, eps=1e-8,
            weight_decay=cfg.weight_decay,
        )
        import jax

        def labeler(ps):
            flat = jax.tree_util.tree_flatten_with_path(ps)[0]
            # rebuild a pytree of labels with the same structure
            labels = [
                _nnmf_param_label(tuple(getattr(k, "key", getattr(k, "name", k)) for k in path))
                for path, _ in flat
            ]
            treedef = jax.tree_util.tree_structure(ps)
            return jax.tree_util.tree_unflatten(treedef, labels)

        return optax.multi_transform({"other": adam_tx, "nnmf": madam_tx}, labeler)
    raise NotImplementedError(f"Unknown optimizer: {cfg.optimizer}")
