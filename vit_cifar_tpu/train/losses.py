"""Loss functions.

Reference: criterions.py.
  * ``LabelSmoothingCrossEntropyLoss`` (criterions.py:5-19): off-target mass is
    ``smoothing/(classes-1)`` and the target gets ``1-smoothing`` — note this
    differs from the more common ``smoothing/classes`` formulation, so we
    implement it manually rather than using optax's smoothing.
  * ``AutoencoderCrossEntropyLoss`` (criterions.py:22-61): plain CE plus a
    sparse-autoencoder term per AE block: ``MSE(out, in) + l1_reg * L1``
    where L1 always includes ``L1(out, in)`` and optionally L1-to-zero of the
    hidden and output activations.  The reference pulls AE tensors out of
    module attributes (network.py:59-68); here they arrive as an explicit
    aux pytree from the model's ``intermediates``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cross_entropy(logits, labels):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], axis=-1))


def label_smoothing_cross_entropy(logits, labels, num_classes: int, smoothing: float):
    """criterions.py:5-19 exactly: off = smoothing/(C-1), on-target = 1-smoothing."""
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    off = smoothing / (num_classes - 1)
    true_dist = jnp.full_like(logp, off)
    onehot = jax.nn.one_hot(labels, num_classes, dtype=logp.dtype)
    true_dist = jnp.where(onehot > 0, 1.0 - smoothing, true_dist)
    return jnp.mean(jnp.sum(-true_dist * logp, axis=-1))


def sparse_autoencoder_loss(ae_hidden, ae_input, ae_output, l1_regularization, l1_outputs):
    """criterions.py:48-61."""
    f32 = lambda a: a.astype(jnp.float32)
    mse = jnp.mean((f32(ae_output) - f32(ae_input)) ** 2)
    l1 = jnp.mean(jnp.abs(f32(ae_output) - f32(ae_input)))
    if l1_outputs:
        l1 = l1 + jnp.mean(jnp.abs(f32(ae_hidden))) + jnp.mean(jnp.abs(f32(ae_output)))
    return mse + l1_regularization * l1


def make_per_example_loss(cfg):
    """Per-example criterion for masked eval reduction.

    The reference's validation loss runs the training criterion on each val
    batch (network.py:388-395); for ``aece`` we fall back to plain CE for the
    scalar val metric (the AE term needs intermediates and is a training
    regulariser, not a model-quality measure).
    """
    use_smoothing = cfg.criterion == "ce" and cfg.label_smoothing

    def per_example(logits, labels):
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if use_smoothing:
            off = cfg.smoothing / (cfg.num_classes - 1)
            true_dist = jnp.full_like(logp, off)
            onehot = jax.nn.one_hot(labels, cfg.num_classes, dtype=logp.dtype)
            true_dist = jnp.where(onehot > 0, 1.0 - cfg.smoothing, true_dist)
            return jnp.sum(-true_dist * logp, axis=-1)
        return -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]

    return per_example


def make_criterion(cfg):
    """Returns loss_fn(logits, labels, aux) mirroring utils.get_criterion (utils.py:47-63)."""
    if cfg.criterion == "ce":
        if cfg.label_smoothing:

            def ce(logits, labels, aux=None):
                return label_smoothing_cross_entropy(
                    logits, labels, cfg.num_classes, cfg.smoothing
                )

        else:

            def ce(logits, labels, aux=None):
                return cross_entropy(logits, labels)

        return ce

    if cfg.criterion == "aece":

        def aece(logits, labels, aux=None):
            loss = cross_entropy(logits, labels)
            ae_terms = (aux or {}).get("ae", [])
            assert ae_terms, "aece criterion requires a model exposing AE tensors"
            for hidden, inp, out in ae_terms:
                loss = loss + sparse_autoencoder_loss(
                    hidden, inp, out, cfg.aece_l1_regularization, cfg.aece_l1_outputs
                )
            return loss

        return aece

    raise NotImplementedError(f"Unknown criterion: {cfg.criterion}")
