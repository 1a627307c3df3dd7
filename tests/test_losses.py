import numpy as np
import jax.numpy as jnp

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.train.losses import (
    cross_entropy,
    label_smoothing_cross_entropy,
    make_criterion,
    make_per_example_loss,
    sparse_autoencoder_loss,
)


def _np_log_softmax(x):
    x = x - x.max(axis=-1, keepdims=True)
    return x - np.log(np.exp(x).sum(axis=-1, keepdims=True))


def test_label_smoothing_matches_reference_formula():
    # criterions.py:5-19: off = s/(C-1), target gets 1-s
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 10)).astype(np.float32)
    labels = np.array([1, 3, 0, 9])
    s, C = 0.1, 10
    logp = _np_log_softmax(logits)
    true_dist = np.full_like(logp, s / (C - 1))
    true_dist[np.arange(4), labels] = 1.0 - s
    expected = np.mean(np.sum(-true_dist * logp, axis=-1))
    got = label_smoothing_cross_entropy(jnp.asarray(logits), jnp.asarray(labels), C, s)
    np.testing.assert_allclose(float(got), expected, rtol=1e-6)


def test_plain_ce():
    rng = np.random.default_rng(1)
    logits = rng.normal(size=(8, 5)).astype(np.float32)
    labels = rng.integers(0, 5, 8)
    logp = _np_log_softmax(logits)
    expected = -np.mean(logp[np.arange(8), labels])
    got = cross_entropy(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(got), expected, rtol=1e-6)


def test_criterion_dispatch():
    cfg = Config(criterion="ce", label_smoothing=True)
    fn = make_criterion(cfg)
    logits = jnp.zeros((2, 10))
    labels = jnp.array([0, 1])
    v = float(fn(logits, labels))
    assert np.isfinite(v)

    per_ex = make_per_example_loss(cfg)(logits, labels)
    assert per_ex.shape == (2,)
    np.testing.assert_allclose(float(per_ex.mean()), v, rtol=1e-6)


def test_sparse_ae_loss():
    # criterions.py:48-61: mse + l1_reg * l1(out, in)  (+ optional activity L1)
    h = jnp.ones((2, 3))
    inp = jnp.zeros((2, 4))
    out = jnp.ones((2, 4)) * 2.0
    base = sparse_autoencoder_loss(h, inp, out, l1_regularization=0.5, l1_outputs=False)
    np.testing.assert_allclose(float(base), 4.0 + 0.5 * 2.0, rtol=1e-6)
    with_acts = sparse_autoencoder_loss(h, inp, out, 0.5, True)
    np.testing.assert_allclose(float(with_acts), 4.0 + 0.5 * (2.0 + 1.0 + 2.0), rtol=1e-6)
