"""AE attention family tests.

The load-bearing test here is fast-path equivalence: the structured O(B*T*F)
attention-score computation must equal the reference's materialized
(B,T,T,F) eye-mask path exactly.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.ops.ae_attention import AEAttention, _eye_mask
from vit_cifar_tpu.ops.autoencoders import Autoencoder, Autoencoder2D, AutoencoderH, AutoencoderT


RNGS = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
        "mask": jax.random.PRNGKey(2)}


def _init_apply(model, x, **kw):
    variables = model.init(RNGS, x, deterministic=True)
    out = model.apply(variables, x, deterministic=True,
                      rngs={"mask": jax.random.PRNGKey(3)}, **kw)
    return variables, out


# --------------------------------------------------------------------------- #
# autoencoders
# --------------------------------------------------------------------------- #


def test_autoencoder_shapes():
    for ae, x_shape, h_shape in [
        (Autoencoder(input_size=12, hidden_size=5), (2, 7, 12), (2, 7, 5)),
        (AutoencoderT(seq_len=7, hidden_size=3), (2, 7, 12), (2, 12, 3)),
        (Autoencoder2D(order="sfsf", seq=7, features=12, seq_hidden=3,
                       features_hidden=5), (2, 7, 12), (2, 3, 5)),
    ]:
        variables = ae.init(RNGS, jnp.zeros(x_shape))
        out, hidden = ae.apply(variables, jnp.ones(x_shape))
        assert out.shape == x_shape
        assert hidden.shape == h_shape


def test_autoencoder_handles_4d():
    ae = AutoencoderT(seq_len=7, hidden_size=3)
    variables = ae.init(RNGS, jnp.zeros((2, 7, 12)))
    out, _ = ae.apply(variables, jnp.ones((2, 7, 7, 12)))
    assert out.shape == (2, 7, 7, 12)


def test_autoencoder_h_3d_4d():
    ae = AutoencoderH(input_size=14, hidden_size=4, heads=2)
    variables = ae.init(RNGS, jnp.zeros((2, 7, 6)))
    out3, _ = ae.apply(variables, jnp.ones((2, 7, 6)))
    assert out3.shape == (2, 7, 6)
    out4, _ = ae.apply(variables, jnp.ones((2, 7, 7, 6)))
    assert out4.shape == (2, 7, 7, 6)


def test_autoencoder2d_orders():
    for order in ["fsfs", "sffs", "sfsf"]:
        ae = Autoencoder2D(order=order, seq=7, features=12, seq_hidden=3,
                           features_hidden=5)
        variables = ae.init(RNGS, jnp.zeros((2, 7, 12)))
        out, _ = ae.apply(variables, jnp.ones((2, 7, 12)))
        assert out.shape == (2, 7, 12)


# --------------------------------------------------------------------------- #
# the fast path vs the reference's materialized mask
# --------------------------------------------------------------------------- #


def _materialized_dist(ae, ae_vars, z):
    """The reference computation (layers.py:862-881), materialized."""
    z_mask = _eye_mask(z, "zeros")
    preds = ae.apply(ae_vars, z_mask)[0]
    return jnp.sum(preds * z[:, None, :, :], axis=-1)


def test_fast_path_matches_materialized_mask():
    F = 16
    ae = Autoencoder(input_size=F, hidden_size=6)
    rng = np.random.default_rng(0)
    z = jnp.asarray(rng.normal(size=(2, 9, F)), jnp.float32)
    ae_vars = ae.init(RNGS, z)

    dist_ref = _materialized_dist(ae, ae_vars, z)

    ae_out = ae.apply(ae_vars, z)[0]
    diag = jnp.sum(ae_out * z, axis=-1)
    ae0 = ae.apply(ae_vars, jnp.zeros((1, 1, F)))[0]
    off = jnp.einsum("bjf,f->bj", z, ae0[0, 0])
    eye = jnp.eye(9)
    dist_fast = off[:, None, :] + eye[None] * (diag - off)[:, None, :]

    np.testing.assert_allclose(
        np.asarray(dist_fast), np.asarray(dist_ref), rtol=1e-4, atol=1e-5
    )


# --------------------------------------------------------------------------- #
# the mixers inside the full model
# --------------------------------------------------------------------------- #

SMALL = dict(num_layers=1, hidden=48, mlp_hidden=48, head=4, ffn_features=96,
             precision="32", batch_size=8, eval_batch_size=8, warmup_epoch=0,
             synthetic_data=True)


@pytest.mark.parametrize("ae_type", ["simple", "transpose", "heads", "2d"])
def test_ae_model_forward(ae_type):
    cfg = Config(model_name="ae", ae_type=ae_type, ae_hidden_features=16,
                 ae_hidden_seq_len=4, **SMALL)
    model, can_unsup = get_model(cfg)
    assert can_unsup
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables, out = _init_apply(model, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


@pytest.mark.parametrize("use_nnmf", [False, True])
def test_heads_chunked_mask_matches_materialized(use_nnmf):
    """AEAttentionHeads: the chunked masked-row path (mask_chunk>0) must equal
    the fully materialized (B,T,h*T,F/h) path bit-for-bit (chunking only
    changes the order tensors are built, not any arithmetic shape)."""
    from vit_cifar_tpu.ops.ae_attention import AEAttentionHeads

    kw = dict(features=48, seq_len=9, ffn_features=96, heads=4,
              ae_hidden_seq_len=4, mask_type="zeros",
              use_nnmf_layers=use_nnmf, save_attn_map=True)
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 9, 48)), jnp.float32)

    m_full = AEAttentionHeads(mask_chunk=0, **kw)
    variables = m_full.init(RNGS, x, deterministic=True)
    out_full, st_full = m_full.apply(variables, x, deterministic=True,
                                     mutable=["intermediates"])
    m_chunk = AEAttentionHeads(mask_chunk=4, **kw)  # ragged: 4+4+1 rows
    out_chunk, st_chunk = m_chunk.apply(variables, x, deterministic=True,
                                        mutable=["intermediates"])

    np.testing.assert_allclose(np.asarray(out_chunk), np.asarray(out_full),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(st_chunk["intermediates"]["attn_map"][0]),
        np.asarray(st_full["intermediates"]["attn_map"][0]),
        rtol=1e-6, atol=1e-7,
    )


def test_ae_model_random_mask_and_chunk():
    cfg = Config(model_name="ae", ae_type="simple", mask_type="random",
                 chunk=True, ae_hidden_features=16, **SMALL)
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (2, 10)


def test_ae_legacy_heads():
    cfg = Config(model_name="ae", ae_type="heads", legacy_heads=True,
                 ae_hidden_features=16, **SMALL)
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (2, 10)


def test_ae_heads_nnmf():
    cfg = Config(model_name="ae", ae_type="heads", use_nnmf_layers=True,
                 md_iter=3, ae_hidden_seq_len=8, **SMALL)
    model, _ = get_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_ae_baseline_model():
    cfg = Config(model_name="ae_baseline", ae_hidden_features=16, **SMALL)
    model, can_unsup = get_model(cfg)
    assert not can_unsup  # utils.py:281-300 never sets it
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    _, out = _init_apply(model, x)
    assert out.shape == (2, 10)


def test_ae_intermediates_exposed_for_aece():
    cfg = Config(model_name="ae", criterion="aece", ae_hidden_features=16, **SMALL)
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(RNGS, x, deterministic=True)
    out, inter = model.apply(variables, x, deterministic=True,
                             rngs={"mask": jax.random.PRNGKey(3)},
                             mutable=["intermediates"])
    mixer = inter["intermediates"]["enc0"]["mixer"]
    assert {"ae_input", "ae_output", "ae_hidden"} <= set(mixer.keys())


def test_attention_scores_are_detached():
    """The softmax is detached (layers.py:882-884): no grad reaches AE params
    from the main loss."""
    cfg = Config(model_name="ae", ae_type="simple", ae_hidden_features=16, **SMALL)
    model, _ = get_model(cfg)
    x = jnp.asarray(np.random.default_rng(1).normal(size=(2, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(RNGS, x, deterministic=True)

    def loss(params):
        out = model.apply({"params": params}, x, deterministic=True,
                          rngs={"mask": jax.random.PRNGKey(3)})
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    ae_g = g["enc0"]["mixer"]["AE"]
    assert all(
        float(jnp.abs(leaf).max()) == 0.0
        for leaf in jax.tree_util.tree_leaves(ae_g)
    )


def test_ae_train_with_aece_criterion():
    from tests.test_train_smoke import _setup

    cfg = Config(model_name="ae", criterion="aece", ae_hidden_features=16,
                 aece_l1_regularization=0.5, **SMALL)
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_unsupervised_steps_update_ae_params_only_in_inner_loop():
    from tests.test_train_smoke import _setup

    cfg = Config(model_name="ae", ae_type="simple", ae_hidden_features=16,
                 unsupervised_steps=2, **SMALL)
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    assert state.ae_opt_state is not None
    ae0 = jax.tree_util.tree_map(
        np.asarray, state.params["enc0"]["mixer"]["AE"]
    )
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert "unsupervised_loss" in metrics
    assert np.isfinite(float(metrics["unsupervised_loss"]))
    ae1 = state.params["enc0"]["mixer"]["AE"]
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), ae0, ae1
    )
    assert any(jax.tree_util.tree_leaves(moved))
    # second step must also work (ae_opt_state threading)
    state, metrics = step(state, x_all, y_all, perm, 1)
    assert np.isfinite(float(metrics["unsupervised_loss"]))


def test_ae_unsupervised_loss_decreases_over_steps():
    """The inner Adam actually minimizes the AE reconstruction loss."""
    from tests.test_train_smoke import _setup

    cfg = Config(model_name="ae", ae_type="simple", ae_hidden_features=16,
                 unsupervised_steps=1, **SMALL)
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    perm = jnp.arange(64, dtype=jnp.int32)
    losses = []
    for i in range(8):
        state, metrics = step(state, x_all, y_all, perm, 0)  # same batch
        losses.append(float(metrics["unsupervised_loss"]))
    assert losses[-1] < losses[0]
