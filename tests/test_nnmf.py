"""NNMF stack tests.

The custom VJP is checked against an independent numpy implementation of the
reference's hand-derived rule (NOT finite differences — the reference backward
is deliberately not the exact derivative of the forward).  The forward is
checked against an independent numpy loop; unfold ordering is cross-checked
against torch.nn.functional.unfold (torch-cpu is available in this image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.ops.nnmf.functional import make_nnmf_op, unfold
from vit_cifar_tpu.ops.nnmf.layers import (
    AutoNNMFLayer,
    NNMFConv2d,
    NNMFEncoderDecoder,
    NNMFLinear,
    nnmf_after_care,
)
from vit_cifar_tpu.ops.nnmf.optimizer import scale_by_madam


def _np_forward(inp, w, iterations, eps0=1.0, eps=1e-20):
    """Independent numpy port of NNMFLayerSbSBP.py:343-361."""
    B, C, P = inp.shape
    M = w.shape[1]
    h = np.full((B, M, P), 1.0 / M)
    for _ in range(iterations):
        # h_w[b,c,m,p] = h[m]W[c,m] / (sum_m + eps), then * input, sum over c
        h_w = h[:, None, :, :] * w[None, :, :, None]  # (B,C,M,P)
        h_w = h_w / (h_w.sum(axis=2, keepdims=True) + eps)
        h_new = (h_w * inp[:, :, None, :]).sum(axis=1)
        h = h + eps0 * h_new if eps0 > 0 else h_new
        h = h / (h.sum(axis=1, keepdims=True) + eps)
    return h


def _np_backward(inp, w, h_out, g, local_learning=False, clamp=False,
                 divide=True):
    """Independent numpy port of NNMFLayerSbSBP.py:432-506."""
    B, C, P = inp.shape
    inp = inp / (inp.sum(axis=1, keepdims=True) + 1e-20)
    r = w[None, :, :, None] * h_out[:, None, :, :]  # (B,C,M,P)
    bigr = r.sum(axis=2)  # (B,C,P)
    z = r / (bigr[:, :, None, :] + 1e-20)
    grad_input = (z * g[:, None, :, :]).sum(axis=2)
    if local_learning:
        grad_w = (-2 * (inp - bigr)[:, :, None, :] * h_out[:, None, :, :]).sum(
            axis=(0, 3)
        )
    else:
        f = h_out[:, None, :, :] * (inp / (bigr**2 + 1e-20))[:, :, None, :]
        omega = bigr[:, :, None, :] * g[:, None, :, :]
        omega = omega - (r * g[:, None, :, :]).sum(axis=2, keepdims=True)
        grad_w = (f * omega).sum(axis=(0, 3))
    if divide:
        grad_w = grad_w / (B * P)
    if clamp:
        grad_input = np.clip(grad_input, -5, 5)
        grad_w = np.clip(grad_w, -5, 5)
    return grad_input, grad_w


def _rand_problem(B=3, C=6, M=5, P=4, seed=0):
    rng = np.random.default_rng(seed)
    inp = rng.uniform(0.1, 1.0, (B, C, P))
    inp = inp / inp.sum(axis=1, keepdims=True)
    w = rng.uniform(0.1, 1.0, (C, M))
    w = w / w.sum(axis=0, keepdims=True)
    return inp.astype(np.float32), w.astype(np.float32)


def test_forward_matches_reference_math():
    inp, w = _rand_problem()
    op = make_nnmf_op(iterations=5)
    got = np.asarray(op(jnp.asarray(inp), jnp.asarray(w)))
    expected = _np_forward(inp, w, 5)
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-6)
    # h stays a distribution over M
    np.testing.assert_allclose(got.sum(axis=1), 1.0, rtol=1e-4)


@pytest.mark.parametrize("local_learning", [False, True])
@pytest.mark.parametrize("clamp", [False, True])
def test_custom_vjp_matches_reference_rule(local_learning, clamp):
    inp, w = _rand_problem(seed=1)
    op = make_nnmf_op(
        iterations=4, local_learning=local_learning, w_trainable=True,
        clamp_grad=clamp,
    )
    rng = np.random.default_rng(2)
    g = rng.normal(size=(3, 5, 4)).astype(np.float32) * (10 if clamp else 1)

    h, vjp_fn = jax.vjp(op, jnp.asarray(inp), jnp.asarray(w))
    gi, gw = vjp_fn(jnp.asarray(g))

    h_np = _np_forward(inp, w, 4)
    gi_e, gw_e = _np_backward(inp, w, h_np, g, local_learning, clamp)
    np.testing.assert_allclose(np.asarray(gi), gi_e, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), gw_e, rtol=1e-4, atol=1e-5)


def test_scale_grad_normalizes_by_max():
    inp, w = _rand_problem(seed=3)
    op_scaled = make_nnmf_op(iterations=3, w_trainable=True, scale_grad=True)
    op_plain = make_nnmf_op(iterations=3, w_trainable=True, scale_grad=False)
    g = np.full((3, 5, 4), 8.0, np.float32)
    _, vjp_s = jax.vjp(op_scaled, jnp.asarray(inp), jnp.asarray(w))
    _, vjp_p = jax.vjp(op_plain, jnp.asarray(inp), jnp.asarray(w))
    gi_s, _ = vjp_s(jnp.asarray(g))
    gi_p, _ = vjp_p(jnp.asarray(g / 8.0))
    np.testing.assert_allclose(np.asarray(gi_s), np.asarray(gi_p), rtol=1e-5)


def test_unfold_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 3, 8, 6)).astype(np.float32)
    got = np.asarray(unfold(jnp.asarray(x), (3, 2), strides=(1, 1)))
    B, CK, Hp, Wp = got.shape
    expected = F.unfold(torch.from_numpy(x), kernel_size=(3, 2)).numpy()
    assert expected.shape == (2, CK, Hp * Wp)
    np.testing.assert_allclose(got.reshape(2, CK, -1), expected, rtol=1e-6)


def test_fold_matches_torch():
    """fold == torch F.fold on an overlapping-stride configuration (the
    general NNMF decode path, AutoNNMFLayer.py:315-329)."""
    import torch
    import torch.nn.functional as F

    rng = np.random.default_rng(1)
    kh, kw, stride, pad = 3, 2, (2, 1), (1, 0)
    x_shape = (2, 3, 8, 6)
    Hp = (x_shape[2] + 2 * pad[0] - kh) // stride[0] + 1
    Wp = (x_shape[3] + 2 * pad[1] - kw) // stride[1] + 1
    patches = rng.normal(size=(2, 3 * kh * kw, Hp, Wp)).astype(np.float32)
    from vit_cifar_tpu.ops.nnmf.functional import fold

    got = np.asarray(
        fold(jnp.asarray(patches), (8, 6), (kh, kw), stride, pad)
    )
    expected = F.fold(
        torch.from_numpy(patches.reshape(2, 3 * kh * kw, -1)),
        output_size=(8, 6), kernel_size=(kh, kw), stride=stride, padding=pad,
    ).numpy()
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-6)


def test_auto_nnmf_general_decode_matches_torch_fold():
    """AutoNNMFLayer with an overlapping kernel: decode == torch
    fold(einsum(W_detached, h)) — the conv_transpose2d path the zoo never
    exercises (AutoNNMFLayer.py:315-329) now works."""
    import torch
    import torch.nn.functional as F

    layer = AutoNNMFLayer(
        number_of_input_neurons=2,
        number_of_neurons=6,
        input_size=(8, 6),
        forward_kernel_size=(3, 3),
        strides=(2, 2),
        padding=(1, 1),
        number_of_iterations=3,
        w_trainable=True,
    )
    rng = np.random.default_rng(2)
    x = jnp.asarray(np.abs(rng.normal(size=(2, 2, 8, 6))), jnp.float32)
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    out, state = layer.apply(variables, x, mutable=["intermediates"])
    assert out.shape == (2, 2, 8, 6)
    assert bool(jnp.all(jnp.isfinite(out)))
    # independent torch recomputation of the decode from the sown hidden
    h = np.asarray(state["intermediates"]["hidden_activity"][0])  # (B,M,Hp,Wp)
    w = np.asarray(variables["params"]["nnmf_weights"])  # (C, M)
    B, M, Hp, Wp = h.shape
    decoded = np.einsum("cm,bmhw->bchw", w, h).reshape(B, -1, Hp * Wp)
    expected = F.fold(
        torch.from_numpy(decoded), output_size=(8, 6), kernel_size=(3, 3),
        stride=(2, 2), padding=(1, 1),
    ).numpy()
    np.testing.assert_allclose(np.asarray(out), expected, rtol=1e-5, atol=1e-5)


def test_encoder_decoder_general_decode():
    """NNMFEncoderDecoder with kernel != input_size (conv_transpose2d path,
    NNMFLayerSbSBP.py:528-547): shape round-trip + finite."""
    layer = NNMFEncoderDecoder(
        number_of_input_neurons=1,
        number_of_neurons=5,
        input_size=(10, 12),
        forward_kernel_size=(10, 1),
        number_of_iterations=3,
    )
    x = jnp.asarray(
        np.abs(np.random.default_rng(3).normal(size=(2, 1, 10, 12))), jnp.float32
    )
    variables = layer.init({"params": jax.random.PRNGKey(0)}, x)
    out = layer.apply(variables, x)
    assert out.shape == (2, 1, 10, 12)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_nnmf_conv2d_layer():
    layer = NNMFConv2d(
        number_of_input_neurons=1,
        number_of_neurons=10,
        input_size=(10, 12),
        forward_kernel_size=(10, 1),
        number_of_iterations=4,
        w_trainable=True,
    )
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 1, 10, 12)),
                    jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    w = variables["params"]["nnmf_weights"]
    assert w.shape == (10, 10)
    np.testing.assert_allclose(np.asarray(w.sum(0)), 1.0, rtol=1e-5)
    out = layer.apply(variables, x)
    assert out.shape == (2, 10, 1, 12)
    # outputs are distributions over neurons
    np.testing.assert_allclose(np.asarray(out.sum(1)), 1.0, rtol=1e-4)


def test_auto_nnmf_layer_decodes_to_input_shape():
    layer = AutoNNMFLayer(
        number_of_input_neurons=1,
        number_of_neurons=16,
        input_size=(9, 8),
        forward_kernel_size=(9, 8),
        number_of_iterations=3,
        w_trainable=True,
    )
    x = jnp.asarray(np.random.default_rng(1).uniform(0, 1, (2, 1, 9, 8)),
                    jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out, inter = layer.apply(variables, x, mutable=["intermediates"])
    assert out.shape == x.shape
    hidden = inter["intermediates"]["hidden_activity"][0]
    assert hidden.shape == (2, 16, 1, 1)
    # decoder weights are detached: grads flow to nnmf_weights only via encoder
    def loss(params):
        return jnp.sum(layer.apply({"params": params}, x) ** 2)

    g = jax.grad(loss)(variables["params"])
    assert bool(jnp.all(jnp.isfinite(g["nnmf_weights"])))


def test_nnmf_linear():
    layer = NNMFLinear(
        number_of_input_neurons=12, number_of_neurons=6,
        number_of_iterations=4, w_trainable=True,
    )
    x = jnp.asarray(np.random.default_rng(2).uniform(0, 1, (5, 12)), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    out = layer.apply(variables, x)
    assert out.shape == (5, 6)
    np.testing.assert_allclose(np.asarray(out.sum(-1)), 1.0, rtol=1e-4)


def test_after_care():
    params = {
        "a": {"nnmf_weights": jnp.asarray([[0.9999, 0.5], [0.0001, 0.5]])},
        "b": {"kernel": jnp.ones((2, 2))},
    }
    out = nnmf_after_care(params, threshold=0.01)
    w = np.asarray(out["a"]["nnmf_weights"])
    np.testing.assert_allclose(w.sum(0), 1.0, rtol=1e-6)
    assert w.min() >= 0.005  # clamped then renormalized
    np.testing.assert_array_equal(np.asarray(out["b"]["kernel"]), 1.0)


def test_after_care_nnmf_linear_divisor_and_trainable_gate():
    """The reference clamps at threshold / layer._number_of_input_neurons
    (network.py:381-386): for NNMFLinear (module name 'nnmf' inside AE
    DenseBlocks) that is the input width = our weight's axis-0 size; conv
    NNMF layers in the zoo all have number_of_input_neurons=1.  Leaves the
    trainable_fn rejects pass through untouched."""
    w_lin = jnp.full((4, 2), 0.25)  # column-stochastic, 4 input neurons
    w_conv = jnp.asarray([[0.9999, 0.5], [0.0001, 0.5]])
    params = {
        "AE": {"encoder": {"nnmf": {"nnmf_weights": w_lin}}},
        "mix": {"NNMF": {"nnmf_weights": w_conv}},
    }
    out = nnmf_after_care(params, threshold=0.4)
    # linear leaf: clamp at 0.4/4 = 0.1 -> all entries already above, no-op
    np.testing.assert_allclose(
        np.asarray(out["AE"]["encoder"]["nnmf"]["nnmf_weights"]), 0.25, rtol=1e-6
    )
    # conv leaf: clamp at 0.4/1 lifts the small entry to >= ~0.4/(1.4)
    w = np.asarray(out["mix"]["NNMF"]["nnmf_weights"])
    assert w.min() > 0.28
    np.testing.assert_allclose(w.sum(0), 1.0, rtol=1e-6)

    gated = nnmf_after_care(
        params, threshold=0.4, trainable_fn=lambda names: "AE" in names
    )
    np.testing.assert_array_equal(
        np.asarray(gated["mix"]["NNMF"]["nnmf_weights"]), np.asarray(w_conv)
    )


def test_nnmf_weight_trainable_heads_exception():
    """heads-NNMF AE weights are always trainable (layers.py:941); everything
    else follows --train-md-bases (network.py:23)."""
    from vit_cifar_tpu.ops.nnmf.layers import nnmf_weight_trainable

    heads_ae = ["enc0", "mixer", "AE", "nnmf_weights"]
    ae_linear = ["enc0", "mixer", "AE", "encoder", "nnmf", "nnmf_weights"]
    gated = ["enc0", "mixer", "NNMF", "nnmf_weights"]
    assert nnmf_weight_trainable(heads_ae, False)
    assert nnmf_weight_trainable(heads_ae, True)
    assert not nnmf_weight_trainable(ae_linear, False)
    assert nnmf_weight_trainable(ae_linear, True)
    assert not nnmf_weight_trainable(gated, False)
    assert nnmf_weight_trainable(gated, True)


def test_madam_keeps_weights_positive_and_factor_bounded():
    tx = scale_by_madam(learning_rate=lambda _: 10.0)  # huge lr on purpose
    params = {"w": jnp.asarray([0.5, 0.1, 0.9])}
    state = tx.init(params)
    g = {"w": jnp.asarray([1.0, -1.0, 100.0])}
    for _ in range(5):
        updates, state = tx.update(g, state, params)
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, updates)
        w = np.asarray(params["w"])
        assert (w > 0).all()  # multiplicative factor in (0.5, 1.5)


def test_madam_matches_torch_adam_moments():
    """First-step factor: m=g(1-b1)... bias corrections identical to torch."""
    lr, b1, b2, eps = 1e-2, 0.9, 0.999, 1e-8
    tx = scale_by_madam(learning_rate=lambda _: lr, b1=b1, b2=b2, eps=eps)
    p0 = 0.4
    g0 = 0.3
    params = {"w": jnp.asarray([p0])}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray([g0])}, state, params)
    new = p0 + float(updates["w"][0])
    # manual: t=1, m=(1-b1)g, v=(1-b2)g^2, denom=sqrt(v)/sqrt(1-b2)+eps
    m = (1 - b1) * g0
    v = (1 - b2) * g0 * g0
    denom = np.sqrt(v) / np.sqrt(1 - b2) + eps
    factor = 0.5 * np.tanh(-(lr / (1 - b1)) * m / denom) + 1.0
    np.testing.assert_allclose(new, p0 * factor, rtol=1e-6)


@pytest.mark.parametrize("name", ["gnnmf_sbs", "gnnmf_sbsed"])
def test_gnnmf_models_forward_and_train(name):
    cfg = Config(model_name=name, num_layers=1, hidden=48, mlp_hidden=48,
                 ffn_features=96, md_iter=3, precision="32",
                 train_md_bases=True, optimizer="madam",
                 batch_size=8, eval_batch_size=8, warmup_epoch=0,
                 synthetic_data=True)
    model, _ = get_model(cfg)
    x = jnp.asarray(np.random.default_rng(0).uniform(0, 1, (2, 32, 32, 3)),
                    jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
    )
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))

    from tests.test_train_smoke import _setup
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    w0 = np.asarray(
        jax.tree_util.tree_flatten_with_path(state.params)[0][0][1]
    )
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
    # after-care keeps every nnmf weight column-stochastic after the update
    flat = jax.tree_util.tree_flatten_with_path(state.params)[0]
    for path, leaf in flat:
        names = [getattr(k, "key", "") for k in path]
        if names[-1] == "nnmf_weights":
            np.testing.assert_allclose(np.asarray(leaf).sum(0), 1.0, rtol=1e-4)
