"""Weight-transplant parity tests against the ACTUAL reference torch code.

torch-cpu is in this image and /root/reference is importable, so instead of
comparing only against hand-written numpy ports (which can share transcription
errors with the port under test), these tests build the reference torch
modules, copy their weights into the flax modules, and assert forward (and,
for NNMF, backward) agreement.

Import shim: the reference's nnmf/optimizer.py imports the private torch
internal ``_dispatch_sqrt`` that newer torch removed; it is ``math.sqrt``
under a dispatch wrapper, so we restore it before importing reference modules
(this does not alter reference behavior — the same value flows through).
"""

import math
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import torch.optim.optimizer as _torch_opt  # noqa: E402

if not hasattr(_torch_opt, "_dispatch_sqrt"):
    _torch_opt._dispatch_sqrt = math.sqrt
    import torch.optim.adam as _torch_adam

    if not hasattr(_torch_adam, "_dispatch_sqrt"):
        _torch_adam._dispatch_sqrt = math.sqrt

# comet_ml is not in this image; the reference's NNMF module imports it only
# to fetch a global experiment (None when not configured) for metric logging
# inside the backward.  A minimal stub preserves that no-experiment behavior.
if "comet_ml" not in sys.modules:
    import types

    _comet = types.ModuleType("comet_ml")
    _comet.config = types.SimpleNamespace(get_global_experiment=lambda: None)
    sys.modules["comet_ml"] = _comet

sys.path.insert(0, "/root/reference")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402


def _t(x):
    # copy: torch.from_numpy shares memory, and both the reference optimizer
    # (in-place param update) and the NNMF backward (in-place input renorm)
    # would otherwise mutate the numpy arrays the flax side reads
    return torch.from_numpy(np.array(x, np.float32, copy=True))


def _lin(ref_linear):
    """torch nn.Linear -> flax {kernel, bias} (kernel is transposed)."""
    return {
        "kernel": jnp.asarray(ref_linear.weight.detach().numpy().T),
        "bias": jnp.asarray(ref_linear.bias.detach().numpy()),
    }


def _ln(ref_ln):
    return {
        "scale": jnp.asarray(ref_ln.weight.detach().numpy()),
        "bias": jnp.asarray(ref_ln.bias.detach().numpy()),
    }


def _x(shape, seed=0, scale=1.0):
    return (np.random.default_rng(seed).normal(size=shape) * scale).astype(np.float32)


# --------------------------------------------------------------------------- #
# attention / encoder / mixers
# --------------------------------------------------------------------------- #


def test_mhsa_transplant():
    """MultiHeadSelfAttention (reference layers.py:68-103)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention

    torch.manual_seed(0)
    ref = ref_layers.MultiHeadSelfAttention(48, head=4, dropout=0.0).eval()
    ours = MultiHeadSelfAttention(features=48, head=4, dropout=0.0)
    params = {
        "Wq": _lin(ref.Wq), "Wk": _lin(ref.Wk), "Wv": _lin(ref.Wv),
        "out_project": _lin(ref.out_project),
    }
    x = _x((2, 9, 48), 1)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_transformer_encoder_transplant():
    """TransformerEncoder incl. the double-GELU MLP (layers.py:15-65)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention
    from vit_cifar_tpu.ops.common import EncoderBlock

    torch.manual_seed(1)
    ref = ref_layers.TransformerEncoder(32, mlp_hidden=48, head=4, dropout=0.0).eval()
    import functools

    ours = EncoderBlock(
        features=32, mlp_hidden=48,
        mixer=functools.partial(MultiHeadSelfAttention, features=32, head=4),
    )
    params = {
        "la1": _ln(ref.la1), "la2": _ln(ref.la2),
        "mixer": {
            "Wq": _lin(ref.attention.Wq), "Wk": _lin(ref.attention.Wk),
            "Wv": _lin(ref.attention.Wv),
            "out_project": _lin(ref.attention.out_project),
        },
        "mlp": {"fc1": _lin(ref.mlp[0]), "fc2": _lin(ref.mlp[3])},
    }
    x = _x((2, 7, 32), 2)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("factorize", [False, True])
def test_aftfull_transplant(factorize):
    """AFTFull incl. factorized position bias (layers.py:106-165)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.aft import AFT

    torch.manual_seed(2)
    ref = ref_layers.AFTFull(
        16, seq_len=5, factorize=factorize, factorization_dimension=3,
        dropout=0.0, query=True,
    ).eval()
    ours = AFT(features=16, seq_len=5, mode="full", factorize=factorize,
               factorization_dimension=3, query=True)
    params = {
        "Wk": _lin(ref.Wk), "Wv": _lin(ref.Wv), "Wq": _lin(ref.Wq),
        "out_project": _lin(ref.out_project),
    }
    if factorize:
        params["u"] = jnp.asarray(ref.u.detach().numpy())
        params["v"] = jnp.asarray(ref.v.detach().numpy())
    else:
        params["w"] = jnp.asarray(ref.w.detach().numpy())
    x = _x((3, 5, 16), 3)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_aftsimple_transplant():
    """AFTSimple (layers.py:168-203)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.aft import AFT

    torch.manual_seed(3)
    ref = ref_layers.AFTSimple(16, dropout=0.0, query=True).eval()
    ours = AFT(features=16, seq_len=5, mode="simple", query=True)
    params = {
        "Wk": _lin(ref.Wk), "Wv": _lin(ref.Wv), "Wq": _lin(ref.Wq),
        "out_project": _lin(ref.out_project),
    }
    x = _x((3, 5, 16), 4)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gmlp_transplant():
    """GatedMLP (layers.py:491-514)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.gmlp import GatedMLP

    torch.manual_seed(4)
    ref = ref_layers.GatedMLP(seq_len=5, features=8, ffn_features=12).eval()
    ours = GatedMLP(features=8, ffn_features=12, seq_len=5)
    params = {
        "U": _lin(ref.U), "V": _lin(ref.V), "norm": _ln(ref.norm),
        "weight": jnp.asarray(ref.weight.detach().numpy()),
        "bias": jnp.asarray(ref.bias.detach().numpy()),
    }
    x = _x((2, 5, 8), 5)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_wgmlp_transplant():
    """WeightGatedMLP (layers.py:533-553)."""
    import layers as ref_layers

    from vit_cifar_tpu.ops.gmlp import WeightGatedMLP

    torch.manual_seed(5)
    ref = ref_layers.WeightGatedMLP(seq_len=5, features=8, ffn_features=12).eval()
    ours = WeightGatedMLP(features=8, ffn_features=12, seq_len=5)
    params = {
        "U": _lin(ref.U), "V": _lin(ref.V), "norm": _ln(ref.norm),
        "to_weight": _lin(ref.to_weight),
    }
    x = _x((2, 5, 8), 6)
    with torch.no_grad():
        expected = ref(_t(x)).numpy()
    got = np.asarray(
        ours.apply({"params": params}, jnp.asarray(x), deterministic=True)
    )
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------- #
# hamburger NMF core
# --------------------------------------------------------------------------- #


def test_nmf2d_iterates_match():
    """NMF2D local_step + compute_coef (hamburger/ham.py:229-255) on fixed
    tensors — the multiplicative-update math itself, no randomness."""
    import argparse

    from hamburger.ham import NMF2D

    from vit_cifar_tpu.ops.hamburger import _nmf_compute_coef, _nmf_local_step

    ref = NMF2D(argparse.Namespace())
    rng = np.random.default_rng(7)
    x = rng.uniform(0.1, 1.0, (2, 6, 10)).astype(np.float32)  # (B, D, N)
    bases = rng.uniform(0.1, 1.0, (2, 6, 3)).astype(np.float32)
    coef = rng.uniform(0.1, 1.0, (2, 10, 3)).astype(np.float32)

    with torch.no_grad():
        b_ref, c_ref = ref.local_step(_t(x), _t(bases), _t(coef))
        cc_ref = ref.compute_coef(_t(x), _t(bases), _t(coef))
    b_got, c_got = _nmf_local_step(jnp.asarray(x), jnp.asarray(bases), jnp.asarray(coef))
    cc_got = _nmf_compute_coef(jnp.asarray(x), jnp.asarray(bases), jnp.asarray(coef))
    np.testing.assert_allclose(np.asarray(b_got), b_ref.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_got), c_ref.numpy(), rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(cc_got), cc_ref.numpy(), rtol=1e-4, atol=1e-6)


# --------------------------------------------------------------------------- #
# NNMF custom function forward + backward
# --------------------------------------------------------------------------- #


def _run_ref_nnmf(inp, w, iterations, g, local_learning):
    """Drive the actual NNMFFunctionalBP (NNMFLayerSbSBP.py:312-520)."""
    from nnmf.NNMFLayerSbSBP import NNMFFunctionalBP

    B, C, P = inp.shape
    M = w.shape[1]
    t_in = _t(inp.reshape(B, C, P, 1)).requires_grad_(True)
    t_w = _t(w).requires_grad_(True)
    parameter_list = torch.tensor(
        [
            P,  # output_size_0
            1,  # output_size_1
            iterations,
            1,  # w_trainable
            0,  # skip_gradient_calculation
            0,  # keep_last_grad_scale
            1,  # disable_scale_grade
            1 if local_learning else 0,
            0,  # output_layer
        ]
    )
    h = NNMFFunctionalBP.apply(
        t_in,
        torch.tensor(1.0),
        t_w,
        torch.full((M,), 1.0 / M),
        parameter_list,
        torch.tensor(-1.0),
    )
    gi, gw = torch.autograd.grad(h, (t_in, t_w), _t(g.reshape(B, M, P, 1)))
    return (
        h.detach().numpy().reshape(B, M, P),
        gi.numpy().reshape(B, C, P),
        gw.numpy(),
    )


@pytest.mark.parametrize("local_learning", [False, True])
def test_nnmf_functional_bp_transplant(local_learning):
    """Custom-VJP NNMF iterate vs the actual reference autograd Function.

    Our op folds ``update_pre_care``'s division by the contribution count
    B*P into the backward (network.py:326-333 — with one forward per step the
    counter is always B*P), so the reference grad_weights is divided by B*P
    before comparison.  Gradients are kept small so the reference's +-5 clamp
    (applied pre-division there, post-division here) is inactive.
    """
    from vit_cifar_tpu.ops.nnmf.functional import make_nnmf_op

    rng = np.random.default_rng(8)
    B, C, M, P = 3, 6, 5, 4
    inp = rng.uniform(0.1, 1.0, (B, C, P)).astype(np.float32)
    inp = inp / inp.sum(axis=1, keepdims=True)
    w = rng.uniform(0.1, 1.0, (C, M)).astype(np.float32)
    w = w / w.sum(axis=0, keepdims=True)
    g = rng.normal(0, 0.5, (B, M, P)).astype(np.float32)

    h_ref, gi_ref, gw_ref = _run_ref_nnmf(inp, w, 4, g, local_learning)

    op = make_nnmf_op(
        iterations=4, local_learning=local_learning, w_trainable=True,
        clamp_grad=False,
    )
    h, vjp_fn = jax.vjp(op, jnp.asarray(inp), jnp.asarray(w))
    gi, gw = vjp_fn(jnp.asarray(g))

    np.testing.assert_allclose(np.asarray(h), h_ref, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gi), gi_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(gw), gw_ref / (B * P), rtol=1e-4, atol=1e-6)


def test_nnmf_grad_scale_matches_reference():
    """disable_scale_grade=False: the reference divides g by the running max
    (NNMFLayerSbSBP.py:404-410; the carried scale stays -1.0 because
    after_batch is commented out in the harness, network.py:329-332)."""
    from nnmf.NNMFLayerSbSBP import NNMFFunctionalBP

    from vit_cifar_tpu.ops.nnmf.functional import make_nnmf_op

    rng = np.random.default_rng(9)
    B, C, M, P = 2, 5, 4, 3
    inp = rng.uniform(0.1, 1.0, (B, C, P)).astype(np.float32)
    inp = inp / inp.sum(axis=1, keepdims=True)
    w = rng.uniform(0.1, 1.0, (C, M)).astype(np.float32)
    w = w / w.sum(axis=0, keepdims=True)
    g = rng.normal(0, 4.0, (B, M, P)).astype(np.float32)

    t_in = _t(inp.reshape(B, C, P, 1)).requires_grad_(True)
    t_w = _t(w).requires_grad_(True)
    parameter_list = torch.tensor([P, 1, 3, 1, 0, 1, 0, 0, 0])  # keep+scale on
    h = NNMFFunctionalBP.apply(
        t_in, torch.tensor(1.0), t_w, torch.full((M,), 1.0 / M),
        parameter_list, torch.tensor(-1.0),
    )
    gi_ref, _ = torch.autograd.grad(h, (t_in, t_w), _t(g.reshape(B, M, P, 1)))

    op = make_nnmf_op(iterations=3, w_trainable=True, scale_grad=True,
                      clamp_grad=True)
    _, vjp_fn = jax.vjp(op, jnp.asarray(inp), jnp.asarray(w))
    gi, _ = vjp_fn(jnp.asarray(g))
    np.testing.assert_allclose(
        np.asarray(gi), gi_ref.numpy().reshape(B, C, P), rtol=1e-4, atol=1e-5
    )


# --------------------------------------------------------------------------- #
# Madam optimizer
# --------------------------------------------------------------------------- #


def test_madam_step_transplant():
    """One Madam step on an nnmf param group vs scale_by_madam
    (nnmf/optimizer.py:190-244)."""
    from nnmf.optimizer import Madam

    from vit_cifar_tpu.ops.nnmf.optimizer import scale_by_madam

    lr = 1e-2
    p0 = np.asarray([0.4, 0.1, 0.8], np.float32)
    g0 = np.asarray([0.3, -1.2, 0.05], np.float32)

    t_p = torch.nn.Parameter(_t(p0))
    opt = Madam([{"params": [t_p], "nnmf": True}], lr=lr)
    t_p.grad = _t(g0)
    opt.step()
    expected = t_p.detach().numpy()

    tx = scale_by_madam(learning_rate=lambda _: lr)
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g0)}, state, params)
    got = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


def test_madam_non_nnmf_group_is_torch_adam():
    """The non-nnmf group must follow stock torch Adam semantics; our adam
    chain (train/optim.py) adds weight decay to the grad pre-moments like
    torch (classic L2, not AdamW)."""
    import optax

    lr, wd = 1e-2, 5e-2
    p0 = np.asarray([0.4, -0.3], np.float32)
    g0 = np.asarray([0.25, 0.6], np.float32)

    t_p = torch.nn.Parameter(_t(p0))
    opt = torch.optim.Adam([t_p], lr=lr, weight_decay=wd)
    t_p.grad = _t(g0)
    opt.step()
    expected = t_p.detach().numpy()

    tx = optax.chain(
        optax.add_decayed_weights(wd),
        optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8),
        optax.scale_by_learning_rate(lr),
    )
    params = {"w": jnp.asarray(p0)}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.asarray(g0)}, state, params)
    got = np.asarray(params["w"] + updates["w"])
    np.testing.assert_allclose(got, expected, rtol=1e-5, atol=1e-7)


# --------------------------------------------------------------------------- #
# criterion
# --------------------------------------------------------------------------- #


def test_label_smoothing_ce_transplant():
    """LabelSmoothingCrossEntropyLoss (criterions.py:5-19)."""
    from criterions import LabelSmoothingCrossEntropyLoss

    from vit_cifar_tpu.train.losses import label_smoothing_cross_entropy

    rng = np.random.default_rng(10)
    logits = rng.normal(size=(6, 10)).astype(np.float32)
    labels = rng.integers(0, 10, 6)

    ref = LabelSmoothingCrossEntropyLoss(classes=10, smoothing=0.1)
    expected = float(ref(_t(logits), torch.from_numpy(labels)))
    got = float(
        label_smoothing_cross_entropy(
            jnp.asarray(logits), jnp.asarray(labels), 10, 0.1
        )
    )
    np.testing.assert_allclose(got, expected, rtol=1e-5)
