"""Shape/behavior tests for the cheap mixer zoo: AFT, gMLP, wgMLP, linear,
lgcnn/wlgcnn — plus reference-semantics value checks where the math is small
enough to verify independently."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model


def _run(cfg, batch=2):
    model, _ = get_model(cfg)
    x = jnp.zeros((batch, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        x,
        deterministic=True,
    )
    out = model.apply(variables, x, deterministic=True)
    return variables, out


SMALL = dict(num_layers=1, hidden=48, mlp_hidden=48, head=4, ffn_features=96,
             precision="32")


@pytest.mark.parametrize("name", ["aftfull", "aftsimple", "gmlp", "wgmlp", "linear"])
def test_mixer_forward_shapes(name):
    cfg = Config(model_name=name, **SMALL)
    _, out = _run(cfg)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_aftfull_factorized():
    cfg = Config(model_name="aftfull", factorize=True, factorization_dimension=8, **SMALL)
    variables, out = _run(cfg)
    mixer = variables["params"]["enc0"]["mixer"]
    assert mixer["u"].shape == (65, 8)
    assert mixer["v"].shape == (8, 65)
    assert "w" not in mixer
    assert out.shape == (2, 10)


def test_aftfull_no_query():
    cfg = Config(model_name="aftfull", query=False, **SMALL)
    variables, out = _run(cfg)
    assert "Wq" not in variables["params"]["enc0"]["mixer"]


def test_aftsimple_query_always_on():
    # parity: encoder dispatch never forwards --no-query to AFTSimple
    # (layers.py:233)
    cfg = Config(model_name="aftsimple", query=False, **SMALL)
    variables, _ = _run(cfg)
    assert "Wq" in variables["params"]["enc0"]["mixer"]


def test_aft_no_pos_emb_uses_no_param():
    # vit.py:143-144: no-pos-emb freezes the embedding at zeros
    cfg = Config(model_name="aftfull", pos_emb=False, **SMALL)
    variables, out = _run(cfg)
    assert "pos_emb" not in variables["params"]
    assert out.shape == (2, 10)


def test_aftsimple_values_match_reference_math():
    """Independent numpy recomputation of AFTSimple (layers.py:168-203)."""
    from vit_cifar_tpu.ops.aft import AFT

    F = 16
    m = AFT(features=F, seq_len=5, mode="simple", query=True)
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 5, F)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def lin(x, l):
        return x @ l["kernel"] + l["bias"]

    K, V, Q = lin(x, p["Wk"]), lin(x, p["Wv"]), lin(x, p["Wq"])
    eK = np.exp(K - K.max(axis=1, keepdims=True))
    sm = eK / eK.sum(axis=1, keepdims=True)
    Yt = (sm * V).sum(axis=1, keepdims=True)
    Yt = (1 / (1 + np.exp(-Q))) * Yt
    expected = lin(Yt, p["out_project"])
    got = np.asarray(m.apply(variables, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


def test_gmlp_values_match_reference_math():
    """Independent numpy recomputation of GatedMLP (layers.py:491-514)."""
    from scipy.stats import norm as _norm
    from vit_cifar_tpu.ops.gmlp import GatedMLP

    F, T, FF = 8, 5, 12
    m = GatedMLP(features=F, ffn_features=FF, seq_len=T)
    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, T, F)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = jax.tree_util.tree_map(np.asarray, variables["params"])

    def gelu(v):
        return v * _norm.cdf(v)

    h = gelu(x @ p["U"]["kernel"] + p["U"]["bias"])
    z1, z2 = h[..., : FF // 2], h[..., FF // 2 :]
    mu = z2.mean(-1, keepdims=True)
    var = z2.var(-1, keepdims=True)
    z2n = (z2 - mu) / np.sqrt(var + 1e-5) * p["norm"]["scale"] + p["norm"]["bias"]
    z2m = np.einsum("ij,bjd->bid", p["weight"], z2n) + p["bias"]
    expected = (z1 * z2m) @ p["V"]["kernel"] + p["V"]["bias"]
    got = np.asarray(m.apply(variables, jnp.asarray(x), deterministic=True))
    np.testing.assert_allclose(got, expected, rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("name", ["lgcnn", "wlgcnn"])
def test_lgcnn_forward(name):
    cfg = Config(model_name=name, num_layers=1, hidden=48, mlp_hidden=48,
                 ffn_features=96, kernel_size=1, precision="32")
    _, out = _run(cfg)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_lgcnn_kernel3():
    cfg = Config(model_name="lgcnn", num_layers=2, hidden=32, mlp_hidden=32,
                 ffn_features=64, kernel_size=3, precision="32")
    _, out = _run(cfg)
    assert out.shape == (2, 10)


def test_lgcnn_batch_norm_state():
    cfg = Config(model_name="lgcnn", num_layers=1, hidden=32, mlp_hidden=32,
                 ffn_features=64, cnn_normalization="batch_norm", precision="32")
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        x, deterministic=True,
    )
    assert "batch_stats" in variables
    out, updates = model.apply(
        variables, x, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(3)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 10)
    assert "batch_stats" in updates


def test_lgcnn_trains_one_step():
    from tests.test_train_smoke import _setup
    import jax.numpy as jnp

    cfg = Config(model_name="lgcnn", num_layers=1, hidden=32, mlp_hidden=32,
                 ffn_features=64, batch_size=8, eval_batch_size=8,
                 precision="32", warmup_epoch=0, synthetic_data=True)
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
