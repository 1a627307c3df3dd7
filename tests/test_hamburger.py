"""Tests for the matrix-decomposition (hamburger) stack.

Covers: NMF/VQ/CD math on synthetic low-rank data, the one-step-gradient
boundary, EMA persistent bases, burger assemblies V1/V2/V2+, the Hamburger /
HamburgerAttention mixers inside the full ViT, and the GatedNNMF 'ham' model.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.ops.hamburger import MatrixDecomposition2D


def _apply_md(md, x, key=0, deterministic=True, variables=None, mutable=False):
    variables = variables or md.init(
        {"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(key)},
        x, deterministic=True,
    )
    kwargs = dict(rngs={"mask": jax.random.PRNGKey(key)})
    if mutable:
        return md.apply(variables, x, deterministic=deterministic,
                        mutable=["state"], **kwargs)
    return md.apply(variables, x, deterministic=deterministic, **kwargs)


def _low_rank_image(B=2, H=16, W=1, C=24, rank=3, seed=0):
    rng = np.random.default_rng(seed)
    u = rng.uniform(0, 1, (B, C, rank))
    v = rng.uniform(0, 1, (B, rank, H * W))
    x = np.einsum("bcr,brn->bcn", u, v)  # non-negative low-rank
    return jnp.asarray(
        x.reshape(B, C, H, W).transpose(0, 2, 3, 1), jnp.float32
    )


@pytest.mark.parametrize("ham_type", ["NMF", "VQ", "CD"])
def test_md_reconstruction_improves(ham_type):
    """More iterations must reconstruct a low-rank matrix better."""
    x = _low_rank_image(rank=3)

    def err(steps):
        md = MatrixDecomposition2D(
            ham_type=ham_type, D=24, R=4, train_steps=steps, eval_steps=steps,
            inv_t=100.0,
        )
        out = _apply_md(md, x, deterministic=False)
        return float(jnp.mean((out - x) ** 2) / jnp.mean(x**2))

    e1, e8 = err(1), err(8)
    assert np.isfinite(e1) and np.isfinite(e8)
    assert e8 <= e1 + 1e-5
    if ham_type == "NMF":  # VQ/CD are quantizers, not exact factorizations
        assert e8 < 0.05, f"NMF should nearly reconstruct rank-3 data, got {e8}"


def test_md_one_step_gradient_boundary():
    """Gradients flow ONLY through the final compute_coef step (ham.py:85-88):
    the iteration count must not change the grad-path structure, and grads
    w.r.t. the input must be finite and nonzero."""
    x = _low_rank_image(rank=2)
    md = MatrixDecomposition2D(ham_type="NMF", D=24, R=4, train_steps=5, eval_steps=5)
    variables = md.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                        x, deterministic=True)

    def loss(xin):
        out = md.apply(variables, xin, deterministic=False,
                       rngs={"mask": jax.random.PRNGKey(1)})
        return jnp.sum(out**2)

    g = jax.grad(loss)(x)
    assert bool(jnp.all(jnp.isfinite(g)))
    assert float(jnp.abs(g).max()) > 0


def test_md_persistent_bases_ema():
    """rand_init=False keeps bases as mutable state updated by EMA during
    training (ham.py:75-83,102-112)."""
    x = _low_rank_image(rank=2)
    md = MatrixDecomposition2D(ham_type="NMF", D=24, R=4, rand_init=False,
                               train_steps=3, eval_steps=3)
    variables = md.init({"params": jax.random.PRNGKey(0)}, x, deterministic=True)
    assert "state" in variables
    b0 = np.asarray(variables["state"]["bases"])
    # eval: no update
    out, updates = md.apply(variables, x, deterministic=True, mutable=["state"])
    np.testing.assert_array_equal(np.asarray(updates["state"]["bases"]), b0)
    # train: EMA moves the bases, columns stay unit-norm
    out, updates = md.apply(variables, x, deterministic=False, mutable=["state"])
    b1 = np.asarray(updates["state"]["bases"])
    assert not np.allclose(b1, b0)
    np.testing.assert_allclose(np.linalg.norm(b1, axis=1), 1.0, rtol=1e-5)


@pytest.mark.parametrize("mode", ["V1", "V2", "V2+"])
def test_hamburger_model_forward(mode):
    cfg = Config(model_name="hamburger", burger_mode=mode, num_layers=1,
                 hidden=48, mlp_hidden=48, ffn_features=96, precision="32")
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
    )
    assert "batch_stats" in variables  # burger BN
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_hamburger_attention_model_forward():
    cfg = Config(model_name="hamburger_attention", num_layers=1, hidden=48,
                 mlp_hidden=48, precision="32")
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
    )
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)


def test_gated_gnnmf_ham_forward_and_train():
    cfg = Config(model_name="gnnmf_ham", num_layers=1, hidden=48, mlp_hidden=48,
                 ffn_features=96, md_iter=4, precision="32",
                 batch_size=8, eval_batch_size=8, warmup_epoch=0,
                 synthetic_data=True)
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
    )
    out = model.apply(variables, x, deterministic=True,
                      rngs={"mask": jax.random.PRNGKey(3)})
    assert out.shape == (2, 10)

    # one real train step
    from tests.test_train_smoke import _setup
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))


def test_hamburger_trains_one_step_with_bn_state():
    cfg = Config(model_name="hamburger", num_layers=1, hidden=48, mlp_hidden=48,
                 precision="32", batch_size=8, eval_batch_size=8,
                 warmup_epoch=0, synthetic_data=True)
    from tests.test_train_smoke import _setup
    model, state, x_all, y_all, step = _setup(cfg, n=64)
    assert "batch_stats" in state.model_state
    bn0 = jax.tree_util.tree_map(np.asarray, state.model_state)
    perm = jnp.arange(64, dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
    # BN running stats must move during training
    moved = jax.tree_util.tree_map(
        lambda a, b: not np.allclose(a, np.asarray(b)), bn0, state.model_state
    )
    assert any(jax.tree_util.tree_leaves(moved))


def test_burger_gated_mode_raises():
    cfg = Config(model_name="hamburger", burger_mode="Gated", num_layers=1,
                 hidden=48, mlp_hidden=48, precision="32")
    model, _ = get_model(cfg)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    with pytest.raises(NotImplementedError):
        model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
             "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
        )
