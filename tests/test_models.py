import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.train.loop import count_params


def _init(model, shape=(2, 32, 32, 3)):
    x = jnp.zeros(shape, jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)},
        x,
        deterministic=True,
    )
    return variables, x


def test_vit_forward_shape():
    cfg = Config(model_name="vit", num_layers=2, hidden=96, mlp_hidden=96, head=4,
                 precision="32")
    model, can_unsup = get_model(cfg)
    assert not can_unsup
    variables, x = _init(model)
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_vit_param_count_matches_reference_6_3M():
    # README recipe (README.md:63-80): 7 layers, hidden 384, mlp 384, head 12,
    # patch 8, cls token -> 6.3M params (README.md:37).  Exact analytic count:
    # emb 18,816 + cls 384 + pos 24,960 + 7*888,576 + head 4,618 = 6,268,810
    cfg = Config(model_name="vit", num_layers=7, hidden=384, mlp_hidden=384,
                 head=12, precision="32")
    model, _ = get_model(cfg)
    variables, _ = _init(model)
    assert count_params(variables["params"]) == 6_268_810


def test_vit_deterministic_eval():
    cfg = Config(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48, head=4,
                 precision="32", dropout=0.5)
    model, _ = get_model(cfg)
    variables, x = _init(model)
    a = model.apply(variables, x, deterministic=True)
    b = model.apply(variables, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_vit_dropout_is_stochastic_in_train_mode():
    cfg = Config(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48, head=4,
                 precision="32", dropout=0.5)
    model, _ = get_model(cfg)
    variables, x = _init(model)
    a = model.apply(variables, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(1)})
    b = model.apply(variables, x, deterministic=False,
                    rngs={"dropout": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_no_cls_token_mean_pool():
    cfg = Config(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48, head=4,
                 is_cls_token=False, precision="32")
    model, _ = get_model(cfg)
    variables, x = _init(model)
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)


def test_no_encoder_mlp():
    cfg = Config(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48, head=4,
                 use_encoder_mlp=False, precision="32")
    model, _ = get_model(cfg)
    variables, x = _init(model)
    params = variables["params"]
    assert "mlp" not in params["enc0"]
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)


def test_attention_map_capture():
    # functional replacement for save_attn_map (layers.py:50-65)
    from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention

    m = MultiHeadSelfAttention(features=48, head=4, save_attn_map=True)
    x = jnp.ones((2, 9, 48))
    variables = m.init(jax.random.PRNGKey(0), x)
    out, inter = m.apply(variables, x, mutable=["intermediates"])
    attn = inter["intermediates"]["attn_map"][0]
    assert attn.shape == (2, 4, 9, 9)
    np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, rtol=1e-4)


def test_full_dim_scale_quirk():
    # layers.py:79,97: logits scaled by sqrt(features), NOT sqrt(head_dim).
    from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention

    F, H, T = 16, 4, 5
    m = MultiHeadSelfAttention(features=F, head=H, save_attn_map=True)
    x = np.random.default_rng(0).normal(size=(1, T, F)).astype(np.float32)
    variables = m.init(jax.random.PRNGKey(0), jnp.asarray(x))
    p = variables["params"]

    def np_linear(x, lin):
        return x @ np.asarray(lin["kernel"]) + np.asarray(lin["bias"])

    q = np_linear(x, p["Wq"]).reshape(1, T, H, F // H).transpose(0, 2, 1, 3)
    k = np_linear(x, p["Wk"]).reshape(1, T, H, F // H).transpose(0, 2, 1, 3)
    logits = np.einsum("bhif,bhjf->bhij", q, k) / np.sqrt(F)  # full-dim scale
    expected = np.exp(logits - logits.max(-1, keepdims=True))
    expected = expected / expected.sum(-1, keepdims=True)
    _, inter = m.apply(variables, jnp.asarray(x), mutable=["intermediates"])
    got = np.asarray(inter["intermediates"]["attn_map"][0])
    np.testing.assert_allclose(got, expected, rtol=2e-4, atol=2e-5)


def test_remat_is_numerically_transparent():
    """``--remat`` wraps each encoder block in jax.checkpoint (models/vit.py):
    a scheduling change (recompute activations in the backward), never a math
    change.  The loss is bit-equal (same forward); grads match the non-remat
    model to reassociation noise (XLA fuses the recomputed forward
    differently, measured max |delta| ~3e-8), including under live dropout
    (the rng must thread through the checkpointed block identically — a
    dropout-rng divergence would show up as O(1) grad differences, orders
    above this tolerance)."""
    def build(remat):
        cfg = Config(model_name="vit", num_layers=2, hidden=32, mlp_hidden=64,
                     head=4, precision="32", dropout=0.3, remat=remat)
        model, _ = get_model(cfg)
        return model

    x = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 32, 32, 3)), jnp.float32)
    y = jnp.asarray(np.array([0, 1, 2, 3]), jnp.int32)

    outs = {}
    for remat in (False, True):
        model = build(remat)
        variables = model.init(
            {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
            x, deterministic=True)

        def loss_fn(params, m=model):
            logits = m.apply({"params": params}, x, deterministic=False,
                             rngs={"dropout": jax.random.PRNGKey(7)})
            onehot = jax.nn.one_hot(y, 10)
            return -jnp.mean(jnp.sum(onehot * jax.nn.log_softmax(logits), -1))

        loss, grads = jax.jit(jax.value_and_grad(loss_fn))(variables["params"])
        outs[remat] = (float(loss), grads)

    assert outs[False][0] == outs[True][0]
    for (path, a), b in zip(
        jax.tree_util.tree_leaves_with_path(outs[True][1]),
        jax.tree_util.tree_leaves(outs[False][1]),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
            err_msg=jax.tree_util.keystr(path))
