"""flatten_transform: the raveled-vector optimizer must produce updates
bit-identical to the per-leaf optax chain (elementwise math commutes with
concatenation), for adam and sgd, including weight decay and the schedule."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.train.loop import init_state
from vit_cifar_tpu.train.optim import make_optimizer


SMALL = dict(model_name="vit", num_layers=2, hidden=32, mlp_hidden=32, head=4,
             batch_size=8, precision="32", warmup_epoch=0, synthetic_data=True)


@pytest.mark.parametrize("optimizer", ["adam", "sgd"])
def test_flat_matches_tree_updates(optimizer):
    cfg_tree = Config(optimizer=optimizer, flat_optimizer=False, **SMALL)
    cfg_flat = cfg_tree.replace(flat_optimizer=True)
    model, _ = get_model(cfg_tree)
    tx_tree = make_optimizer(cfg_tree, steps_per_epoch=4)
    tx_flat = make_optimizer(cfg_flat, steps_per_epoch=4)

    sample = jnp.zeros((2, 32, 32, 3), jnp.float32)
    state = init_state(cfg_tree, model, tx_tree, sample)
    params = state.params
    s_tree = tx_tree.init(params)
    s_flat = tx_flat.init(params)

    rng = np.random.default_rng(0)
    grads = jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape), p.dtype), params
    )
    # several steps so adam moments and the schedule count both advance
    for _ in range(3):
        u_tree, s_tree = tx_tree.update(grads, s_tree, params)
        u_flat, s_flat = tx_flat.update(grads, s_flat, params)
        for a, b in zip(jax.tree_util.tree_leaves(u_tree),
                        jax.tree_util.tree_leaves(u_flat)):
            assert a.dtype == b.dtype
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        params = jax.tree_util.tree_map(lambda p, u: p + u, params, u_tree)


def test_flat_end_to_end_training_matches():
    """Whole train() runs with flat vs tree optimizer are numerically equal."""
    from vit_cifar_tpu.train.loop import train

    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        common = dict(max_epochs=2, eval_batch_size=5000, label_smoothing=True,
                      **{**SMALL, "batch_size": 12800})
        cfg_a = Config(flat_optimizer=True, log_dir=os.path.join(td, "l1"),
                       ckpt_dir=os.path.join(td, "m1"), **common)
        cfg_b = Config(flat_optimizer=False, log_dir=os.path.join(td, "l2"),
                       ckpt_dir=os.path.join(td, "m2"), **common)
        res_a = train(cfg_a, verbose=False)
        res_b = train(cfg_b, verbose=False)
        np.testing.assert_allclose(res_a["history"][-1]["loss"],
                                   res_b["history"][-1]["loss"], rtol=1e-6)
        np.testing.assert_allclose(res_a["history"][-1]["val_loss"],
                                   res_b["history"][-1]["val_loss"], rtol=1e-6)
