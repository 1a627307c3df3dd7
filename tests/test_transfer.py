"""device_fetch_tree == jax.device_get, structurally and numerically."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.utils.transfer import device_fetch_tree


def test_device_fetch_tree_matches_device_get():
    tree = {
        "a": jnp.arange(12, dtype=jnp.float32).reshape(3, 4),
        "b": {"w": jnp.ones((2, 2, 2), jnp.bfloat16), "n": jnp.int32(7)},
        "c": [jnp.zeros((5,), jnp.float32), jnp.arange(3, dtype=jnp.int32)],
        "host": np.arange(4),  # non-jax leaf passes through
        "scalar": 3.5,
    }
    got = device_fetch_tree(tree)
    want = jax.device_get(tree)
    flat_g, tg = jax.tree_util.tree_flatten(got)
    flat_w, tw = jax.tree_util.tree_flatten(want)
    assert tg == tw
    for g, w in zip(flat_g, flat_w):
        g, w = np.asarray(g), np.asarray(w)
        assert g.dtype == w.dtype and g.shape == w.shape
        np.testing.assert_array_equal(
            g.astype(np.float64, copy=False), w.astype(np.float64, copy=False)
        )
        assert isinstance(g, np.ndarray)


def test_device_fetch_tree_zero_dim_and_empty():
    assert device_fetch_tree({}) == {}
    got = device_fetch_tree({"s": jnp.float32(2.0)})
    assert got["s"].shape == () and float(got["s"]) == 2.0
