"""TorchBatchNorm vs the actual torch BatchNorm, step for step.

Covers the parity gap flax nn.BatchNorm leaves open: torch _BatchNorm stores
the UNBIASED batch variance in running_var (normalizing with the biased one),
so eval-time outputs differ from flax's biased-running-var by n/(n-1) inside
the rsqrt.  Reference BN sites: layers.py:611,681,751-752,1307,1342 and the
hamburger sync_bn (sync_bn.py:128-132).
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vit_cifar_tpu.ops.norm import TorchBatchNorm  # noqa: E402


def _apply_train(mod, variables, x):
    y, updates = mod.apply(
        variables, x, use_running_average=False, mutable=["batch_stats"]
    )
    return y, {**variables, "batch_stats": updates["batch_stats"]}


def test_batchnorm2d_trajectory_and_eval_parity():
    """Multi-step training stats + eval output vs torch nn.BatchNorm2d."""
    rng = np.random.default_rng(0)
    C = 5
    ref = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)
    with torch.no_grad():
        ref.weight.copy_(torch.from_numpy(rng.normal(1, 0.2, C).astype(np.float32)))
        ref.bias.copy_(torch.from_numpy(rng.normal(0, 0.2, C).astype(np.float32)))

    mod = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    x0 = rng.normal(0, 1, (4, 6, 6, C)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x0), use_running_average=False)
    variables = {
        "params": {
            "scale": jnp.asarray(ref.weight.detach().numpy()),
            "bias": jnp.asarray(ref.bias.detach().numpy()),
        },
        "batch_stats": variables["batch_stats"],
    }

    ref.train()
    for step in range(4):
        x = rng.normal(step, 1 + 0.3 * step, (4, 6, 6, C)).astype(np.float32)
        y_ours, variables = _apply_train(mod, variables, jnp.asarray(x))
        y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
        np.testing.assert_allclose(
            np.asarray(y_ours).transpose(0, 3, 1, 2),
            y_ref.detach().numpy(), rtol=1e-5, atol=1e-5,
        )

    # running stats must match torch's UNBIASED accumulation exactly
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["mean"]),
        ref.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )
    # eval: normalized with the running stats
    ref.eval()
    x = rng.normal(0.5, 2.0, (3, 6, 6, C)).astype(np.float32)
    y_ours = mod.apply(variables, jnp.asarray(x), use_running_average=True)
    y_ref = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y_ours).transpose(0, 3, 1, 2),
        y_ref.detach().numpy(), rtol=1e-5, atol=1e-5,
    )


def test_batchnorm1d_2d_input_parity():
    """(B, C) input — the ANN builder's BN (layers.py:1307)."""
    rng = np.random.default_rng(1)
    C = 7
    ref = torch.nn.BatchNorm1d(C, eps=1e-5, momentum=0.1)
    mod = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    x0 = rng.normal(0, 1, (8, C)).astype(np.float32)
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x0), use_running_average=False)

    ref.train()
    for step in range(3):
        x = rng.normal(step, 1.5, (8, C)).astype(np.float32)
        y_ours, variables = _apply_train(mod, variables, jnp.asarray(x))
        y_ref = ref(torch.from_numpy(x))
        np.testing.assert_allclose(
            np.asarray(y_ours), y_ref.detach().numpy(), rtol=1e-5, atol=1e-5
        )
    np.testing.assert_allclose(
        np.asarray(variables["batch_stats"]["var"]),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )


def test_single_value_per_channel_raises_like_torch():
    """torch raises 'Expected more than 1 value per channel when training';
    the reference's sync_bn likewise asserts size > 1.  A silent zero-variance
    running update would let a misconfigured batch train quietly (round-3
    advisor finding)."""
    mod = TorchBatchNorm(momentum=0.9, epsilon=1e-5)
    x0 = np.zeros((4, 3), np.float32)
    variables = mod.init(
        jax.random.PRNGKey(0), jnp.asarray(x0), use_running_average=False
    )
    with pytest.raises(ValueError, match="more than 1 value per channel"):
        _apply_train(mod, variables, jnp.zeros((1, 3), jnp.float32))
    # torch parity on the torch side of the fence too
    ref = torch.nn.BatchNorm1d(3)
    ref.train()
    with pytest.raises(ValueError):
        ref(torch.zeros((1, 3)))


def test_shared_module_double_call_updates_stats_twice_in_order():
    """The reference applies ONE BatchNorm to x then cls_token in a single
    forward (layers.py:617-623): running stats update twice, sequentially.
    Mirror that with two torch calls and assert our single-apply double-call
    lands on the same stats."""
    rng = np.random.default_rng(2)
    C = 4
    ref = torch.nn.BatchNorm2d(C, eps=1e-5, momentum=0.1)

    import flax.linen as nn

    class Shared(nn.Module):
        @nn.compact
        def __call__(self, x, cls):
            norm = TorchBatchNorm(momentum=0.9, epsilon=1e-5, name="bn")
            return norm(x, use_running_average=False), norm(
                cls, use_running_average=False
            )

    x = rng.normal(0, 1, (4, 6, 6, C)).astype(np.float32)
    cls = rng.normal(1, 2, (4, 2, 2, C)).astype(np.float32)
    mod = Shared()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(cls))
    (y1, y2), updates = mod.apply(
        variables, jnp.asarray(x), jnp.asarray(cls), mutable=["batch_stats"]
    )

    ref.train()
    r1 = ref(torch.from_numpy(x.transpose(0, 3, 1, 2)))
    r2 = ref(torch.from_numpy(cls.transpose(0, 3, 1, 2)))
    np.testing.assert_allclose(
        np.asarray(y1).transpose(0, 3, 1, 2), r1.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(y2).transpose(0, 3, 1, 2), r2.detach().numpy(),
        rtol=1e-5, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["mean"]),
        ref.running_mean.numpy(), rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(updates["batch_stats"]["bn"]["var"]),
        ref.running_var.numpy(), rtol=1e-5, atol=1e-6,
    )
