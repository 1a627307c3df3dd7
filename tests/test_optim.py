import numpy as np
import jax.numpy as jnp
import optax

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.train.optim import make_optimizer, warmup_cosine_epoch_schedule


def test_schedule_shape():
    # per-epoch warmup->cosine (network.py:113-122): linear 0->base over 5
    # epochs, then cosine with T_max=max_epochs
    spe = 10
    sched = warmup_cosine_epoch_schedule(1e-3, 1e-5, 5, 100, spe)
    # epoch 0: lr = 0 (GradualWarmupScheduler multiplier=1.0 semantics)
    assert float(sched(0)) == 0.0
    # mid-warmup epoch 2: 2/5 of base
    np.testing.assert_allclose(float(sched(2 * spe)), 1e-3 * 2 / 5, rtol=1e-6)
    # end of warmup: exactly base lr — held for TWO epochs (the
    # GradualWarmupScheduler returns the un-stepped cosine's lr for one
    # extra epoch; verified by simulating the actual package)
    np.testing.assert_allclose(float(sched(5 * spe)), 1e-3, rtol=1e-6)
    np.testing.assert_allclose(float(sched(6 * spe)), 1e-3, rtol=1e-6)
    # first cosine step at epoch warmup+2 (cos_epoch = 1)
    np.testing.assert_allclose(
        float(sched(7 * spe)),
        1e-5 + (1e-3 - 1e-5) * 0.5 * (1 + np.cos(np.pi * 1 / 100)),
        rtol=1e-6,
    )
    # constant within an epoch (stepped per-epoch, not per-step)
    assert float(sched(5 * spe)) == float(sched(5 * spe + spe - 1))
    # cosine tail: decreasing, never below min_lr, and because T_max=max_epochs
    # while only max_epochs-warmup cosine epochs run, it ends ABOVE min_lr
    lrs = [float(sched(e * spe)) for e in range(5, 100)]
    assert all(a >= b for a, b in zip(lrs, lrs[1:]))
    assert lrs[-1] > 1e-5


def test_adam_is_torch_style_l2():
    # weight decay must enter the gradient BEFORE the adam moments
    cfg = Config(optimizer="adam", lr=1e-3, weight_decay=0.1, warmup_epoch=0, max_epochs=1)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    g = {"w": jnp.zeros((2,))}
    updates, _ = tx.update(g, state, params)
    # with zero grad, the L2 term alone drives the update: adam normalizes
    # it to ~sign(p)*lr at step 1
    assert float(updates["w"][0]) < 0


def test_sgd():
    cfg = Config(optimizer="sgd", lr=0.1, weight_decay=0.0, warmup_epoch=0, max_epochs=1)
    tx = make_optimizer(cfg, steps_per_epoch=1)
    params = {"w": jnp.ones((2,))}
    state = tx.init(params)
    updates, _ = tx.update({"w": jnp.ones((2,))}, state, params)
    new = optax.apply_updates(params, updates)
    # cosine at epoch 0 with warmup 0: lr = min_lr + (lr-min_lr) = lr -> 0.1
    np.testing.assert_allclose(np.asarray(new["w"]), 0.9, rtol=1e-5)
