import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.data import augment


def test_random_crop_flip_shapes_and_content():
    key = jax.random.PRNGKey(0)
    x = np.arange(2 * 32 * 32 * 3, dtype=np.uint8).reshape(2, 32, 32, 3)
    out = augment.random_crop_flip(key, jnp.asarray(x), padding=4)
    assert out.shape == x.shape and out.dtype == jnp.uint8
    # every output pixel is either 0 (padding) or present in the input
    vals = set(np.unique(np.asarray(out)).tolist())
    assert vals <= set(np.unique(x).tolist()) | {0}


def test_normalize():
    x = jnp.full((1, 2, 2, 3), 255, jnp.uint8)
    mean = (0.5, 0.5, 0.5)
    std = (0.25, 0.25, 0.25)
    out = augment.normalize(x, mean, std)
    np.testing.assert_allclose(np.asarray(out), (1.0 - 0.5) / 0.25, rtol=1e-5)


def test_cutmix_lambda_consistency():
    key = jax.random.PRNGKey(3)
    B, S = 8, 32
    img = jnp.zeros((B, S, S, 3))
    rng = np.random.default_rng(0)
    label = jnp.asarray(rng.integers(0, 10, B))
    out, y, y_rand, lam = augment.cutmix(key, img, label, size=S, beta=1.0)
    assert out.shape == img.shape
    assert y.shape == y_rand.shape == (B,)
    lam = float(lam)
    assert 0.0 <= lam <= 1.0
    # da.py:76: lambda = 1 - box_area/size^2; with all-zero vs all-one images
    one = jnp.ones((B, S, S, 3))
    key2 = jax.random.PRNGKey(3)
    # mix zeros (batch) with itself permuted=ones is impossible; instead verify
    # the replaced-area fraction equals 1-lam using distinct per-image constants
    imgs = jnp.stack([jnp.full((S, S, 3), i, jnp.float32) for i in range(B)])
    out2, _, _, lam2 = augment.cutmix(key2, imgs, label, size=S, beta=1.0)
    frac_replaced = float(jnp.mean((out2 != imgs).any(-1)))
    # replaced pixels can coincide in value if perm maps i->i; fraction must
    # be <= box area, and lam2 must be consistent with the box geometry
    assert frac_replaced <= (1 - float(lam2)) + 1e-6


def test_mixup_convexity():
    key = jax.random.PRNGKey(4)
    B = 16
    img = jnp.ones((B, 8, 8, 3)) * jnp.arange(B, dtype=jnp.float32)[:, None, None, None]
    label = jnp.arange(B)
    mixed, y, y_rand, lam = augment.mixup(key, img, label, alpha=1.0)
    lam = float(lam)
    # each output image is exactly lam*x_i + (1-lam)*x_perm(i)
    expected_means = lam * np.arange(B) + (1 - lam) * np.asarray(
        jnp.mean(mixed, axis=(1, 2, 3)) - lam * jnp.arange(B)
    ) / max(1 - lam, 1e-9)
    got_means = np.asarray(jnp.mean(mixed, axis=(1, 2, 3)))
    # mean of each mixed image must lie within [0, B-1]
    assert got_means.min() >= -1e-4 and got_means.max() <= B - 1 + 1e-4
    assert y.shape == y_rand.shape == (B,)


def test_random_crop_paste_runs():
    key = jax.random.PRNGKey(5)
    x = jnp.ones((4, 32, 32, 3))
    out = augment.random_crop_paste(key, x)
    assert out.shape == x.shape
    assert bool(jnp.all(jnp.isfinite(out)))


def test_augment_dataset_small_dataset():
    """Regression (round-2 advisor): N smaller than the AutoAugment chunk
    (even < chunk - N) must not break the pad/reshape — pad images are cycled
    copies and the output keeps the flat (N, H*W*C) layout."""
    key = jax.random.PRNGKey(0)
    for n in (3, 40):
        x = np.random.default_rng(n).integers(
            0, 256, (n, 32 * 32 * 3), dtype=np.uint8
        )
        out = augment.augment_dataset(
            key, jnp.asarray(x), img_shape=(32, 32, 3), padding=4,
            autoaugment_policy="cifar10", chunk=32,
        )
        assert out.shape == (n, 32 * 32 * 3)
        assert out.dtype == jnp.uint8
