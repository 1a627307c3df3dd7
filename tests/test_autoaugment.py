"""On-device AutoAugment vs PIL ground truth (PIL is in the image).

Photometric ops are checked for exact (or near-exact) agreement with the PIL
functions the reference uses; geometry ops are checked structurally (PIL's
resampling internals differ in sub-pixel rounding).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image, ImageEnhance, ImageOps

from vit_cifar_tpu.data import autoaugment as aa


def _rand_img(seed=0, size=32):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, (size, size, 3), dtype=np.uint8)


def _run_op(name, img_u8, magnitude, key=None):
    fn = aa._OP_FNS[aa._OP_ID[name]]
    key = key if key is not None else jax.random.PRNGKey(0)
    out = fn(jnp.asarray(img_u8, jnp.float32), jnp.asarray(magnitude, jnp.float32), key)
    return np.clip(np.asarray(out), 0, 255).astype(np.uint8)


def test_invert_matches_pil():
    img = _rand_img()
    got = _run_op("invert", img, 0)
    expected = np.asarray(ImageOps.invert(Image.fromarray(img)))
    np.testing.assert_array_equal(got, expected)


def test_solarize_matches_pil():
    img = _rand_img(1)
    for thr in [0.0, 77.0, 128.0, 256.0]:
        got = _run_op("solarize", img, thr)
        expected = np.asarray(ImageOps.solarize(Image.fromarray(img), thr))
        np.testing.assert_array_equal(got, expected)


def test_posterize_matches_pil():
    img = _rand_img(2)
    for bits in [4, 5, 6, 7, 8]:
        got = _run_op("posterize", img, float(bits))
        expected = np.asarray(ImageOps.posterize(Image.fromarray(img), bits))
        np.testing.assert_array_equal(got, expected)


def test_equalize_matches_pil():
    img = _rand_img(3)
    got = _run_op("equalize", img, 0)
    expected = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(got, expected)


def test_equalize_matches_pil_on_flat_image():
    img = np.full((32, 32, 3), 7, np.uint8)  # single-bin histogram
    got = _run_op("equalize", img, 0)
    expected = np.asarray(ImageOps.equalize(Image.fromarray(img)))
    np.testing.assert_array_equal(got, expected)


def test_autocontrast_matches_pil():
    img = (_rand_img(4) // 2 + 40).astype(np.uint8)  # compressed range
    got = _run_op("autocontrast", img, 0)
    expected = np.asarray(ImageOps.autocontrast(Image.fromarray(img)))
    # integer LUT rounding can differ by 1 in rare bins
    assert np.abs(got.astype(int) - expected.astype(int)).max() <= 1


@pytest.mark.parametrize("name,enhancer", [
    ("brightness", ImageEnhance.Brightness),
    ("color", ImageEnhance.Color),
    ("contrast", ImageEnhance.Contrast),
    ("sharpness", ImageEnhance.Sharpness),
])
def test_enhance_ops_match_pil(name, enhancer):
    img = _rand_img(5)
    m = 0.5
    # our op picks a random sign; PRNGKey(0) bernoulli -> check both signs
    got = _run_op(name, img, m, key=jax.random.PRNGKey(0))
    candidates = []
    for sign in (+1, -1):
        pil = enhancer(Image.fromarray(img)).enhance(1 + m * sign)
        candidates.append(np.asarray(pil).astype(int))
    diffs = [np.abs(got.astype(int) - c).max() for c in candidates]
    assert min(diffs) <= 2, f"{name}: best max-diff {min(diffs)}"


def test_geometry_ops_shapes_and_fill():
    img = _rand_img(6)
    for name in ["shearX", "shearY", "translateX", "translateY", "rotate"]:
        m = {"rotate": 30.0}.get(name, 0.3 if "shear" in name else 0.4)
        got = _run_op(name, img, m)
        assert got.shape == img.shape
        # out-of-bounds area must be gray 128
        assert (got == 128).any(), name


def test_translate_matches_pil_exactly():
    img = _rand_img(7)
    m = 0.3  # fraction of width
    got = _run_op("translateX", img, m, key=jax.random.PRNGKey(0))
    shift = m * 32
    candidates = []
    for sign in (+1, -1):
        pil = Image.fromarray(img).transform(
            (32, 32), Image.AFFINE, (1, 0, shift * sign, 0, 1, 0),
            fillcolor=(128, 128, 128),
        )
        candidates.append(np.asarray(pil).astype(int))
    diffs = [np.abs(got.astype(int) - c).max() for c in candidates]
    assert min(diffs) == 0


@pytest.mark.parametrize("axis", [1, 0])
def test_shear_matches_pil(axis):
    """ShearX/Y vs PIL AFFINE+BICUBIC across the full magnitude grid, both
    signs (autoaugment.py:198-203).  PIL's transform path uses the a=-1
    cubic; interior pixels agree within +-1 quantization, and at most a few
    fill-boundary pixels may differ where src sits exactly on the -0.5 edge
    (float32-vs-double floor tie)."""
    img = _rand_img(11)
    for m in np.linspace(0, 0.3, 10):
        for sign in (1, -1):
            mm = float(m) * sign
            got = np.clip(
                np.asarray(aa._shear_axis(jnp.asarray(img, jnp.float32),
                                          jnp.float32(mm), axis)),
                0, 255,
            ).astype(np.uint8)
            coeffs = (1, mm, 0, 0, 1, 0) if axis == 1 else (1, 0, 0, mm, 1, 0)
            pil = np.asarray(
                Image.fromarray(img).transform(
                    (32, 32), Image.AFFINE, coeffs, Image.BICUBIC,
                    fillcolor=(128, 128, 128),
                )
            )
            d = np.abs(got.astype(int) - pil.astype(int))
            assert (d > 1).sum() <= 4, f"m={mm}: {(d > 1).sum()} pixels off by >1"
            assert np.median(d) == 0


def test_rotate_matches_pil():
    """rotate_with_fill (autoaugment.py:193-195) across the magnitude grid:
    NEAREST CCW rotation composited over gray 128.  Bit-exact except rare
    floor ties at pixel edges (float32 coordinate math)."""
    img = _rand_img(12)
    for m in np.linspace(0, 30, 10):
        got = _run_op("rotate", img, float(m))
        im = Image.fromarray(img)
        rot = im.convert("RGBA").rotate(float(m))
        exp = np.asarray(
            Image.composite(
                rot, Image.new("RGBA", rot.size, (128,) * 4), rot
            ).convert(im.mode)
        )
        d = got.astype(int) != exp.astype(int)
        # ties affect whole pixels (all 3 channels): allow <=0.5% of pixels
        assert d.any(axis=-1).sum() <= 5, f"m={m}: {d.any(axis=-1).sum()} pixels differ"


@pytest.mark.parametrize("axis", [1, 0])
def test_shear_policy_table_matches_general_path(axis):
    """The policy ops' precomputed-table fast path (_shear_policy, constant
    R/fill tables indexed by magnitude bin + random sign) must reproduce the
    general traced path (_shear_axis) exactly for every published grid
    magnitude and both signs — same arithmetic, only hoisted to trace time."""
    img = jnp.asarray(_rand_img(21), jnp.float32)
    name = "shearX" if axis == 1 else "shearY"
    fn = aa._OP_FNS[aa._OP_ID[name]]
    for i, m in enumerate(aa._RANGES["shearX"]):
        for seed in (0, 1, 2):
            key = jax.random.PRNGKey(seed)
            got = np.asarray(fn(img, jnp.float32(float(m)), key))
            sign = float(np.where(jax.random.bernoulli(key), 1.0, -1.0))
            want = np.asarray(aa._shear_axis(img, jnp.float32(float(m) * sign),
                                             axis))
            np.testing.assert_array_equal(
                got, want, err_msg=f"magnitude bin {i} (m={m}), seed {seed}")


def test_shear_usable_across_distinct_jits():
    """Regression: _shear_tables must NOT cache across traces — an lru_cache
    whose first call happens inside a jit trace (the production order:
    training jits before any eager shear runs) leaks tracers into every
    later trace (observed UnexpectedTracerError on the second distinct jit).
    The build is deliberately per-call/in-trace (see its docstring for the
    measured A/B); two distinct jits and an eager call must all agree."""
    img = jnp.asarray(_rand_img(13), jnp.float32)
    fn = aa._OP_FNS[aa._OP_ID["shearX"]]
    m = jnp.float32(float(aa._RANGES["shearX"][5]))
    key = jax.random.PRNGKey(0)

    @jax.jit
    def first(x):
        return fn(x, m, key)

    @jax.jit
    def second(x):
        return fn(x, m, key) + 0.0

    a = np.asarray(first(img))
    b = np.asarray(second(img))
    c = np.asarray(fn(img, m, key))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, c)


def test_batch_autoaugment_runs_and_changes_images():
    rng = np.random.default_rng(8)
    imgs = rng.integers(0, 256, (16, 32, 32, 3), dtype=np.uint8)
    out = aa.autoaugment_batch(jax.random.PRNGKey(0), jnp.asarray(imgs), "cifar10")
    assert out.shape == imgs.shape and out.dtype == jnp.uint8
    assert not np.array_equal(np.asarray(out), imgs)
    out_svhn = aa.autoaugment_batch(jax.random.PRNGKey(1), jnp.asarray(imgs), "svhn")
    assert out_svhn.shape == imgs.shape


def test_policy_tables_complete():
    assert len(aa.CIFAR10_POLICY) == 24  # one sub-policy is commented out in
    # the reference (autoaugment.py:78), leaving 24 active
    assert len(aa.IMAGENET_POLICY) == 25
    assert len(aa.SVHN_POLICY) == 25


def test_train_step_with_autoaugment():
    from tests.test_train_smoke import _setup, SMALL
    from vit_cifar_tpu.config import Config

    cfg = Config(**{**SMALL, "autoaugment": True})
    model, state, x_all, y_all, step = _setup(cfg)
    perm = jnp.arange(len(x_all), dtype=jnp.int32)
    state, metrics = step(state, x_all, y_all, perm, 0)
    assert np.isfinite(float(metrics["loss"]))
