"""On-device AutoAugment (all 14 PIL ops jittable, exact policies).

Reference: autoaugment.py (the DeepVoltaire AutoAugment port) — 25 ImageNet /
25 CIFAR10 (one commented out, leaving 24 active, autoaugment.py:79) / 25 SVHN
sub-policies; each sub-policy is two (probability, op, magnitude) stages
(autoaugment.py:173-236).  The policy tuples and magnitude grids below are the
published AutoAugment constants (autoaugment.py:22-161, 175-190).

The reference applies PIL ops per image in DataLoader workers; here every op
is a pure jittable function on a float32 (H, W, C) image in [0, 255] and the
whole two-stage sub-policy application is traced into the train step (or the
per-epoch dataset pass).  Per-image op selection vmaps a ``lax.switch`` — on
TPU all 14 branches are computed and selected, which is cheap at 32x32 and
keeps the graph free of data-dependent control flow.

PIL-exactness notes (verified against PIL in tests/test_autoaugment.py):
  * invert/solarize/posterize/equalize are bit-exact; equalize reproduces
    PIL's lut ``(step//2 + cumsum) // step`` integer arithmetic including the
    <=1-nonzero-bin and step==0 identity cases.
  * autocontrast truncates like PIL's ``int(ix*scale + offset)`` (+-1 in rare
    bins from float error).
  * enhance ops (brightness/color/contrast/sharpness) use PIL's L-mode
    luma coefficients and blend arithmetic; sharpness replicates the SMOOTH
    kernel's untouched 1-pixel border.
  * translate matches PIL AFFINE+NEAREST exactly: the output->input map is
    sampled at pixel centers, so an (x + 0.5 + shift) floor.
  * shear uses PIL ``Image.transform``'s BICUBIC kernel — the classic a=-1
    cubic, NOT resize's a=-0.5 Catmull-Rom (verified by extracting tap
    weights from a float-mode delta probe) — along the sheared axis; the
    orthogonal axis lands on integer coordinates where the kernel is a
    delta, so 1D filtering is exact.  Measured vs PIL across the magnitude
    grid (tests/test_autoaugment.py): interior pixels agree within +-1
    quantization; a handful of fill-boundary pixels (src exactly at the
    -0.5 edge) can differ from float32-vs-double ties.
  * rotate is NEAREST counterclockwise about the center with the gray-128
    composite fill (rotate_with_fill, autoaugment.py:193-195) — bit-exact
    vs PIL except rare floor ties at pixel edges (same float32 cause).
  * the magnitude sign is randomized for shear/translate/color/contrast/
    sharpness/brightness, exactly the ops the reference randomizes
    (autoaugment.py:198-219).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

# --------------------------------------------------------------------------- #
# op implementations: fn(img_f32 (H,W,C) in [0,255], magnitude, key) -> f32
# --------------------------------------------------------------------------- #

_FILL = 128.0


def _rand_sign(key):
    return jnp.where(jax.random.bernoulli(key), 1.0, -1.0)


def _invert(img, mag, key):
    return 255.0 - img


def _solarize(img, mag, key):
    # PIL lut: i if i < threshold else 255 - i
    return jnp.where(img < mag, img, 255.0 - img)


def _posterize(img, mag, key):
    s = jnp.exp2(8.0 - jnp.round(mag))
    return jnp.floor(img / s) * s


def _equalize(img, mag, key):
    """PIL ImageOps.equalize per channel (integer lut arithmetic).

    Both the histogram and the lut application run through a hi/lo-nibble
    bit-split (idx = hi*16 + lo): two (P, 16) one-hots instead of one
    (P, 256), so the elementwise comparison work drops 8x and the rest
    rides the MXU as tiny matmuls —
      histogram  h[hi, lo] = oh_hi^T @ oh_lo          (exact counts <= P)
      lut apply  out_p     = (oh_hi @ lut2d) . oh_lo  (exact row/col select)
    All values are small integers, exact in f32.  This replaced the flat
    (P, 256) one-hot after the round-5 xprof trace measured equalize's 6
    fusions (3 channels x 2 policy-op slots, the vmapped lax.switch
    evaluates every branch) at 91 us each — the largest remaining kernel
    class after the shear fix; batched gathers under vmap were A/B'd far
    worse still (4.5 ms per 128-image batch).  Measured 0.92 -> 0.52 ms
    per 128-image AA batch (tools/ab_aa_equalize.py)."""

    def chan(ch):
        idx = ch.astype(jnp.int32)
        cols = jnp.arange(16)
        oh_hi = ((idx.reshape(-1, 1) >> 4) == cols[None, :]).astype(jnp.float32)
        oh_lo = ((idx.reshape(-1, 1) & 15) == cols[None, :]).astype(jnp.float32)
        h = (oh_hi.T @ oh_lo).reshape(256).astype(jnp.int32)  # (256,) histogram
        nz = h > 0
        n_nz = nz.sum()
        last_idx = 255 - jnp.argmax(nz[::-1])
        total = h.sum()
        step = (total - h[last_idx]) // 255
        cum_excl = jnp.cumsum(h) - h  # n before adding h[i]
        lut = jnp.clip((step // 2 + cum_excl) // jnp.maximum(step, 1), 0, 255)
        use_id = (n_nz <= 1) | (step == 0)
        lut = jnp.where(use_id, jnp.arange(256), lut)
        lut2d = lut.astype(jnp.float32).reshape(16, 16)
        out = ((oh_hi @ lut2d) * oh_lo).sum(-1)
        return out.reshape(ch.shape)

    return jnp.stack([chan(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def _autocontrast(img, mag, key):
    """PIL ImageOps.autocontrast (cutoff=0) per channel."""

    def chan(ch):
        lo = ch.min()
        hi = ch.max()
        scale = 255.0 / jnp.maximum(hi - lo, 1e-12)
        out = jnp.clip(jnp.floor((ch - lo) * scale), 0, 255)  # int() truncation
        return jnp.where(hi > lo, out, ch)

    return jnp.stack([chan(img[..., c]) for c in range(img.shape[-1])], axis=-1)


def _luma(img):
    """PIL 'L' conversion: round(0.299 R + 0.587 G + 0.114 B)."""
    l = img[..., 0] * 0.299 + img[..., 1] * 0.587 + img[..., 2] * 0.114
    return jnp.round(l)


def _blend(degenerate, img, factor):
    """Image.blend: out = im1 + factor*(im2 - im1), rounded and clipped."""
    return jnp.clip(jnp.round(degenerate + factor * (img - degenerate)), 0, 255)


def _brightness(img, mag, key):
    factor = 1.0 + mag * _rand_sign(key)
    return _blend(jnp.zeros_like(img), img, factor)


def _color(img, mag, key):
    factor = 1.0 + mag * _rand_sign(key)
    gray = _luma(img)[..., None] * jnp.ones_like(img)
    return _blend(gray, img, factor)


def _contrast(img, mag, key):
    factor = 1.0 + mag * _rand_sign(key)
    mean = jnp.floor(_luma(img).mean() + 0.5)  # ImageStat mean, int(x+0.5)
    return _blend(jnp.full_like(img, mean), img, factor)


def _sharpness(img, mag, key):
    factor = 1.0 + mag * _rand_sign(key)
    # ImageFilter.SMOOTH: 3x3 [[1,1,1],[1,5,1],[1,1,1]]/13; PIL leaves the
    # 1-pixel border untouched
    k = jnp.asarray([[1.0, 1.0, 1.0], [1.0, 5.0, 1.0], [1.0, 1.0, 1.0]]) / 13.0
    smoothed = jax.lax.conv_general_dilated(
        img.transpose(2, 0, 1)[:, None],  # (C,1,H,W)
        k[None, None],  # (1,1,3,3)
        window_strides=(1, 1),
        padding="VALID",
    )[:, 0].transpose(1, 2, 0)  # (H-2, W-2, C)
    smoothed = jnp.round(smoothed)
    degenerate = img.at[1:-1, 1:-1, :].set(smoothed)
    return _blend(degenerate, img, factor)


def _cubic_weights(t):
    """PIL ``Image.transform`` BICUBIC kernel; t = frac in [0,1); taps -1..2.

    NOTE: PIL's *transform* path (Geometry.c) uses the classic a = -1 cubic,
    NOT the a = -0.5 Catmull-Rom used by ``resize`` — verified empirically by
    extracting the tap weights from a float-mode delta-image probe."""
    a = -1.0

    def k(x):
        x = jnp.abs(x)
        return jnp.where(
            x <= 1.0,
            (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
            jnp.where(x < 2.0, a * (x**3 - 5.0 * x**2 + 8.0 * x - 4.0), 0.0),
        )

    return [k(t + 1.0), k(t), k(t - 1.0), k(t - 2.0)]


def _shear_rfill(m, n_line, n_samp):
    """Per-line cubic resampling matrix R[l, s, s'] (<=4 taps per row) and
    the out-of-bounds fill mask for a shear of per-line offset m*(line+0.5).

    Applying R as one batched matmul replaced per-row take_along_axis
    gathers under vmap, the op's original hot spot on TPU (4.5 -> 0.5 ms per
    128-image batch); the one-hot construction itself is pure elementwise
    work, which is why the policy path precomputes it (see _shear_tables)."""
    line = jnp.arange(n_line, dtype=jnp.float32)
    samp = jnp.arange(n_samp, dtype=jnp.float32)
    # filtered transforms sample at (out+0.5) and shift back 0.5
    src = samp[None, :] + (m * (line + 0.5))[:, None]  # (lines, samples)
    base = jnp.floor(src)
    frac = src - base
    ws = _cubic_weights(frac)
    cols = jnp.arange(n_samp)
    R = jnp.zeros((n_line, n_samp, n_samp), jnp.float32)
    for k_off, w in zip((-1, 0, 1, 2), ws):
        idx = jnp.clip(base + k_off, 0, n_samp - 1).astype(jnp.int32)
        R = R + w[:, :, None] * (idx[:, :, None] == cols[None, None, :])
    fill = (src < -0.5) | (src >= n_samp - 0.5)
    return R, fill


def _apply_shear_r(img, R, fill):
    out = jnp.einsum("lso,loc->lsc", R, img)
    # PIL clips with (int)(v + 0.5) — floor(+0.5), not round-half-even
    return jnp.where(fill[:, :, None], _FILL,
                     jnp.clip(jnp.floor(out + 0.5), 0, 255))


def _shear_axis(img, m, axis):
    """BICUBIC shear: for axis=1 (shearX), src_x = x + m*(y+0.5); per-line
    constant offset, so a 1D 4-tap cubic along the sheared axis is exact.

    General-magnitude path (constructs R for the traced m); the policy ops
    below use the precomputed-table fast path instead."""
    if axis != 1:
        img = img.transpose(1, 0, 2)
    R, fill = _shear_rfill(m, img.shape[0], img.shape[1])
    out = _apply_shear_r(img, R, fill)
    if axis != 1:
        out = out.transpose(1, 0, 2)
    return out


def _shear_tables(n_line, n_samp):
    """(20, L, S, S) resampling-matrix / (20, L, S) fill tables: the
    published shear magnitude grid x both random signs, ordered
    [+m0, -m0, +m1, -m1, ...].

    AutoAugment shear magnitudes come from the FIXED 10-bin grid
    (_RANGES['shearX'], the published constants) with only a random sign, so
    every R an image can ever need is known before any image is seen.  The
    round-5 xprof trace measured the per-image in-fusion one-hot R
    construction as the largest AutoAugment kernel class (~0.87 ms of a
    7.7 ms step; docs/PERFORMANCE.md 'Kernel-level accounting'), and a
    transposed-layout A/B proved the cost was the construction, not the
    matmul.

    Deliberately rebuilt at every call, NOT cached: the build has no batch
    dependence, so under the production vmap-over-images it is lifted out of
    the per-image loop and runs once per step — measured 1.35 vs 2.10 ms per
    128-image AA batch (tools/ab_aa_shear.py).  The two tempting caches both
    lose: an lru_cache leaks tracers when the first call happens inside a
    jit trace (omnistaging), and concrete closed-over device constants
    measured SLOWER (2.39 ms) than the construct path — the embedded 2.6 MB
    constant pays a per-step relayout that the in-trace build avoids."""
    grid = _RANGES["shearX"]  # shearX and shearY share the same grid
    rs, fills = [], []
    for m in grid:
        for sign in (1.0, -1.0):
            R, fill = _shear_rfill(jnp.float32(float(m) * sign),
                                   n_line, n_samp)
            rs.append(R)
            fills.append(fill)
    return jnp.stack(rs), jnp.stack(fills)


def _shear_policy(img, mag, key, axis):
    if axis != 1:
        img = img.transpose(1, 0, 2)
    rt, ft = _shear_tables(img.shape[0], img.shape[1])
    grid_max = float(_RANGES["shearX"][-1])
    # mag is one of the 10 published grid values -> recover its bin index
    mi = jnp.round(mag * (9.0 / grid_max)).astype(jnp.int32)
    # same draw as _rand_sign: bernoulli(key) True -> +magnitude (even rows)
    var = mi * 2 + jnp.where(jax.random.bernoulli(key), 0, 1)
    out = _apply_shear_r(img, jnp.take(rt, var, axis=0),
                         jnp.take(ft, var, axis=0))
    if axis != 1:
        out = out.transpose(1, 0, 2)
    return out


def _shear_x(img, mag, key):
    return _shear_policy(img, mag, key, axis=1)


def _shear_y(img, mag, key):
    return _shear_policy(img, mag, key, axis=0)


def _translate_axis(img, shift, axis):
    """PIL AFFINE + NEAREST: src = floor(out + 0.5 + shift) -> integer shift
    floor(shift + 0.5); fill 128 outside (exact, tests/test_autoaugment.py)."""
    H, W, C = img.shape
    n = img.shape[axis]
    s = jnp.floor(shift + 0.5).astype(jnp.int32)
    pos = jnp.arange(n)
    src = pos + s
    valid = (src >= 0) & (src < n)
    src_c = jnp.clip(src, 0, n - 1)
    if axis == 1:
        out = img[:, src_c, :]
        return jnp.where(valid[None, :, None], out, _FILL)
    out = img[src_c, :, :]
    return jnp.where(valid[:, None, None], out, _FILL)


def _translate_x(img, mag, key):
    return _translate_axis(img, mag * img.shape[1] * _rand_sign(key), axis=1)


def _translate_y(img, mag, key):
    return _translate_axis(img, mag * img.shape[0] * _rand_sign(key), axis=0)


def _rotate(img, mag, key):
    """rotate_with_fill (autoaugment.py:193-195): NEAREST rotation about the
    center, composited over gray 128 (no random sign in the reference)."""
    H, W, C = img.shape
    theta = jnp.deg2rad(mag)
    cos, sin = jnp.cos(theta), jnp.sin(theta)
    cx, cy = W / 2.0, H / 2.0
    xx = jnp.arange(W, dtype=jnp.float32)[None, :] + 0.5 - cx
    yy = jnp.arange(H, dtype=jnp.float32)[:, None] + 0.5 - cy
    # PIL rotates counterclockwise: the inverse map it builds is
    # src = R(-theta) @ (out - c) + c, i.e. src_x = cos*xx - sin*yy
    # (Image.rotate builds the matrix from angle = -radians(magnitude))
    src_x = cos * xx - sin * yy + cx
    src_y = sin * xx + cos * yy + cy
    ix = jnp.floor(src_x).astype(jnp.int32)
    iy = jnp.floor(src_y).astype(jnp.int32)
    valid = (ix >= 0) & (ix < W) & (iy >= 0) & (iy < H)
    out = img[jnp.clip(iy, 0, H - 1), jnp.clip(ix, 0, W - 1)]
    return jnp.where(valid[:, :, None], out, _FILL)


_OP_NAMES = [
    "shearX", "shearY", "translateX", "translateY", "rotate", "color",
    "posterize", "solarize", "contrast", "sharpness", "brightness",
    "autocontrast", "equalize", "invert",
]
_OP_FNS = [
    _shear_x, _shear_y, _translate_x, _translate_y, _rotate, _color,
    _posterize, _solarize, _contrast, _sharpness, _brightness,
    _autocontrast, _equalize, _invert,
]
_OP_ID = {name: i for i, name in enumerate(_OP_NAMES)}

# --------------------------------------------------------------------------- #
# policies (published constants, reference autoaugment.py:22-190)
# --------------------------------------------------------------------------- #

_RANGES = {
    "shearX": np.linspace(0, 0.3, 10),
    "shearY": np.linspace(0, 0.3, 10),
    "translateX": np.linspace(0, 150 / 331, 10),
    "translateY": np.linspace(0, 150 / 331, 10),
    "rotate": np.linspace(0, 30, 10),
    "color": np.linspace(0.0, 0.9, 10),
    "posterize": np.round(np.linspace(8, 4, 10), 0).astype(int),
    "solarize": np.linspace(256, 0, 10),
    "contrast": np.linspace(0.0, 0.9, 10),
    "sharpness": np.linspace(0.0, 0.9, 10),
    "brightness": np.linspace(0.0, 0.9, 10),
    "autocontrast": [0] * 10,
    "equalize": [0] * 10,
    "invert": [0] * 10,
}


def _sub(p1, op1, i1, p2, op2, i2):
    return (
        (p1, op1, float(_RANGES[op1][i1])),
        (p2, op2, float(_RANGES[op2][i2])),
    )


IMAGENET_POLICY = [
    _sub(0.4, "posterize", 8, 0.6, "rotate", 9),
    _sub(0.6, "solarize", 5, 0.6, "autocontrast", 5),
    _sub(0.8, "equalize", 8, 0.6, "equalize", 3),
    _sub(0.6, "posterize", 7, 0.6, "posterize", 6),
    _sub(0.4, "equalize", 7, 0.2, "solarize", 4),
    _sub(0.4, "equalize", 4, 0.8, "rotate", 8),
    _sub(0.6, "solarize", 3, 0.6, "equalize", 7),
    _sub(0.8, "posterize", 5, 1.0, "equalize", 2),
    _sub(0.2, "rotate", 3, 0.6, "solarize", 8),
    _sub(0.6, "equalize", 8, 0.4, "posterize", 6),
    _sub(0.8, "rotate", 8, 0.4, "color", 0),
    _sub(0.4, "rotate", 9, 0.6, "equalize", 2),
    _sub(0.0, "equalize", 7, 0.8, "equalize", 8),
    _sub(0.6, "invert", 4, 1.0, "equalize", 8),
    _sub(0.6, "color", 4, 1.0, "contrast", 8),
    _sub(0.8, "rotate", 8, 1.0, "color", 2),
    _sub(0.8, "color", 8, 0.8, "solarize", 7),
    _sub(0.4, "sharpness", 7, 0.6, "invert", 8),
    _sub(0.6, "shearX", 5, 1.0, "equalize", 9),
    _sub(0.4, "color", 0, 0.6, "equalize", 3),
    _sub(0.4, "equalize", 7, 0.2, "solarize", 4),
    _sub(0.6, "solarize", 5, 0.6, "autocontrast", 5),
    _sub(0.6, "invert", 4, 1.0, "equalize", 8),
    _sub(0.6, "color", 4, 1.0, "contrast", 8),
    _sub(0.8, "equalize", 8, 0.6, "equalize", 3),
]

# one sub-policy is commented out in the reference (autoaugment.py:79),
# leaving 24 active
CIFAR10_POLICY = [
    _sub(0.1, "invert", 7, 0.2, "contrast", 6),
    _sub(0.8, "sharpness", 1, 0.9, "sharpness", 3),
    _sub(0.5, "shearY", 8, 0.7, "translateY", 9),
    _sub(0.5, "autocontrast", 8, 0.9, "equalize", 2),
    _sub(0.2, "shearY", 7, 0.3, "posterize", 7),
    _sub(0.4, "color", 3, 0.6, "brightness", 7),
    _sub(0.3, "sharpness", 9, 0.7, "brightness", 9),
    _sub(0.6, "equalize", 5, 0.5, "equalize", 1),
    _sub(0.6, "contrast", 7, 0.6, "sharpness", 5),
    _sub(0.7, "color", 7, 0.5, "translateX", 8),
    _sub(0.3, "equalize", 7, 0.4, "autocontrast", 8),
    _sub(0.4, "translateY", 3, 0.2, "sharpness", 6),
    _sub(0.9, "brightness", 6, 0.2, "color", 8),
    _sub(0.5, "solarize", 2, 0.0, "invert", 3),
    _sub(0.2, "equalize", 0, 0.6, "autocontrast", 0),
    _sub(0.2, "equalize", 8, 0.6, "equalize", 4),
    _sub(0.9, "color", 9, 0.6, "equalize", 6),
    _sub(0.8, "autocontrast", 4, 0.2, "solarize", 8),
    _sub(0.1, "brightness", 3, 0.7, "color", 0),
    _sub(0.4, "solarize", 5, 0.9, "autocontrast", 3),
    _sub(0.9, "translateY", 9, 0.7, "translateY", 9),
    _sub(0.9, "autocontrast", 2, 0.8, "solarize", 3),
    _sub(0.8, "equalize", 8, 0.1, "invert", 3),
    _sub(0.7, "translateY", 9, 0.9, "autocontrast", 1),
]

SVHN_POLICY = [
    _sub(0.9, "shearX", 4, 0.2, "invert", 3),
    _sub(0.9, "shearY", 8, 0.7, "invert", 5),
    _sub(0.6, "equalize", 5, 0.6, "solarize", 6),
    _sub(0.9, "invert", 3, 0.6, "equalize", 3),
    _sub(0.6, "equalize", 1, 0.9, "rotate", 3),
    _sub(0.9, "shearX", 4, 0.8, "autocontrast", 3),
    _sub(0.9, "shearY", 8, 0.4, "invert", 5),
    _sub(0.9, "shearY", 5, 0.2, "solarize", 6),
    _sub(0.9, "invert", 6, 0.8, "autocontrast", 1),
    _sub(0.6, "equalize", 3, 0.9, "rotate", 3),
    _sub(0.9, "shearX", 4, 0.3, "solarize", 3),
    _sub(0.8, "shearY", 8, 0.7, "invert", 4),
    _sub(0.9, "equalize", 5, 0.6, "translateY", 6),
    _sub(0.9, "invert", 4, 0.6, "equalize", 7),
    _sub(0.3, "contrast", 3, 0.8, "rotate", 4),
    _sub(0.8, "invert", 5, 0.0, "translateY", 2),
    _sub(0.7, "shearY", 6, 0.4, "solarize", 8),
    _sub(0.6, "invert", 4, 0.8, "rotate", 4),
    _sub(0.3, "shearY", 7, 0.9, "translateX", 3),
    _sub(0.1, "shearX", 6, 0.6, "invert", 5),
    _sub(0.7, "solarize", 2, 0.6, "translateY", 7),
    _sub(0.8, "shearY", 4, 0.8, "invert", 8),
    _sub(0.7, "shearX", 9, 0.8, "translateY", 3),
    _sub(0.8, "shearY", 5, 0.7, "autocontrast", 3),
    _sub(0.7, "shearX", 2, 0.1, "invert", 5),
]

_POLICIES = {
    "imagenet": IMAGENET_POLICY,
    "cifar10": CIFAR10_POLICY,
    "svhn": SVHN_POLICY,
}


def policy_for_dataset(dataset: str) -> str:
    """utils.py:345-349: c10 and c100 both use the CIFAR10 policy."""
    return {"c10": "cifar10", "c100": "cifar10", "svhn": "svhn"}[dataset]


def _policy_arrays(policy: str):
    """Returns (probs, remapped op ids, mags, op fns USED by this policy).

    Under vmap the op ``lax.switch`` evaluates every branch for every image,
    so restricting the branch list to the ops the policy actually references
    removes dead per-batch work (e.g. the CIFAR10 policy never uses shearX).
    """
    subs = _POLICIES[policy]
    probs = np.asarray([[s[0][0], s[1][0]] for s in subs], np.float32)
    ops = np.asarray([[_OP_ID[s[0][1]], _OP_ID[s[1][1]]] for s in subs], np.int32)
    mags = np.asarray([[s[0][2], s[1][2]] for s in subs], np.float32)
    used = sorted({int(o) for o in ops.ravel()})
    remap = np.full(len(_OP_FNS), -1, np.int32)
    for new, orig in enumerate(used):
        remap[orig] = new
    fns = tuple(_OP_FNS[i] for i in used)
    return jnp.asarray(probs), jnp.asarray(remap[ops]), jnp.asarray(mags), fns


def _apply_op(op_id, img, mag, key, fns=None):
    return jax.lax.switch(op_id, fns or _OP_FNS, img, mag, key)


def autoaugment_batch(key, imgs, policy: str):
    """Apply a random sub-policy per image (autoaugment.py:55-57, 233-236).

    imgs: (B, H, W, C) uint8 -> uint8.  Between the two stages the image is
    re-quantized to uint8 values, as PIL holds uint8 between ops.
    """
    probs, ops, mags, fns = _policy_arrays(policy)
    B = imgs.shape[0]
    k_sub, k_rest = jax.random.split(key)
    sub = jax.random.randint(k_sub, (B,), 0, probs.shape[0])
    keys = jax.random.split(k_rest, B)

    def one(img, sub_i, k):
        img = img.astype(jnp.float32)
        for stage in range(2):
            k, k_gate, k_op = jax.random.split(k, 3)
            applied = _apply_op(ops[sub_i, stage], img, mags[sub_i, stage], k_op, fns)
            do = jax.random.uniform(k_gate) < probs[sub_i, stage]
            img = jnp.where(do, applied, img)
            img = jnp.clip(jnp.round(img), 0, 255)
        return img

    out = jax.vmap(one)(imgs, sub, keys)
    return out.astype(jnp.uint8)
