"""On-device data augmentation (jittable, PRNG-keyed).

Reference equivalents:
  * ``random_crop_flip`` — torchvision RandomCrop(size, padding=4, zero fill)
    + RandomHorizontalFlip in the host transform chain (utils.py:340-342)
  * ``normalize``        — ToTensor + Normalize (utils.py:353-356)
  * ``random_crop_paste``— RandomCropPaste (da.py:4-49)
  * ``cutmix``           — CutMix (da.py:51-78), incl. the float floor-div
    truncation quirk in the bbox arithmetic (``r_w // 2`` on a float)
  * ``mixup``            — MixUp (da.py:81-93)
  * ``augment_dataset``  — optional once-per-epoch whole-dataset pass

TPU design: the reference runs crop/flip/AutoAugment in DataLoader worker
processes on the host; here the dataset is HBM-resident and augmentation is
traced into the train step, so the only per-step host->device traffic is a
scalar step index.  Crops use arange+take_along_axis gathers, NOT vmapped
``dynamic_slice`` (which lowers to an XLA while-loop — multi-ms fixed cost on
this runtime).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(x, mean, std):
    """(x/255 - mean)/std on the trailing channel axis; accepts uint8/float."""
    x = jnp.asarray(x, jnp.float32) / 255.0
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)
    return (x - mean) / std


def random_crop_flip(key, x, padding: int, flip: bool = True):
    """Per-image random crop from zero-padded borders + horizontal flip p=0.5.

    x: (B, H, W, C) uint8.  torchvision RandomCrop semantics (zero fill).
    """
    B, H, W, C = x.shape
    k_y, k_x, k_f = jax.random.split(key, 3)
    xp = jnp.pad(x, ((0, 0), (padding, padding), (padding, padding), (0, 0)))
    off_y = jax.random.randint(k_y, (B,), 0, 2 * padding + 1)
    off_x = jax.random.randint(k_x, (B,), 0, 2 * padding + 1)
    rows = off_y[:, None] + jnp.arange(H)[None, :]  # (B, H)
    out = jnp.take_along_axis(xp, rows[:, :, None, None], axis=1)
    cols = off_x[:, None] + jnp.arange(W)[None, :]  # (B, W)
    out = jnp.take_along_axis(out, cols[:, None, :, None], axis=2)
    if flip:
        do = jax.random.bernoulli(k_f, 0.5, (B,))
        out = jnp.where(do[:, None, None, None], out[:, :, ::-1, :], out)
    return out


def cutmix(key, img, label, size: int, beta: float = 1.0):
    """da.py:51-78.  NCHW ``img[:, :, x1:x2, y1:y2]`` slices (H, W) = (x, y).

    Returns (img, label, rand_label, lam) with
    lam = 1 - box_area/size^2 recomputed from the clipped box (da.py:70).
    """
    k_lam, k_x, k_y, k_perm = jax.random.split(key, 4)
    lam0 = jax.random.beta(k_lam, beta, beta)
    r_x = jax.random.uniform(k_x, (), minval=0.0, maxval=size)
    r_y = jax.random.uniform(k_y, (), minval=0.0, maxval=size)
    r_w = size * jnp.sqrt(1.0 - lam0)
    half = jnp.floor(r_w / 2.0)  # float floor-div quirk: r_w // 2
    x1 = jnp.floor(jnp.clip(r_x - half, 0, size))
    x2 = jnp.floor(jnp.clip(r_x + half, 0, size))
    y1 = jnp.floor(jnp.clip(r_y - half, 0, size))
    y2 = jnp.floor(jnp.clip(r_y + half, 0, size))

    r = jnp.arange(size, dtype=jnp.float32)
    mask_h = (r >= x1) & (r < x2)  # x slices the H axis in the reference
    mask_w = (r >= y1) & (r < y2)
    box = (mask_h[:, None] & mask_w[None, :])[None, :, :, None]

    perm = jax.random.permutation(k_perm, img.shape[0])
    img = jnp.where(box, img[perm], img)
    lam = 1.0 - (x2 - x1) * (y2 - y1) / float(size * size)
    return img, label, label[perm], lam


def mixup(key, img, label, alpha: float = 1.0):
    """da.py:81-93: one Beta(alpha, alpha) lambda for the whole batch."""
    k_lam, k_perm = jax.random.split(key)
    lam = jax.random.beta(k_lam, alpha, alpha)
    perm = jax.random.permutation(k_perm, img.shape[0])
    mixed = lam * img + (1.0 - lam) * img[perm]
    return mixed, label, label[perm], lam


def random_crop_paste(key, x, alpha: float = 1.0, flip_p: float = 0.5):
    """da.py:4-49 — crop a Beta-sized box, random flips, alpha-blend paste.

    The reference is a per-image host transform; here every image draws its
    own parameters and the dynamic-size crop/paste becomes gather arithmetic
    (traced shapes must be static).
    """
    B, H, W, C = x.shape
    ks = jax.random.split(key, 7)
    lam = jax.random.beta(ks[0], alpha, alpha, (B,))
    cut = jnp.floor(W * jnp.sqrt(1.0 - lam))  # np.int truncation
    cx = jax.random.randint(ks[1], (B,), 0, W).astype(jnp.float32)
    cy = jax.random.randint(ks[2], (B,), 0, H).astype(jnp.float32)
    half = jnp.floor(cut / 2.0)
    fx1 = jnp.clip(cx - half, 0, W)
    fx2 = jnp.clip(cx + half, 0, W)
    fy1 = jnp.clip(cy - half, 0, H)
    fy2 = jnp.clip(cy + half, 0, H)
    fw = fx2 - fx1
    fh = fy2 - fy1

    # paste origin ~ randint(0, size - front_extent) (da.py:18-21); clamp the
    # range to >= 1 (the reference CRASHES when the crop spans the full image)
    px1 = jnp.floor(
        jax.random.uniform(ks[3], (B,)) * jnp.maximum(W - fw, 1.0)
    )
    py1 = jnp.floor(
        jax.random.uniform(ks[4], (B,)) * jnp.maximum(H - fh, 1.0)
    )

    flip_front = jax.random.uniform(ks[5], (B,)) <= flip_p
    flip_bg = jax.random.uniform(ks[6], (B, 1)) <= flip_p
    mix = jax.random.uniform(jax.random.fold_in(key, 1), (B, 1, 1, 1))

    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None]  # (1,H,1)
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :]  # (1,1,W)
    b_ = lambda a: a[:, None, None]

    in_box = (
        (yy >= b_(py1)) & (yy < b_(py1 + fh)) & (xx >= b_(px1)) & (xx < b_(px1 + fw))
    )  # (B,H,W)
    src_y = yy - b_(py1) + b_(fy1)
    src_x_plain = xx - b_(px1) + b_(fx1)
    src_x_flip = b_(fx2) - 1.0 - (xx - b_(px1))
    src_x = jnp.where(b_(flip_front.astype(jnp.float32)) > 0, src_x_flip, src_x_plain)
    iy = jnp.clip(src_y, 0, H - 1).astype(jnp.int32)
    ix = jnp.clip(src_x, 0, W - 1).astype(jnp.int32)
    iy = jnp.broadcast_to(iy, (B, H, W))
    ix = jnp.broadcast_to(ix, (B, H, W))
    front = x[jnp.arange(B)[:, None, None], iy, ix]  # (B,H,W,C) gather

    bg = jnp.where(flip_bg[:, :, None, None], x[:, :, ::-1, :], x)
    blended = bg * mix + front * (1.0 - mix)
    return jnp.where(in_box[..., None], blended, bg)


def augment_dataset(
    key,
    xs,
    img_shape,
    padding: int,
    flip: bool = True,
    autoaugment_policy: str | None = None,
    chunk: int = 2500,
):
    """Once-per-epoch whole-dataset crop/flip(/AutoAugment) pass.

    xs: flat (N, H*W*C) uint8 (the HBM-resident layout); returns the same.
    AutoAugment runs through ``lax.map`` chunks — one fully unrolled pass over
    50k images has crashed the TPU worker process before (CLAUDE.md).
    """
    N = xs.shape[0]
    H, W, C = img_shape
    k_crop, k_aa = jax.random.split(key)
    x = random_crop_flip(k_crop, xs.reshape(N, H, W, C), padding, flip)
    if autoaugment_policy is not None:
        from .autoaugment import autoaugment_batch

        chunk = min(chunk, N)  # small datasets: one chunk, no short-pad bug
        n_chunks = -(-N // chunk)
        pad = n_chunks * chunk - N
        if pad:
            # jnp.resize cycles whole images (H*W*C divides the flat offset),
            # so this also works when pad > N
            x = jnp.concatenate([x, jnp.resize(x, (pad,) + x.shape[1:])])
        keys = jax.random.split(k_aa, n_chunks)
        x = jax.lax.map(
            lambda args: autoaugment_batch(args[0], args[1], autoaugment_policy),
            (keys, x.reshape(n_chunks, chunk, H, W, C)),
        ).reshape(n_chunks * chunk, H, W, C)
        if pad:
            x = x[:N]
    return x.reshape(N, H * W * C)
