"""Patch extraction.

Reference ``ViT._to_words`` (vit.py:79-89) uses two ``unfold`` calls + permute
+ reshape on NCHW tensors; feature order within a patch is (row, col, channel).
On TPU we take NHWC input (the native conv/image layout) and express the same
thing as a single reshape+transpose — pure data movement that XLA folds into
the following embedding matmul, so patchify costs nothing at runtime.
"""

from __future__ import annotations

import jax.numpy as jnp


def to_words(x: jnp.ndarray, patch: int) -> jnp.ndarray:
    """(B, H, W, C) -> (B, patch*patch, patch_size*patch_size*C).

    Feature ordering inside each patch matches the reference's
    ``permute(0,2,3,4,5,1)`` NCHW unfold: (row-in-patch, col-in-patch, channel).
    """
    B, H, W, C = x.shape
    ps = H // patch
    assert ps * patch == H == W, "img_size must be divisible by patch"
    x = x.reshape(B, patch, ps, patch, ps, C)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # (B, p, p, ps, ps, C)
    return x.reshape(B, patch * patch, ps * ps * C)


def from_words(tokens: jnp.ndarray, patch: int, img_size: int, channels: int) -> jnp.ndarray:
    """Inverse of :func:`to_words` — used by analysis/visualization."""
    B = tokens.shape[0]
    ps = img_size // patch
    x = tokens.reshape(B, patch, patch, ps, ps, channels)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(B, img_size, img_size, channels)
