import numpy as np
import jax.numpy as jnp

from vit_cifar_tpu.ops.patchify import to_words, from_words


def _reference_to_words(x_nchw: np.ndarray, patch: int) -> np.ndarray:
    """Independent numpy emulation of vit.py:79-89 (unfold/unfold/permute)."""
    B, C, H, W = x_nchw.shape
    ps = H // patch
    out = np.zeros((B, patch * patch, ps * ps * C), dtype=x_nchw.dtype)
    for b in range(B):
        n = 0
        for i in range(patch):
            for j in range(patch):
                patch_block = x_nchw[b, :, i * ps : (i + 1) * ps, j * ps : (j + 1) * ps]
                # permute(0,2,3,4,5,1): feature order (row, col, channel)
                out[b, n] = np.transpose(patch_block, (1, 2, 0)).reshape(-1)
                n += 1
    return out


def test_to_words_matches_reference_semantics():
    rng = np.random.default_rng(0)
    x_nhwc = rng.normal(size=(2, 32, 32, 3)).astype(np.float32)
    x_nchw = np.transpose(x_nhwc, (0, 3, 1, 2))
    expected = _reference_to_words(x_nchw, patch=8)
    got = np.asarray(to_words(jnp.asarray(x_nhwc), patch=8))
    assert got.shape == (2, 64, 48)
    np.testing.assert_allclose(got, expected, rtol=0, atol=0)


def test_roundtrip():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(3, 32, 32, 3)).astype(np.float32)
    tokens = to_words(jnp.asarray(x), patch=4)
    back = from_words(tokens, patch=4, img_size=32, channels=3)
    np.testing.assert_allclose(np.asarray(back), x)
