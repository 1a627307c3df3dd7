"""Pallas fused attention vs the einsum reference path (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention
from vit_cifar_tpu.ops.pallas.attention import fused_attention


def _ref(q, k, v, scale):
    logits = jnp.einsum("bhif,bhjf->bhij", q, k) * scale
    attn = jax.nn.softmax(logits, -1)
    return jnp.einsum("bhij,bhjf->bihf", attn, v)


def test_fused_attention_matches_einsum():
    B, H, T, D = 2, 4, 9, 16  # odd T exercises the padding/masking path
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
               for _ in range(3))
    scale = 1.0 / np.sqrt(H * D)
    out = fused_attention(q, k, v, scale)
    ref = _ref(q, k, v, scale)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-5)


def test_fused_attention_grad_matches():
    B, H, T, D = 1, 2, 7, 8
    rng = np.random.default_rng(1)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
               for _ in range(3))
    scale = 0.1
    g_p = jax.grad(lambda a: jnp.sum(fused_attention(a, k, v, scale) ** 2))(q)
    g_r = jax.grad(lambda a: jnp.sum(_ref(a, k, v, scale) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=1e-4, atol=1e-5)


def test_mhsa_module_pallas_path():
    m = MultiHeadSelfAttention(features=32, head=4, use_pallas=True)
    m_ref = MultiHeadSelfAttention(features=32, head=4, use_pallas=False)
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 9, 32)), jnp.float32)
    variables = m.init(jax.random.PRNGKey(0), x)
    out_p = m.apply(variables, x, deterministic=True)
    out_r = m_ref.apply(variables, x, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_p), np.asarray(out_r),
                               rtol=1e-4, atol=1e-5)


def test_flash_attention_matches_einsum():
    """KV-tiled online-softmax kernel: exact vs the einsum core across
    uneven tile splits, padding (odd T, D < 128), and an over-large
    block_kv (single tile)."""
    from vit_cifar_tpu.ops.pallas.attention import flash_attention

    rng = np.random.default_rng(2)
    for (B, H, T, D, bq, bk) in [
        (2, 3, 65, 32, 1024, 32),   # flagship T, many kv tiles, ragged last
        (1, 2, 130, 64, 64, 64),    # q AND kv tiled, ragged last tiles
        (2, 2, 257, 128, 128, 128), # D=128: no lane padding; 3 ragged tiles
        (1, 1, 8, 128, 8, 512),     # block_kv > T: degenerates to one tile
        (1, 2, 300, 32, 96, 128),   # uneven q tiling with padded rows
    ]:
        q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
                   for _ in range(3))
        scale = 1.0 / np.sqrt(H * D)
        out = flash_attention(q, k, v, scale, block_q=bq, block_kv=bk)
        ref = _ref(q, k, v, scale)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-6,
                                   err_msg=f"{(B, H, T, D, bq, bk)}")


def test_flash_attention_grad_matches():
    from vit_cifar_tpu.ops.pallas.attention import flash_attention

    B, H, T, D = 1, 2, 19, 8
    rng = np.random.default_rng(3)
    q, k, v = (jnp.asarray(rng.normal(size=(B, H, T, D)), jnp.float32)
               for _ in range(3))
    scale = 0.1
    g_p = jax.grad(
        lambda a: jnp.sum(flash_attention(a, k, v, scale, 8, 128) ** 2))(q)
    g_r = jax.grad(lambda a: jnp.sum(_ref(a, k, v, scale) ** 2))(q)
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_r),
                               rtol=1e-4, atol=1e-5)


def test_mhsa_use_pallas_routes_long_sequences_to_flash():
    """use_pallas=True must not VMEM-OOM past fused_attention's T cap: the
    mixer routes T > 1024 to the tiled kernel and stays exact."""
    T, F, H = 1032, 32, 4  # > 1024 tokens with tiny features: fast in CI
    m = MultiHeadSelfAttention(features=F, head=H, use_pallas=True)
    m_ref = MultiHeadSelfAttention(features=F, head=H, use_pallas=False)
    x = jnp.asarray(np.random.default_rng(4).normal(size=(1, T, F)),
                    jnp.float32)
    p = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(p, x)
    want = m_ref.apply(p, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
