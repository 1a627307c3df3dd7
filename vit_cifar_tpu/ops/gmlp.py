"""gMLP-family token mixers: GatedMLP, WeightGatedMLP, LinearAttention.

Reference: layers.py:491-514 (GatedMLP), layers.py:533-553 (WeightGatedMLP),
layers.py:1260-1281 (LinearAttention).  Shared shape: lift to ``ffn_features``
with U + GELU, chunk into (z1, z2), LayerNorm z2, produce a token-mixing
transform from z2, gate ``z1 * mix`` (or matmul), project back with V.

  * GatedMLP: static learned TxT mixing weight, init U(-0.01, 0.01), plus a
    per-token bias initialized to ones (layers.py:502-505).
  * WeightGatedMLP: data-dependent (B,T,T) mixing = Linear(ffn/2 -> T) on z2
    (layers.py:540-552).
  * LinearAttention: two-layer mixing map relu(Linear(ffn/2->T)) then
    Linear(T->T) (layers.py:1271-1281).

None of these apply dropout inside the mixer (parity).  All are dense
matmul-friendly: a (B,T,T) x (B,T,ffn/2) batched matmul maps straight onto
the MXU.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .init import TorchLinear, uniform_range

Dtype = Any


class GatedMLP(nn.Module):
    features: int
    ffn_features: int
    seq_len: int
    dropout: float = 0.0  # unused; kept for uniform factory signature
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.ffn_features % 2 == 0
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        z1, z2 = jnp.split(h, 2, axis=-1)
        z2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(z2)
        weight = self.param(
            "weight", uniform_range(-0.01, 0.01), (self.seq_len, self.seq_len),
            jnp.float32,
        )
        bias = self.param(
            "bias", lambda k, s, d=jnp.float32: jnp.ones(s, d), (1, self.seq_len, 1)
        )
        z2 = jnp.einsum("ij,bjd->bid", weight.astype(self.dtype), z2) + bias.astype(
            self.dtype
        )
        return TorchLinear(self.features, dtype=self.dtype, name="V")(z1 * z2)


class WeightGatedMLP(nn.Module):
    features: int
    ffn_features: int
    seq_len: int
    dropout: float = 0.0  # unused (parity)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.ffn_features % 2 == 0
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        z1, z2 = jnp.split(h, 2, axis=-1)
        z2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(z2)
        mix = TorchLinear(self.seq_len, dtype=self.dtype, name="to_weight")(z2)
        out = jnp.einsum("bij,bjf->bif", mix, z1)
        return TorchLinear(self.features, dtype=self.dtype, name="V")(out)


class LinearAttention(nn.Module):
    features: int
    ffn_features: int
    seq_len: int
    dropout: float = 0.0  # unused (parity)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.ffn_features % 2 == 0
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        z1, z2 = jnp.split(h, 2, axis=-1)
        z2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(z2)
        mix = nn.relu(TorchLinear(self.seq_len, dtype=self.dtype, name="to_weight1")(z2))
        mix = TorchLinear(self.seq_len, dtype=self.dtype, name="to_weight2")(mix)
        out = jnp.einsum("bij,bjf->bif", mix, z1)
        return TorchLinear(self.features, dtype=self.dtype, name="V")(out)
