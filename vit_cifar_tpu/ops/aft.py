"""Attention-Free Transformer mixers (AFT-Full / AFT-Simple).

Reference: layers.py:106-203.  Semantics preserved exactly:

  * AFT-Full (layers.py:106-165): learned TxT position bias ``w`` (optionally
    factorized ``u @ v`` with rank ``factorization_dimension``, xavier-uniform
    init), ``Y = (exp(w) @ (exp(K) * V)) / (exp(w) @ exp(K))``, optional
    sigmoid query gate, output projection + dropout.
  * Stabilization quirk kept: the reference subtracts ``max(K, dim=0)`` —
    dim 0 is the BATCH axis (layers.py:158) — which, unlike a per-row max,
    does NOT cancel out of the ratio and couples examples within a batch.
    We replicate it because it changes the learned function.
  * AFT-Simple (layers.py:168-203): ``Y = sum_T softmax(K, dim=tokens) * V``
    (a (B,1,F) global summary broadcast by the query gate).  The encoder
    dispatch never forwards ``query`` to AFTSimple (layers.py:233), so its
    gate is ALWAYS on regardless of --no-query; the factory in
    models/__init__.py reproduces that.
  * head > 1 is unimplemented in the reference (layers.py:128) and here.

TPU notes: seq_len=65 means exp(w) @ (exp(K)*V) is two tiny matmuls — XLA
fuses the exp/mul chains into them; nothing here needs a custom kernel.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp
from jax.nn.initializers import xavier_uniform

from .init import TorchLinear

Dtype = Any


class AFT(nn.Module):
    features: int
    seq_len: int
    mode: str = "full"  # full | simple
    factorize: bool = False
    factorization_dimension: int = 128
    head: int = 1
    dropout: float = 0.0
    query: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.head > 1:
            raise NotImplementedError("AFT head > 1 (parity: layers.py:128-129)")
        if self.mode not in ("full", "simple"):
            # parity: 'local'/'conv' raise in the reference (layers.py:236-238)
            raise NotImplementedError(f"AFT mode {self.mode!r}")

        k = TorchLinear(self.features, dtype=self.dtype, name="Wk")(x)
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)

        if self.mode == "full":
            if self.factorize:
                u = self.param(
                    "u", xavier_uniform(),
                    (self.seq_len, self.factorization_dimension), jnp.float32,
                )
                vv = self.param(
                    "v", xavier_uniform(),
                    (self.factorization_dimension, self.seq_len), jnp.float32,
                )
                w = (u @ vv).astype(self.dtype)
            else:
                w = self.param(
                    "w", xavier_uniform(), (self.seq_len, self.seq_len), jnp.float32
                ).astype(self.dtype)
            # fp32 for the exp/ratio arithmetic regardless of compute dtype
            w32 = w.astype(jnp.float32)
            k32 = k.astype(jnp.float32)
            v32 = v.astype(jnp.float32)
            exp_w = jnp.exp(w32 - jnp.max(w32, axis=-1, keepdims=True))  # (T,T)
            # batch-axis max quirk (layers.py:158)
            exp_k = jnp.exp(k32 - jnp.max(k32, axis=0, keepdims=True))  # (B,T,F)
            num = jnp.einsum("ij,bjf->bif", exp_w, exp_k * v32)
            den = jnp.einsum("ij,bjf->bif", exp_w, exp_k)
            y = (num / den).astype(self.dtype)
        else:
            attn = nn.softmax(k.astype(jnp.float32), axis=1).astype(self.dtype)
            y = jnp.sum(attn * v, axis=1, keepdims=True)  # (B,1,F)

        if self.query:
            q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
            y = jnp.asarray(nn.sigmoid(q), self.dtype) * y
        # (no-query AFT-Simple leaves y as (B,1,F); the residual add in the
        # encoder broadcasts it, matching torch's behavior)

        out = TorchLinear(self.features, dtype=self.dtype, name="out_project")(y)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
