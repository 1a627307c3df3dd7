"""Multi-head self-attention with the reference's exact semantics.

Parity quirks (vs. a standard transformer), kept deliberately:
  * The softmax scale is ``1/sqrt(features)`` over the FULL model dim, not
    ``1/sqrt(head_dim)`` (reference layers.py:79,97).
  * Separate Wq/Wk/Wv projections with bias (layers.py:81-84).
  * Dropout is applied to the output projection only (layers.py:101).

Attention maps are exposed via flax's ``sow`` into the ``intermediates``
collection — the functional replacement for the reference's
``save_attn_map``/``self.attn_map`` attribute mutation (layers.py:50-65,99-100).

TPU notes: seq_len here is tiny (65), so one attention is a handful of small
matmuls; the throughput win comes from batching over (batch, heads) which XLA
does once shapes are static.  A fused Pallas attention kernel lives in
``ops/pallas/attention.py`` and is numerically interchangeable.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .init import TorchLinear

Dtype = Any


class MultiHeadSelfAttention(nn.Module):
    features: int
    head: int = 8
    dropout: float = 0.0
    dtype: Dtype = jnp.float32
    save_attn_map: bool = False
    use_pallas: bool = False
    # benchmarking override for the measured-policy routing: force "einsum",
    # "fused", or "flash" regardless of shape (None -> route by
    # ops.pallas.attention.select_kernel when use_pallas is set)
    pallas_kernel: str | None = None
    # static: when set and < T, keys/values beyond this index are padding
    # (sequence-parallel zero-padding, parallel/sequence.py) and are masked
    # out of the softmax so real tokens never attend to them.  Pad QUERIES
    # produce garbage rows that the trunk slices off before pooling.
    valid_len: int | None = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, F = x.shape
        assert F == self.features
        head_dim = self.features // self.head
        sqrt_d = jnp.asarray(self.features**0.5, dtype=self.dtype)

        q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
        k = TorchLinear(self.features, dtype=self.dtype, name="Wk")(x)
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)

        q = q.reshape(B, T, self.head, head_dim).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.head, head_dim).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.head, head_dim).transpose(0, 2, 1, 3)

        masked = self.valid_len is not None and self.valid_len < T
        choice = "einsum"
        if (self.use_pallas or self.pallas_kernel) and not self.save_attn_map \
                and not masked:
            if self.pallas_kernel is not None:
                if self.pallas_kernel not in ("einsum", "fused", "flash"):
                    raise ValueError(
                        f"pallas_kernel={self.pallas_kernel!r}: expected "
                        "'einsum', 'fused', or 'flash'"
                    )
                choice = self.pallas_kernel
            else:
                # measured policy (docs/PERFORMANCE.md): einsum when the
                # lane padding would dominate (D < 128) or when training at
                # T < 512 (fwd+bwd measured below 1x there), fused while its
                # all-heads block fits VMEM, flash beyond
                from .pallas.attention import select_kernel

                choice = select_kernel(self.head, T, head_dim,
                                       training=not deterministic)
        if choice != "einsum":
            from .pallas.attention import flash_attention, fused_attention

            kernel = fused_attention if choice == "fused" else flash_attention
            out = kernel(q, k, v, 1.0 / float(self.features**0.5))
        else:
            # (B,H,T,T) logits; full-dim scale per layers.py:97
            logits = jnp.einsum("bhif,bhjf->bhij", q, k) / sqrt_d
            if masked:
                key_ok = jnp.arange(T) < self.valid_len
                logits = jnp.where(
                    key_ok[None, None, None, :],
                    logits,
                    jnp.asarray(jnp.finfo(jnp.float32).min, logits.dtype),
                )
            attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            if self.save_attn_map:
                self.sow("intermediates", "attn_map", attn)
            out = jnp.einsum("bhij,bhjf->bihf", attn, v)

        out = out.reshape(B, T, self.features)
        out = TorchLinear(self.features, dtype=self.dtype, name="out_project")(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        return out
