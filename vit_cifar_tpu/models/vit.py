"""The shared ViT trunk.

Reference: ``ViT`` (vit.py:19-89).  All 10 transformer-style models in the
reference subclass this trunk and only replace the encoder stack; here the
trunk takes a mixer factory instead (see models/__init__.py).

Semantics preserved:
  * patchify = unfold/unfold/permute (vit.py:79-89) — implemented as one
    reshape+transpose on NHWC input (``ops/patchify.to_words``; exactness
    proven in tests/test_patchify.py)
  * linear patch embedding (vit.py:44)
  * learnable cls token + position embedding, both ~N(0,1) (vit.py:45-48)
  * pre-LN encoder blocks with the double-GELU MLP (layers.py:15-65)
  * head = LayerNorm + Linear on the cls token, or mean-pool without one
    (vit.py:61-76)
  * ``pos_emb=False`` freezes the embedding at zeros — i.e. no parameter —
    (vit.py:143-144; only reachable from the non-vit variants)

TPU notes: the whole trunk is static-shape matmuls; ``remat=True`` wraps each
encoder block in ``jax.checkpoint`` to trade FLOPs for HBM on deep configs.
"""

from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax.numpy as jnp

from ..ops.common import EncoderBlock
from ..ops.init import TorchLinear, normal
from ..ops.patchify import to_words

Dtype = Any


class ViT(nn.Module):
    mixer: Callable[..., nn.Module]
    num_classes: int = 10
    img_size: int = 32
    patch: int = 8
    num_layers: int = 7
    hidden: int = 384
    mlp_hidden: int = 384
    dropout: float = 0.0
    use_encoder_mlp: bool = True
    is_cls_token: bool = True
    pos_emb: bool = True
    remat: bool = False
    dtype: Dtype = jnp.float32
    # optional activation-sharding hook (h -> h), applied to the (B, T, F)
    # token stream after embedding and after every encoder block.  Used by
    # parallel/sequence.py to pin the token dim to a 'seq' mesh axis
    # (sequence parallelism); None -> identity.  Purely a layout hint:
    # the math is unchanged.
    act_constraint: Any = None
    # static pad count: zero tokens appended after embedding+cls+pos so the
    # token dim divides the 'seq' mesh axis (T=65 is odd); sliced back off
    # before pooling.  The mixer must mask them out of any cross-token
    # reduction (MultiHeadSelfAttention.valid_len) — parallel/sequence.py
    # sets both together and scopes SP to mixers that can.
    seq_pad: int = 0
    # optional channel-MLP factory forwarded to every EncoderBlock (e.g. the
    # MoE MLP with expert parallelism, ops/moe.MoEMLP); None -> the
    # reference's dense EncoderMLP.
    mlp_factory: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        # (B, H, W, C) -> (B, patch^2, ps^2*C) -> (B, T, hidden)
        out = to_words(x.astype(self.dtype), self.patch)
        out = TorchLinear(self.hidden, dtype=self.dtype, name="emb")(out)
        if self.is_cls_token:
            cls = self.param("cls_token", normal(1.0), (1, 1, self.hidden))
            cls = jnp.broadcast_to(cls.astype(self.dtype), (out.shape[0], 1, self.hidden))
            out = jnp.concatenate([cls, out], axis=1)
        if self.pos_emb:
            pos = self.param(
                "pos_emb", normal(1.0), (1, out.shape[1], self.hidden)
            )
            out = out + pos.astype(self.dtype)
        # else: frozen zeros (vit.py:143-144) — adding zero is a no-op
        seq_len = out.shape[1]
        if self.seq_pad:
            out = jnp.pad(out, ((0, 0), (0, self.seq_pad), (0, 0)))
        if self.act_constraint is not None:
            out = self.act_constraint(out)

        for i in range(self.num_layers):
            block = EncoderBlock(
                features=self.hidden,
                mlp_hidden=self.mlp_hidden,
                mixer=self.mixer,
                use_mlp=self.use_encoder_mlp,
                dropout=self.dropout,
                dtype=self.dtype,
                mlp_factory=self.mlp_factory,
                name=f"enc{i}",
            )
            if self.remat:
                # deterministic is a static python bool; close over it so only
                # the activations are rematerialization inputs
                fn = nn.remat(
                    lambda mdl, h, det=deterministic: mdl(h, deterministic=det)
                )
                out = fn(block, out)
            else:
                out = block(out, deterministic=deterministic)
            if self.act_constraint is not None:
                out = self.act_constraint(out)

        if self.seq_pad:
            out = out[:, :seq_len]
        out = out[:, 0] if self.is_cls_token else out.mean(axis=1)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="fc_norm")(out)
        return TorchLinear(self.num_classes, dtype=self.dtype, name="fc")(out)
