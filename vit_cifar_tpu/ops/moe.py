"""Mixture-of-Experts MLP with Switch-style top-1 routing.

No reference equivalent: mahbodnr/ViT-CIFAR has a single dense encoder MLP
(layers.py:32-39).  This exists to complete the mesh vocabulary with expert
parallelism (the ``expert`` axis, alongside data/model/pipe/seq) — a
scaling capability beyond the DP-only reference, like TP/PP/SP.

TPU-native design
-----------------
The classic GShard/Switch einsum formulation: routing is expressed as two
static-shape one-hot dispatch/combine tensors and three batched einsums, so
the whole layer is MXU work with no dynamic shapes, sorts, or scatters —
exactly what XLA partitions well.  Tokens are grouped per example (G=B,
S=T): capacity C = ceil(S/E * capacity_factor) tokens per expert per
example, overflow tokens are dropped (they pass through the encoder
block's residual unchanged).  Expert weights are stacked (E, ...) arrays;
``parallel/mesh.shard_params`` pins their leading dim to the ``expert``
mesh axis and GSPMD turns the dispatch/combine einsums into the expected
all-to-all-style collectives.

Per-expert FFN semantics mirror EncoderMLP exactly (Linear -> GELU ->
Dropout -> Linear -> GELU -> Dropout, including the reference's nonstandard
trailing GELU, layers.py:32-39) so an E=1 MoE is bit-equivalent to the
dense block (tests/test_moe.py pins this).

The Switch load-balance loss (aux = E * sum_e f_e * P_e; == 1.0 at perfect
balance) is sown into ``intermediates`` as ``moe_aux``; the train step adds
``cfg.moe_aux_weight`` times its mean to the loss.
"""

from __future__ import annotations

import math
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .init import TorchLinear, uniform_range

Dtype = Any


class MoEMLP(nn.Module):
    features: int
    mlp_hidden: int
    num_experts: int = 8
    capacity_factor: float = 1.25
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, F = x.shape
        assert F == self.features
        E, H = self.num_experts, self.mlp_hidden
        C = min(T, max(1, math.ceil(T / E * self.capacity_factor)))

        # router in f32 (routing decisions should not dither with bf16)
        logits = TorchLinear(E, dtype=jnp.float32, name="router")(
            x.astype(jnp.float32)
        )  # (B,T,E)
        probs = jax.nn.softmax(logits, axis=-1)
        gate = probs.max(axis=-1)  # (B,T) top-1 prob
        expert = probs.argmax(axis=-1)  # (B,T)
        onehot = jax.nn.one_hot(expert, E, dtype=jnp.float32)  # (B,T,E)

        # position of each token within its expert's capacity buffer,
        # first-come-first-served in token order within the example
        pos = jnp.cumsum(onehot, axis=1) * onehot  # 1-based at own slot
        keep = (pos <= C) * onehot  # (B,T,E)
        # pos-1 is -1 at non-own slots -> all-zero one_hot row (dropped)
        slot = jax.nn.one_hot(
            pos.astype(jnp.int32) - 1, C, dtype=jnp.float32
        )  # (B,T,E,C)
        dispatch = slot * keep[..., None]  # (B,T,E,C) 0/1
        combine = dispatch * gate[..., None, None]  # (B,T,E,C)

        # Switch aux loss: fraction routed to e (pre-drop) x mean router prob
        f_e = onehot.mean(axis=(0, 1))
        p_e = probs.mean(axis=(0, 1))
        aux = E * jnp.sum(f_e * p_e)
        self.sow("intermediates", "moe_aux", aux)

        bound1 = 1.0 / (F**0.5)
        bound2 = 1.0 / (H**0.5)
        w1 = self.param("expert_w1", uniform_range(-bound1, bound1), (E, F, H))
        b1 = self.param("expert_b1", uniform_range(-bound1, bound1), (E, H))
        w2 = self.param("expert_w2", uniform_range(-bound2, bound2), (E, H, F))
        b2 = self.param("expert_b2", uniform_range(-bound2, bound2), (E, F))

        dt = self.dtype
        xin = jnp.einsum("btec,btf->ebcf", dispatch.astype(dt), x.astype(dt))
        h = jnp.einsum("ebcf,efh->ebch", xin, w1.astype(dt)) + b1.astype(dt)[
            :, None, None, :
        ]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = jnp.einsum("ebch,ehf->ebcf", h, w2.astype(dt)) + b2.astype(dt)[
            :, None, None, :
        ]
        h = nn.gelu(h, approximate=False)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        return jnp.einsum("btec,ebcf->btf", combine.astype(dt), h)
