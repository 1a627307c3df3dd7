"""Autoencoder attention — the reference fork's research centerpiece.

Reference: layers.py:813-907 (AEAttention), layers.py:910-1086
(AEAttentionHeads), layers.py:1199-1257 (BaselineAEAttention), with AE-type
dispatch at layers.py:1089-1196.

Semantics:
  * lift x with U+GELU; z = LayerNorm(stop_gradient(x or chunk half))
  * AE reconstructs z; (input, hidden, output) exposed for the aece criterion
    and the unsupervised update — sown into ``intermediates`` instead of the
    reference's stored attributes (layers.py:858-860)
  * attention score between tokens i,j = <AE(masked row j), z_j> where the
    masked row keeps only token j (zeros or random fill) (layers.py:862-881)
  * softmax is DETACHED (layers.py:882-884) — no gradient through the scores
  * mix x with the attention map, project with V

TPU design — the (B,T,T,F) mask blowup (layers.py:862-877) is avoided where
it is provably redundant: for feature-dim AEs (ae_type='simple', with or
without NNMF linears) the AE acts on each (i,j) row independently, and the
eye-masked row (i,j) is ``z_j if i==j else 0``, so
    dist[b,i,j] = (i==j) ? <AE(z_j), z_j> : <AE(0), z_j>
— two O(B*T*F) terms instead of an O(B*T^2*F) tensor (~1.7 GB at the flagship
config).  AE(0) is one AE call on a zero vector.  Equivalence is asserted in
tests/test_ae_attention.py.  Sequence-mixing AEs (transpose/2d/heads) and
mask_type='random' use the general materializing path.

The inner AE optimizer (layers.py:844, 893-907) lives in the train step as a
second optax state — see train/steps.py.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .autoencoders import (
    Autoencoder,
    Autoencoder2D,
    AutoencoderH,
    AutoencoderT,
    NNMFParams,
)
from .init import TorchLinear
from .nnmf.layers import AutoNNMFLayer

Dtype = Any


def build_ae(
    *,
    ae_type: str,
    seq_len: int,
    ffn_features: int,
    heads: int = 1,
    chunk: bool = False,
    legacy_heads: bool = False,
    ae_hidden_features: int = 128,
    ae_hidden_seq_len: int = 8,
    order_2d: str = "sfsf",
    nnmf: bool = False,
    nnmf_params: NNMFParams = NNMFParams(),
    dtype=jnp.float32,
    name: str = "AE",
):
    """AE-type dispatch (layers.py:1113-1196) as a module factory.

    Used both by the mixers below and by the train step's unsupervised update
    (which re-applies the AE submodule with extracted params).
    """
    width = ffn_features // 2 if chunk else ffn_features
    kw = dict(nnmf=nnmf, nnmf_params=nnmf_params, dtype=dtype, name=name)
    if ae_type == "simple":
        return Autoencoder(input_size=width, hidden_size=ae_hidden_features, **kw)
    if ae_type == "transpose":
        return AutoencoderT(seq_len=seq_len, hidden_size=ae_hidden_seq_len, **kw)
    if ae_type == "heads":
        if legacy_heads:
            return AutoencoderH(
                input_size=seq_len * heads,
                hidden_size=ae_hidden_features,
                heads=heads,
                **kw,
            )
        if nnmf:
            return AutoNNMFLayer(
                number_of_input_neurons=1,
                number_of_neurons=ae_hidden_seq_len,
                input_size=(seq_len * heads, width // heads),
                forward_kernel_size=(seq_len * heads, 1),
                number_of_iterations=nnmf_params.number_of_iterations,
                local_learning=nnmf_params.local_learning,
                w_trainable=True,
                keep_last_grad_scale=True,
                disable_scale_grade=False,
                dtype=dtype,
                name=name,
            )
        return AutoencoderT(
            seq_len=seq_len * heads, hidden_size=ae_hidden_seq_len, **kw
        )
    if ae_type == "2d":
        return Autoencoder2D(
            order=order_2d,
            seq=seq_len,
            features=width,
            seq_hidden=ae_hidden_seq_len,
            features_hidden=ae_hidden_features,
            **kw,
        )
    raise NotImplementedError(f"AE type {ae_type} not implemented")


def _eye_mask(z, mask_type: str, rng=None):
    """The (B,T,T,F) masked tensor (layers.py:862-873)."""
    B, T, F = z.shape
    rep = jnp.broadcast_to(z[:, None, :, :], (B, T, T, F))
    eye = jnp.eye(T, dtype=z.dtype)[None, :, :, None]
    if mask_type == "zeros":
        return eye * rep
    # random fill: noise ~ N(mean(z_rep), std(z_rep)) (layers.py:867-873)
    noise = jax.random.normal(rng, rep.shape, z.dtype) * rep.std() + rep.mean()
    return eye * rep + (1.0 - eye) * noise


class AEAttention(nn.Module):
    """layers.py:813-907 — simple/transpose/2d/legacy-heads AE attention."""

    features: int
    seq_len: int
    ffn_features: int
    head: int = 1
    ae_type: str = "simple"
    ae_hidden_features: int = 128
    ae_hidden_seq_len: int = 8
    order_2d: str = "sfsf"
    mask_type: str = "zeros"
    chunk: bool = False
    legacy_heads: bool = False
    use_nnmf_layers: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0  # unused (parity: AEAttention has no dropout)
    save_attn_map: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.mask_type in ("zeros", "random")
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        if self.chunk:
            x1, z = jnp.split(h, 2, axis=-1)
        else:
            x1, z = h, h
        z = jax.lax.stop_gradient(z)
        z = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(z)
        z = z.astype(jnp.float32)

        ae = build_ae(
            ae_type=self.ae_type,
            seq_len=self.seq_len,
            ffn_features=self.ffn_features,
            heads=self.head,
            chunk=self.chunk,
            legacy_heads=self.legacy_heads,
            ae_hidden_features=self.ae_hidden_features,
            ae_hidden_seq_len=self.ae_hidden_seq_len,
            order_2d=self.order_2d,
            nnmf=self.use_nnmf_layers,
            nnmf_params=self.nnmf_params,
            dtype=jnp.float32,
        )
        ae_out, ae_hidden = ae(z, deterministic=deterministic)
        self.sow("intermediates", "ae_input", z)
        self.sow("intermediates", "ae_output", ae_out)
        if ae_hidden is not None:
            self.sow("intermediates", "ae_hidden", ae_hidden)

        fast_path = self.ae_type == "simple" and self.mask_type == "zeros"
        if fast_path:
            # structured equivalent of the (B,T,T,F) blowup — see module doc
            diag = jnp.sum(ae_out * z, axis=-1)  # (B,T): <AE(z_j), z_j>
            zero_in = jnp.zeros((1, 1, z.shape[-1]), z.dtype)
            ae0 = ae(zero_in, deterministic=deterministic)[0]  # (1,1,F)
            off = jnp.einsum("bjf,f->bj", z, ae0[0, 0])  # <AE(0), z_j>
            T = z.shape[1]
            eye = jnp.eye(T, dtype=z.dtype)
            dist = off[:, None, :] + eye[None] * (diag - off)[:, None, :]
        else:
            rng = (
                self.make_rng("mask")
                if self.mask_type == "random" and self.has_rng("mask")
                else None
            )
            if self.mask_type == "random" and rng is None:
                rng = jax.random.PRNGKey(0)
            z_mask = _eye_mask(z, self.mask_type, rng)
            ae_preds = ae(z_mask, deterministic=deterministic)[0]
            dist = jnp.sum(ae_preds * z[:, None, :, :], axis=-1)  # (B,T,T)

        attn_map = jax.lax.stop_gradient(jax.nn.softmax(dist, axis=-1))
        if self.save_attn_map:
            self.sow("intermediates", "attn_map", attn_map)
        attn = jnp.einsum("bij,bjf->bif", attn_map.astype(self.dtype), x1)
        return TorchLinear(self.features, dtype=self.dtype, name="V")(attn)


class AEAttentionHeads(nn.Module):
    """layers.py:910-1086 — multi-head AE attention (default ae path when
    ae_type='heads' without --legacy-heads)."""

    features: int
    seq_len: int
    ffn_features: int
    heads: int = 1
    ae_hidden_seq_len: int = 8
    mask_type: str = "zeros"
    chunk: bool = False
    use_nnmf_layers: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0  # unused (parity)
    save_attn_map: bool = False
    # rows of the eye-masked tensor processed per chunk; 0 = materialize the
    # full (B,T,heads*T,F/h) tensor in one shot (the reference layout,
    # layers.py:862-877, its hot spot).  dist feeds a DETACHED softmax, so the
    # masked path keeps no backward activations.  Measured on a v5e at the
    # flagship config: chunking is ~9% faster end-to-end (7205 vs 6612 img/s);
    # compiled temp memory is equal either way (XLA's scheduler already avoids
    # holding the full tensor — the torch 1.6 GB blowup does not transfer).
    # Equivalence: tests/test_ae_attention.py.
    mask_chunk: int = 16
    dtype: Dtype = jnp.float32

    def _to_heads(self, x):
        """[..., T, F] -> [..., heads, T, F//heads] (layers.py:1054-1061)."""
        y = x.reshape(x.shape[:-1] + (self.heads, x.shape[-1] // self.heads))
        return jnp.swapaxes(y, -2, -3)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.mask_type in ("zeros", "random")
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        norm1 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")
        if self.chunk:
            x1, z = jnp.split(h, 2, axis=-1)
            z = norm1(jax.lax.stop_gradient(z))
        else:
            # parity quirk (layers.py:989-992): without chunk, x itself is
            # normalized and z is its detached copy
            x1 = norm1(h)
            z = jax.lax.stop_gradient(x1)
        z = z.astype(jnp.float32)
        width = z.shape[-1]

        x_heads = self._to_heads(x1)  # (B,h,T,F/h)
        z_heads = self._to_heads(z)

        ae = build_ae(
            ae_type="heads",
            seq_len=self.seq_len,
            ffn_features=self.ffn_features,
            heads=self.heads,
            chunk=self.chunk,
            ae_hidden_seq_len=self.ae_hidden_seq_len,
            nnmf=self.use_nnmf_layers,
            nnmf_params=self.nnmf_params,
            dtype=jnp.float32,
        )
        B, T = z.shape[0], z.shape[1]
        ae_input = z_heads.reshape(B, self.heads * T, width // self.heads)
        if self.use_nnmf_layers:
            ae_input = ae_input[:, None]  # (B,1,h*T,F/h) for the NNMF layer
            ae_out = ae(ae_input, deterministic=deterministic)
            ae_hidden = None  # sown by AutoNNMFLayer itself
        else:
            ae_out, ae_hidden = ae(ae_input, deterministic=deterministic)
        self.sow("intermediates", "ae_input", ae_input)
        self.sow("intermediates", "ae_output", ae_out)
        if ae_hidden is not None:
            self.sow("intermediates", "ae_hidden", ae_hidden)

        Fh = width // self.heads
        S = self.heads * T

        def _preds(zm_in):
            """AE over masked rows: (B, c, S, F/h) -> same shape."""
            if self.use_nnmf_layers:
                w = ae.variables["params"]["nnmf_weights"]
                # W@Wᵀ NNMF shortcut (layers.py:1026-1029)
                return jnp.einsum("cd,bidf->bicf", w @ w.T, zm_in)
            return ae(zm_in, deterministic=deterministic)[0]

        if self.mask_type == "zeros" and self.mask_chunk > 0:
            # Chunked structured path for the (B,T,S,F/h) hot spot
            # (layers.py:862-877): eye-masked row i keeps only token i, so a
            # chunk of rows is built as eye[rows,j] * z_heads and consumed
            # immediately — the full tensor never exists.
            col = jnp.arange(T)
            dist_chunks = []
            for r0 in range(0, T, self.mask_chunk):
                rows = jnp.arange(r0, min(r0 + self.mask_chunk, T))
                eye_c = (rows[:, None] == col[None, :]).astype(z.dtype)  # (c,T)
                # (B, c, heads, T, F/h)
                zm_c = eye_c[None, :, None, :, None] * z_heads[:, None]
                preds = _preds(zm_c.reshape(B, len(rows), S, Fh))
                preds = preds.reshape(zm_c.shape)
                dist_chunks.append(jnp.sum(preds * z_heads[:, None], axis=-1))
            dist = jnp.concatenate(dist_chunks, axis=1)  # (B,T,h,T)
        else:
            rng = (
                self.make_rng("mask")
                if self.mask_type == "random" and self.has_rng("mask")
                else jax.random.PRNGKey(0)
            )
            z_mask = _eye_mask(z, self.mask_type, rng)  # (B,T,T,width)
            zm_heads = self._to_heads(z_mask)  # (B,T,heads,T,F/h)
            ae_preds = _preds(zm_heads.reshape(B, T, S, Fh)).reshape(
                zm_heads.shape
            )
            dist = jnp.sum(ae_preds * z_heads[:, None], axis=-1)  # (B,T,h,T)
        dist = jnp.swapaxes(dist, 1, 2)  # (B,h,T,T)
        attn_map = jax.lax.stop_gradient(jax.nn.softmax(dist, axis=-1))
        if self.save_attn_map:
            self.sow("intermediates", "attn_map", attn_map)
        attn = jnp.einsum(
            "bhij,bhjf->bihf", attn_map.astype(self.dtype), x_heads
        ).reshape(B, T, width)
        return TorchLinear(self.features, dtype=self.dtype, name="V")(attn)


class BaselineAEAttention(nn.Module):
    """layers.py:1199-1257 — non-detached AE attention over chunked z2.

    Working equivalent: the reference model crashes as shipped (the factory
    passes nonexistent args.ae_hidden, utils.py:293; the encoder requires a
    ``mask`` argument never provided, layers.py:1251 vs vit.py:521-534; the
    Autoencoder is built with the wrong arity, layers.py:1207).  All three
    crashes are construction-time glue with unambiguous repairs (``mask`` is
    never used; ``nnmf=False`` is the only meaningful arity fix), so this
    module IS trajectory-parity-tested against the repaired reference —
    tests/test_trajectory_parity.py::test_ae_baseline_trajectory_matches_reference.
    """

    features: int
    seq_len: int
    ffn_features: int
    ae_hidden_features: int = 128
    dropout: float = 0.0  # unused (parity)
    save_attn_map: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.ffn_features % 2 == 0
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        z1, z2 = jnp.split(h, 2, axis=-1)
        z2 = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm1")(z2)
        z2 = z2.astype(jnp.float32)

        ae = Autoencoder(
            input_size=self.ffn_features // 2,
            hidden_size=self.ae_hidden_features,
            dtype=jnp.float32,
            name="AE",
        )
        # no detach here (the "baseline" difference); same structured
        # collapse as the fast path since the AE is feature-dim
        ae_out = ae(z2, deterministic=deterministic)[0]
        norm2 = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name="norm2")
        zero_in = jnp.zeros((1, 1, z2.shape[-1]), z2.dtype)
        ae0 = norm2(ae(zero_in, deterministic=deterministic)[0])
        diag = jnp.sum(norm2(ae_out) * z2, axis=-1)
        off = jnp.einsum("bjf,f->bj", z2, ae0[0, 0])
        T = z2.shape[1]
        eye = jnp.eye(T, dtype=z2.dtype)
        dist = off[:, None, :] + eye[None] * (diag - off)[:, None, :]

        attn_map = jax.nn.softmax(dist, axis=-1)  # NOT detached (baseline)
        if self.save_attn_map:
            self.sow("intermediates", "attn_map", attn_map)
        attn = jnp.einsum("bij,bjf->bif", attn_map.astype(self.dtype), z1)
        return TorchLinear(self.features, dtype=self.dtype, name="V")(attn)
