"""Autoencoder zoo used by the AE-attention family.

Reference: autoencoders.py.  Each AE returns ``(reconstruction, hidden)``
explicitly instead of stashing ``hidden_activity`` on the module
(autoencoders.py:56-60) — the functional replacement for stored-attribute
mutation under jit.

Variants:
  * Autoencoder   — feature-dim MLP AE (autoencoders.py:40-60)
  * AutoencoderT  — runs over the sequence dim via transpose (:63-79)
  * AutoencoderH  — head-aware reshape AE over the (n*h) dim, 3D/4D (:82-125)
  * Autoencoder2D — seq+feature enc/dec with order codes fsfs/sffs/sfsf (:128-194)
  * AutoNNMF      — AutoNNMFLayer as a drop-in AE for 3D/4D inputs (:197-232)

Each building block is ``linear()`` (autoencoders.py:21-37): Linear+ReLU
+Dropout, or NNMFLinear+Dropout when NNMF is enabled (--use-nnmf-layers).
Dropout is always 0 in the model zoo (the factory default); kept for parity.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import flax.linen as nn
import jax.numpy as jnp

from .init import TorchLinear
from .nnmf.layers import AutoNNMFLayer, NNMFLinear

Dtype = Any


class NNMFParams(NamedTuple):
    """The _nnmf_params dict (network.py:19-33) as a hashable config."""

    number_of_iterations: int = 7
    w_trainable: bool = False
    local_learning: bool = False
    keep_last_grad_scale: bool = False
    disable_scale_grade: bool = True


class DenseBlock(nn.Module):
    """autoencoders.linear(): Linear->ReLU->Dropout, or NNMFLinear->Dropout."""

    features: int
    nnmf: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.nnmf:
            lead = x.shape[:-1]
            flat = x.reshape(-1, x.shape[-1])
            p = self.nnmf_params
            out = NNMFLinear(
                number_of_input_neurons=x.shape[-1],
                number_of_neurons=self.features,
                number_of_iterations=p.number_of_iterations,
                w_trainable=p.w_trainable,
                local_learning=p.local_learning,
                keep_last_grad_scale=p.keep_last_grad_scale,
                disable_scale_grade=p.disable_scale_grade,
                dtype=self.dtype,
                name="nnmf",
            )(flat, deterministic=deterministic)
            out = out.reshape(lead + (self.features,))
        else:
            out = nn.relu(TorchLinear(self.features, dtype=self.dtype, name="fc")(x))
        return nn.Dropout(self.dropout)(out, deterministic=deterministic)


class Autoencoder(nn.Module):
    input_size: int
    hidden_size: int
    nnmf: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(nnmf=self.nnmf, nnmf_params=self.nnmf_params,
                  dropout=self.dropout, dtype=self.dtype)
        h = DenseBlock(self.hidden_size, name="encoder", **kw)(
            x, deterministic=deterministic
        )
        out = DenseBlock(self.input_size, name="decoder", **kw)(
            h, deterministic=deterministic
        )
        return out, h


class AutoencoderT(nn.Module):
    """AE over the second-to-last (sequence) dim (autoencoders.py:63-79)."""

    seq_len: int
    hidden_size: int
    nnmf: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(nnmf=self.nnmf, nnmf_params=self.nnmf_params,
                  dropout=self.dropout, dtype=self.dtype)
        xt = jnp.swapaxes(x, -1, -2)
        h = DenseBlock(self.hidden_size, name="encoder", **kw)(
            xt, deterministic=deterministic
        )
        out = DenseBlock(self.seq_len, name="decoder", **kw)(
            h, deterministic=deterministic
        )
        return jnp.swapaxes(out, -1, -2), h


class AutoencoderH(nn.Module):
    """Head-aware AE over the (n*h) dim; 3D and 4D inputs (autoencoders.py:82-125)."""

    input_size: int  # seq_len * heads
    hidden_size: int
    heads: int
    nnmf: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(nnmf=self.nnmf, nnmf_params=self.nnmf_params,
                  dropout=self.dropout, dtype=self.dtype)
        enc = DenseBlock(self.hidden_size, name="encoder", **kw)
        dec = DenseBlock(self.input_size, name="decoder", **kw)
        if x.ndim == 3:
            b, n, f = x.shape
            y = x.reshape(b, n, self.heads, f // self.heads)
            y = y.reshape(b, n * self.heads, -1)
            y = jnp.swapaxes(y, -1, -2)  # (b, f/h, n*h)
            h = enc(y, deterministic=deterministic)
            y = dec(h, deterministic=deterministic)
            y = jnp.swapaxes(y, -1, -2)
            y = y.reshape(b, n, self.heads, -1).reshape(b, n, f)
        elif x.ndim == 4:
            b, n, n2, f = x.shape
            y = x.reshape(b, n, n2, self.heads, -1)
            y = y.reshape(b, n, n2 * self.heads, y.shape[-1])
            y = jnp.swapaxes(y, -1, -2)  # (b, n, f/h, n*h)
            h = enc(y, deterministic=deterministic)
            y = dec(h, deterministic=deterministic)
            y = jnp.swapaxes(y, -1, -2)
            y = y.reshape(b, n, n2, self.heads, -1).reshape(b, n, n2, f)
        else:
            raise NotImplementedError
        return y, h


class Autoencoder2D(nn.Module):
    """Seq- and feature-dim enc/dec, order fsfs/sffs/sfsf (autoencoders.py:128-194)."""

    order: str
    seq: int
    features: int
    seq_hidden: int
    features_hidden: int
    nnmf: bool = False
    nnmf_params: NNMFParams = NNMFParams()
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        kw = dict(nnmf=self.nnmf, nnmf_params=self.nnmf_params,
                  dropout=self.dropout, dtype=self.dtype)
        enc_f = DenseBlock(self.features_hidden, name="enc_features", **kw)
        enc_s = DenseBlock(self.seq_hidden, name="enc_seq", **kw)
        dec_f = DenseBlock(self.features, name="dec_features", **kw)
        dec_s = DenseBlock(self.seq, name="dec_seq", **kw)
        d = dict(deterministic=deterministic)
        T = lambda a: jnp.swapaxes(a, -1, -2)

        if self.order == "fsfs":
            x = enc_f(x, **d)
            x = enc_s(T(x), **d)
            h = x
            x = dec_f(T(x), **d)
            x = T(dec_s(T(x), **d))
        elif self.order == "sffs":
            x = T(enc_s(T(x), **d))
            x = enc_f(x, **d)
            h = x
            x = dec_f(x, **d)
            x = T(dec_s(T(x), **d))
        elif self.order == "sfsf":
            x = T(enc_s(T(x), **d))
            x = enc_f(x, **d)
            h = x
            x = T(dec_s(T(x), **d))
            x = dec_f(x, **d)
        else:
            raise NotImplementedError(self.order)
        return x, h


class AutoNNMF(nn.Module):
    """AutoNNMFLayer as a drop-in AE (autoencoders.py:197-232)."""

    input_size: tuple[int, int]
    hidden_size: int
    number_of_iterations: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        layer = AutoNNMFLayer(
            number_of_input_neurons=1,
            number_of_neurons=self.hidden_size,
            input_size=tuple(self.input_size),
            forward_kernel_size=(self.input_size[0], 1),
            number_of_iterations=self.number_of_iterations,
            w_trainable=True,
            dtype=self.dtype,
            name="autoencoder",
        )
        if x.ndim == 3:
            out = layer(x[:, None], deterministic=deterministic)[:, 0]
        elif x.ndim == 4:
            B, T1, T2, F = x.shape
            out = layer(
                x.reshape(B * T1, 1, T2, F), deterministic=deterministic
            )[:, 0].reshape(B, T1, T2, F)
        else:
            raise NotImplementedError
        return out, None
