"""GatedNNMF mixer: a gMLP-shaped gate whose spatial mixing is NNMF.

Reference: layers.py:349-458.  Shape: lift with U + GELU, chunk into (z1, z2),
``z2 = relu(LayerNorm(z2))`` (NNMF inputs must be non-negative), denoise z2
with one of three NNMF backends, gate ``z1 * z2``, project back with V.

Backends (dispatched from the CLI model name, utils.py:150):
  * ``ham``   -> NMF2D multiplicative updates with TRAIN_STEPS = EVAL_STEPS =
                 --md-iter and RAND_INIT = not --train-md-bases
                 (layers.py:371-380); input viewed with tokens as channels
                 (``z2.unsqueeze(-1)``, layers.py:449).
  * ``sbs``   -> NNMFConv2d, the custom column-stochastic NNMF layer with the
                 hand-derived backward (layers.py:383-400).
  * ``sbsed`` -> AutoNNMFLayer, the NNMF encoder/decoder (layers.py:424-441).
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from .hamburger import MatrixDecomposition2D
from .init import TorchLinear

Dtype = Any


class GatedNNMF(nn.Module):
    features: int
    ffn_features: int
    seq_len: int
    nnmf_type: str = "ham"  # ham | sbs | sbsed
    md_iter: int = 7
    depthwise: bool = False
    train_bases: bool = False
    local_learning: bool = False
    dropout: float = 0.0  # unused (parity: GatedNNMF has no dropout)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert self.ffn_features % 2 == 0
        h = TorchLinear(self.ffn_features, dtype=self.dtype, name="U")(x)
        h = nn.gelu(h, approximate=False)
        z1, z2 = jnp.split(h, 2, axis=-1)
        z2 = nn.relu(nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="norm")(z2))

        if self.nnmf_type == "ham":
            # (B,T,ffn/2) -> NCHW (B, C=T, H=ffn/2, W=1) -> NHWC (B, ffn/2, 1, T)
            img = z2.transpose(0, 2, 1)[:, :, None, :]
            out = MatrixDecomposition2D(
                ham_type="NMF",
                spatial=not self.depthwise,
                train_steps=self.md_iter,
                eval_steps=self.md_iter,
                rand_init=not self.train_bases,
                dtype=self.dtype,
                name="NNMF",
            )(img, deterministic=deterministic)
            z2 = out[:, :, 0, :].transpose(0, 2, 1)
        elif self.nnmf_type == "sbs":
            from .nnmf.layers import NNMFConv2d

            if self.depthwise:
                # layers.py:387-388 raises; don't silently train non-depthwise
                raise NotImplementedError(
                    "depthwise is not implemented for the sbs NNMF backend"
                )

            # layers.py:383-400: 1 input channel, seq_len output channels,
            # kernel (seq_len, 1) over the (T, ffn/2) "image"
            z2 = NNMFConv2d(
                number_of_input_neurons=1,
                number_of_neurons=self.seq_len,
                input_size=(self.seq_len, self.ffn_features // 2),
                forward_kernel_size=(self.seq_len, 1),
                number_of_iterations=self.md_iter,
                w_trainable=self.train_bases,
                local_learning=self.local_learning,
                # hardcoded in the reference (layers.py:399-400); the gradient
                # max-normalization is what keeps trainable NNMF from blowing
                # up (without it, params go NaN within ~50 steps)
                keep_last_grad_scale=True,
                disable_scale_grade=False,
                dtype=self.dtype,
                name="NNMF",
            )(z2[:, None, :, :], deterministic=deterministic)
            # (B, T_out=1? ...) reference squeezes dim -2; our layer returns
            # (B, C_out, H_out, W_out)-equivalent — see nnmf/layers.py
            z2 = z2.squeeze(-2)
        elif self.nnmf_type == "sbsed":
            from .nnmf.layers import AutoNNMFLayer

            if self.depthwise:
                # layers.py:427-428 raises; don't silently train non-depthwise
                raise NotImplementedError(
                    "depthwise is not implemented for the sbsed NNMF backend"
                )

            z2 = AutoNNMFLayer(
                number_of_input_neurons=1,
                number_of_neurons=128,
                input_size=(self.seq_len, self.ffn_features // 2),
                forward_kernel_size=(self.seq_len, self.ffn_features // 2),
                number_of_iterations=self.md_iter,
                w_trainable=self.train_bases,
                local_learning=self.local_learning,
                keep_last_grad_scale=True,  # layers.py:439-440
                disable_scale_grade=False,
                dtype=self.dtype,
                name="NNMF",
            )(z2[:, None, :, :], deterministic=deterministic)
            z2 = z2.squeeze(1)
        else:
            raise NotImplementedError(f"NNMF type {self.nnmf_type} not implemented")

        return TorchLinear(self.features, dtype=self.dtype, name="V")(z1 * z2)
