"""Local-Global CNN models (lgcnn / wlgcnn) and the baseline CNN.

Reference: cnn.py (LocalGlobalCNN, cnn.py:32-109; broken BaselineCNN,
cnn.py:6-29) and layers.py:572-810 (LocalGlobalConvolution, the Weight variant,
and their encoder).

Semantics preserved (redesigned NHWC — the native TPU conv layout — instead of
the reference's NCHW):
  * conv patch embedding: Conv(in_c -> n_channels, kernel=stride=patch_size)
    (cnn.py:69)
  * a 2D cls "token" image of shape (k, k, C) threaded as an (x, cls) tuple
    through the encoder stack (cnn.py:62-66, 100-103)
  * encoder: norm -> local-global convolution -> residual, then a conv MLP
    with the trailing-GELU quirk, applied to x and cls with SHARED weights
    (layers.py:755-810); norm is LayerNorm over channels (the reference's
    Transpose shim) or BatchNorm2d
  * LocalGlobalConvolution (layers.py:613-640): conv-in + GELU, chunk the
    channels, norm z2, one global Linear over the flattened patches with the
    cls patch concatenated, gate z1*z2, conv-out.  The same conv-in/out and
    norm modules process the cls token (shared weights, as in the reference).
  * WeightLocalGlobalConvolution (layers.py:644-719): the global transform
    emits a per-sample (C/2, C/2) mixing matrix applied with an einsum; note
    this requires n_channels == hidden_features/2 (true for the reference
    defaults: hidden 384, ffn 768).  With normalization="batch_norm" the
    reference crashes as shipped (BatchNorm2d on the 3D (B, C/2, p^2+k^2)
    tensor, layers.py:681,699 — _check_input_dim raises); our channel-norm
    handles it, a working equivalent.
  * batch_norm uses TorchBatchNorm (ops/norm.py) — torch running-stat
    semantics (unbiased running_var), with the reference's shared-module
    double update (x then cls through ONE BN per site); trajectory-parity
    tested end-to-end incl. running stats + eval logits
    (tests/test_trajectory_parity.py).
  * head: LayerNorm + Linear on the flattened cls token (cnn.py:86-91)
  * no-cls-token raises (cnn.py:52-54, 92-95)

``BaselineCNN`` is the working equivalent of the reference's crashing
cnn_baseline (undefined ``ClassifierBase`` / ``calculate_last_layer_size``,
cnn.py:13,17): CNN([3, 32]) feature stack + ANN([flat, 1024, 10]) classifier
with the flattened size computed at trace time instead of by the missing
helper.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax.numpy as jnp

from ..ops.basic import ANN, CNN
from ..ops.init import TorchConv, TorchLinear, normal
from ..ops.norm import TorchBatchNorm

Dtype = Any


class _ChannelNorm(nn.Module):
    """The reference's norm-over-channels switch (layers.py:599-610).

    layer_norm: LN over the channel axis (NHWC: the last axis, so no
    Transpose shim is needed).  batch_norm: BatchNorm over channels.
    """

    normalization: str
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.normalization == "layer_norm":
            return nn.LayerNorm(epsilon=1e-5, dtype=self.dtype)(x)
        if self.normalization == "batch_norm":
            return TorchBatchNorm(
                epsilon=1e-5, momentum=0.9, dtype=self.dtype,
                use_running_average=deterministic,
            )(x)
        raise ValueError(f"normalization {self.normalization} not supported")


class LocalGlobalConvolution(nn.Module):
    """layers.py:572-640 on NHWC (x: (B,p,p,C), cls: (B,k,k,C))."""

    features: int  # n_channels
    hidden_features: int
    kernel_size: int = 1
    normalization: str = "layer_norm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls, *, deterministic: bool = True):
        k = self.kernel_size
        conv_in = TorchConv(
            self.hidden_features, (k, k), padding="SAME", dtype=self.dtype,
            name="local_conv_in",
        )
        conv_out = TorchConv(
            self.features, (k, k), padding="SAME", dtype=self.dtype,
            name="local_conv_out",
        )
        norm = _ChannelNorm(self.normalization, dtype=self.dtype, name="norm")
        B, p, _, _ = x.shape

        x = nn.gelu(conv_in(x), approximate=False)
        z1, z2 = jnp.split(x, 2, axis=-1)
        z2 = norm(z2, deterministic=deterministic)

        cls = nn.gelu(conv_in(cls), approximate=False)
        cls1, cls2 = jnp.split(cls, 2, axis=-1)
        cls2 = norm(cls2, deterministic=deterministic)

        C2 = self.hidden_features // 2
        # flatten(-2) on NCHW == (B, C, N); NHWC equivalent: (B, N, C) -> swap
        z2f = z2.reshape(B, p * p, C2).transpose(0, 2, 1)  # (B, C/2, p^2)
        cls2f = cls2.reshape(B, k * k, C2).transpose(0, 2, 1)  # (B, C/2, k^2)
        z2_cls2 = jnp.concatenate([z2f, cls2f], axis=-1)
        z2_cls2 = TorchLinear(
            p * p + k * k, dtype=self.dtype, name="global_transform"
        )(z2_cls2)
        z2 = z2_cls2[..., : p * p].transpose(0, 2, 1).reshape(B, p, p, C2)
        cls2 = z2_cls2[..., p * p :].transpose(0, 2, 1).reshape(B, k, k, C2)

        cls = conv_out(cls1 * cls2)
        x = conv_out(z1 * z2)
        return x, cls


class WeightLocalGlobalConvolution(nn.Module):
    """layers.py:644-719: data-dependent (C/2, C/2) channel-mixing matrix."""

    features: int
    hidden_features: int
    kernel_size: int = 1
    normalization: str = "layer_norm"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls, *, deterministic: bool = True):
        k = self.kernel_size
        conv_in = TorchConv(
            self.hidden_features, (k, k), padding="SAME", dtype=self.dtype,
            name="local_conv_in",
        )
        conv_out = TorchConv(
            self.features, (k, k), padding="SAME", dtype=self.dtype,
            name="local_conv_out",
        )
        B, p, _, _ = x.shape
        C2 = self.hidden_features // 2

        x = nn.gelu(conv_in(x), approximate=False)
        cls = nn.gelu(conv_in(cls), approximate=False)
        xf = x.reshape(B, p * p, self.hidden_features).transpose(0, 2, 1)
        clsf = cls.reshape(B, k * k, self.hidden_features).transpose(0, 2, 1)
        x_cls = jnp.concatenate([xf, clsf], axis=-1)  # (B, C, p^2+k^2)
        z1, z2 = jnp.split(x_cls, 2, axis=1)  # chunk channels (dim=1)
        # the reference's norm runs over the channel axis via Transpose
        z2 = _ChannelNorm(self.normalization, dtype=self.dtype, name="norm")(
            z2.transpose(0, 2, 1), deterministic=deterministic
        ).transpose(0, 2, 1)
        # (B, C/2, features): per-sample mixing matrix — requires
        # features == hidden_features/2 (layers.py:690, reference defaults)
        mix = TorchLinear(
            self.features, dtype=self.dtype, name="global_transform"
        )(z2)
        x_cls = jnp.einsum("bij,bjf->bif", mix, z1)  # (B, C/2, p^2+k^2)
        x = x_cls[..., : p * p].transpose(0, 2, 1).reshape(B, p, p, C2)
        cls = x_cls[..., p * p :].transpose(0, 2, 1).reshape(B, k, k, C2)
        return conv_out(x), conv_out(cls)


class _ConvMLP(nn.Module):
    """The encoder's conv MLP (layers.py:778-795) — note the trailing GELU."""

    mlp_hidden: int
    features: int
    kernel_size: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        k = self.kernel_size
        x = TorchConv(self.mlp_hidden, (k, k), padding="SAME", dtype=self.dtype,
                      name="c1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        x = TorchConv(self.features, (k, k), padding="SAME", dtype=self.dtype,
                      name="c2")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class LocalGlobalConvolutionEncoder(nn.Module):
    """layers.py:723-810: norm -> LGC -> residual (+ shared conv MLP)."""

    features: int
    hidden_features: int
    kernel_size: int
    mlp_hidden: int
    weight_gated: bool = False
    dropout: float = 0.0
    normalization: str = "layer_norm"
    use_mlp: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, cls, *, deterministic: bool = True):
        la1 = _ChannelNorm(self.normalization, dtype=self.dtype, name="la1")
        attn_cls = (
            WeightLocalGlobalConvolution if self.weight_gated
            else LocalGlobalConvolution
        )
        attn = attn_cls(
            features=self.features,
            hidden_features=self.hidden_features,
            kernel_size=self.kernel_size,
            normalization=self.normalization,
            dtype=self.dtype,
            name="attention",
        )
        hx, hcls = attn(
            la1(x, deterministic=deterministic),
            la1(cls, deterministic=deterministic),
            deterministic=deterministic,
        )
        x = x + hx
        cls = cls + hcls

        if self.use_mlp:
            la2 = _ChannelNorm(self.normalization, dtype=self.dtype, name="la2")
            mlp = _ConvMLP(
                mlp_hidden=self.mlp_hidden,
                features=self.features,
                kernel_size=self.kernel_size,
                dropout=self.dropout,
                dtype=self.dtype,
                name="mlp",
            )
            x = mlp(la2(x, deterministic=deterministic),
                    deterministic=deterministic) + x
            cls = mlp(la2(cls, deterministic=deterministic),
                      deterministic=deterministic) + cls
        return x, cls


class LocalGlobalCNN(nn.Module):
    """cnn.py:32-109."""

    weight_gated: bool = False
    num_layers: int = 1
    num_classes: int = 10
    n_channels: int = 384
    hidden_features: int = 768
    img_size: int = 32
    patch: int = 8
    kernel_size: int = 1
    use_cls_token: bool = True
    mlp_hidden: int = 384
    dropout: float = 0.0
    normalization: str = "layer_norm"
    use_mlp: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if not self.use_cls_token:
            raise NotImplementedError(
                "LocalGlobalCNN does not support not using cls token"
            )  # cnn.py:52-54
        assert self.hidden_features % 2 == 0
        ps = self.img_size // self.patch
        assert ps * self.patch == self.img_size
        k = self.kernel_size

        x = TorchConv(
            self.n_channels, (ps, ps), strides=(ps, ps), padding="VALID",
            dtype=self.dtype, name="emb",
        )(x.astype(self.dtype))  # (B, patch, patch, C)
        cls = self.param(
            "cls_token", normal(1.0), (k, k, self.n_channels)
        )  # 2D cls "token" (cnn.py:62-66); NHWC layout
        cls = jnp.broadcast_to(
            cls.astype(self.dtype)[None], (x.shape[0], k, k, self.n_channels)
        )

        for i in range(self.num_layers):
            x, cls = LocalGlobalConvolutionEncoder(
                features=self.n_channels,
                hidden_features=self.hidden_features,
                kernel_size=k,
                mlp_hidden=self.mlp_hidden,
                weight_gated=self.weight_gated,
                dropout=self.dropout,
                normalization=self.normalization,
                use_mlp=self.use_mlp,
                dtype=self.dtype,
                name=f"enc{i}",
            )(x, cls, deterministic=deterministic)

        out = cls.reshape(cls.shape[0], -1)  # flatten(1)
        out = nn.LayerNorm(epsilon=1e-5, dtype=self.dtype, name="fc_norm")(out)
        return TorchLinear(self.num_classes, dtype=self.dtype, name="fc")(out)


class BaselineCNN(nn.Module):
    """Working equivalent of cnn.py:6-29 (broken as shipped: undefined
    ``ClassifierBase`` and ``calculate_last_layer_size``, cnn.py:13,17).
    Factory args from utils.py:323-328: cnn_features=[32], ann_layers=[1024, 10].

    Reference design quirk, reproduced faithfully: ANN ReLU-clamps the final
    logits (layers.py:1308-1310), so training collapses to a permanent
    dead-logits fixed point at loss == ln(10) once all 10 pre-activations go
    negative — proven identical to the torch stack in
    tests/test_trajectory_parity.py (cnn_baseline trajectory + collapse).
    """

    num_classes: int = 10
    cnn_features: tuple = (32,)
    ann_hidden: tuple = (1024,)
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        in_c = x.shape[-1]
        x = CNN(
            features=(in_c,) + tuple(self.cnn_features), dtype=self.dtype,
            name="conv",
        )(x.astype(self.dtype), deterministic=deterministic)
        x = x.reshape(x.shape[0], -1)  # flattened size computed at trace time
        return ANN(
            layers=(x.shape[-1],) + tuple(self.ann_hidden) + (self.num_classes,),
            dtype=self.dtype,
            name="ann",
        )(x, deterministic=deterministic)
