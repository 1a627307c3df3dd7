"""Generic MLP / conv-stack builders.

Reference: ``ANN`` and ``CNN`` (layers.py:1300-1350) — used by BaselineCNN
(cnn.py:6-29).  The reference BaselineCNN is broken as shipped (undefined
``ClassifierBase`` and ``calculate_last_layer_size``, cnn.py:13,17); the
working equivalent lives in models/cnn.py and simply flattens at runtime
instead of precomputing the flattened size.
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from .init import TorchConv, TorchLinear
from .norm import TorchBatchNorm

Dtype = Any


class ANN(nn.Module):
    """Linear(+BN)+ReLU(+Dropout) stack (layers.py:1300-1316).

    Note the trailing activation after the LAST layer too — the reference
    appends activation for every layer including the final one.
    """

    layers: Sequence[int]
    dropout: float = 0.0
    batchnorm: bool = False
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        for i, feats in enumerate(self.layers[1:]):
            x = TorchLinear(feats, dtype=self.dtype, name=f"fc{i}")(x)
            if self.batchnorm:
                x = TorchBatchNorm(
                    epsilon=1e-5, momentum=0.9, dtype=self.dtype,
                    use_running_average=deterministic, name=f"bn{i}",
                )(x)
            x = nn.relu(x)
            if self.dropout:
                x = nn.Dropout(self.dropout)(x, deterministic=deterministic)
        return x


class CNN(nn.Module):
    """Conv(+BN)+ReLU(+MaxPool 2x2) stack (layers.py:1319-1350), NHWC.

    torch Conv2d default: stride 1, no padding ('VALID').
    """

    features: Sequence[int]
    kernel_size: int | Sequence[int] = 3
    batchnorm: bool = True
    pooling: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        ks = self.kernel_size
        if isinstance(ks, int):
            ks = [ks] * (len(self.features) - 1)
        assert len(ks) == len(self.features) - 1
        for i, feats in enumerate(self.features[1:]):
            x = TorchConv(
                feats, (ks[i], ks[i]), padding="VALID", dtype=self.dtype,
                name=f"conv{i}",
            )(x)
            if self.batchnorm:
                x = TorchBatchNorm(
                    epsilon=1e-5, momentum=0.9, dtype=self.dtype,
                    use_running_average=deterministic, name=f"bn{i}",
                )(x)
            x = nn.relu(x)
            if self.pooling:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x
