"""Parameter initializers matching the reference's (torch) defaults.

The reference never sets custom inits on its Linears, so everything uses
torch's ``nn.Linear`` default: kernel and bias ~ U(-1/sqrt(fan_in),
1/sqrt(fan_in)) (kaiming-uniform with a=sqrt(5) reduces to exactly this for
linear layers).  cls token / position embeddings are standard-normal
(vit.py:45-48).  Matching the init distribution matters for reproducing the
reference's training recipe, so we provide them here instead of flax defaults.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """U(-1/sqrt(fan_in), 1/sqrt(fan_in)); flax kernel shape is (fan_in, fan_out)."""
    fan_in = shape[0]
    bound = 1.0 / (fan_in**0.5)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class TorchLinear(nn.Module):
    """nn.Dense with torch nn.Linear's default init for kernel AND bias."""

    features: int
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        fan_in = x.shape[-1]
        bound = 1.0 / (fan_in**0.5)
        kernel = self.param(
            "kernel", torch_linear_kernel, (fan_in, self.features), jnp.float32
        )
        y = jnp.dot(x.astype(self.dtype), kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param(
                "bias", uniform_range(-bound, bound), (self.features,), jnp.float32
            )
            y = y + bias.astype(self.dtype)
        return y


class TorchConv(nn.Module):
    """nn.Conv with torch nn.Conv2d's default init (NHWC).

    torch's kaiming_uniform(a=sqrt(5)) on convs reduces to
    U(-1/sqrt(fan_in), 1/sqrt(fan_in)) with fan_in = in_c * prod(kernel).
    """

    features: int
    kernel_size: tuple[int, int] = (1, 1)
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    use_bias: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        in_c = x.shape[-1]
        fan_in = in_c * self.kernel_size[0] * self.kernel_size[1]
        bound = 1.0 / (fan_in**0.5)
        return nn.Conv(
            self.features,
            kernel_size=self.kernel_size,
            strides=self.strides,
            padding=self.padding,
            use_bias=self.use_bias,
            dtype=self.dtype,
            kernel_init=uniform_range(-bound, bound),
            bias_init=uniform_range(-bound, bound),
        )(x)


def normal(std: float = 1.0):
    def init(key, shape, dtype=jnp.float32):
        return std * jax.random.normal(key, shape, dtype)

    return init


def uniform_range(lo: float, hi: float):
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, lo, hi)

    return init
