"""Torch-parity BatchNorm.

The reference's BatchNorm sites (torch ``nn.BatchNorm1d/2d``: layers.py:611,
681, 751-752, 1307, 1342; the hamburger bread's SynchronizedBatchNorm,
bread.py:17-50) all follow torch ``_BatchNorm`` semantics: normalize with the
*biased* batch variance during training but store the *unbiased* variance in
``running_var``.  flax ``nn.BatchNorm`` stores the biased variance instead, so
eval-time outputs drift from the reference by a factor ``n/(n-1)`` inside the
rsqrt.  ``TorchBatchNorm`` is a drop-in flax replacement with the torch rule
(verified step-for-step against torch in tests/test_norm.py).

Conventions match flax: ``momentum`` is the running-average decay
(``ra = momentum * ra + (1 - momentum) * stat``), i.e. flax momentum 0.9 ==
torch momentum 0.1; the feature axis is the LAST axis (NHWC / (B, C)); state
lives in the ``batch_stats`` collection as ``mean``/``var``.

torch detail preserved: calling the same module twice in one forward (the
reference shares one BN across x and cls_token, layers.py:617-623) updates the
running stats twice, sequentially, in call order — flax variables are mutable
within a single apply, so this falls out naturally.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

Dtype = Any


class TorchBatchNorm(nn.Module):
    """BatchNorm with torch running-stat semantics (unbiased running_var).

    Normalizes over all axes but the last.  In training mode uses the biased
    batch variance for normalization (two-pass, as torch's kernels do) and
    folds the unbiased variance into ``running_var``; in eval mode
    (``use_running_average=True``) uses the stored running stats.
    """

    use_running_average: Optional[bool] = None
    momentum: float = 0.9
    epsilon: float = 1e-5
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, use_running_average: Optional[bool] = None):
        use_ra = nn.merge_param(
            "use_running_average", self.use_running_average, use_running_average
        )
        feats = x.shape[-1]
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((feats,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((feats,), jnp.float32)
        )
        scale = self.param("scale", nn.initializers.ones, (feats,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (feats,), jnp.float32)

        xf = x.astype(jnp.float32)
        if use_ra:
            mean, var = ra_mean.value, ra_var.value
        else:
            reduce_axes = tuple(range(x.ndim - 1))
            mean = jnp.mean(xf, axis=reduce_axes)
            var = jnp.mean(jnp.square(xf - mean), axis=reduce_axes)
            if not self.is_initializing():
                n = x.size // feats
                if n <= 1:
                    # torch raises "Expected more than 1 value per channel when
                    # training" (_BatchNorm._check_input_dim path) and the
                    # reference's sync_bn asserts input.size(1) > 1
                    # (sync_batchnorm.py) — silently storing a zero-variance
                    # running update would let a misconfigured batch train
                    # quietly instead of failing like the reference.
                    raise ValueError(
                        "TorchBatchNorm: expected more than 1 value per channel "
                        f"when training, got input size {x.shape}"
                    )
                unbiased = var * (n / (n - 1))
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
                ra_var.value = m * ra_var.value + (1.0 - m) * unbiased

        y = (xf - mean) * jax.lax.rsqrt(var + self.epsilon)
        y = y * scale + bias
        return y.astype(self.dtype)
