"""NNMF layers as flax modules.

Reference: nnmf/NNMFLayerSbSBP.py:8-309 (NNMFConv2d),
nnmf/AutoNNMFLayer.py:5-331 (AutoNNMFLayer), nnmf/NNMFLinear.py (NNMFLinear),
nnmf/NNMFLayerSbSBP.py:523-551 (NNMFEncoderDecoder).

Design notes:
  * All NNMF weights are stored as a param literally named ``nnmf_weights``
    with shape (C, M), column-stochastic over C.  The name is the routing key:
    the Madam optimizer's nnmf param group (network.py:90-96) and the
    post-step "after care" (norm -> clamp -> norm, network.py:380-386) both
    select parameters by name containing 'nnmf'/'_weights'; see
    train/optim.py and train/steps.py.  (The torch NNMFLinear stores (M, C)
    row-stochastic; we store the transpose so every NNMF weight normalizes
    over axis 0 — same math.)
  * The stateful counters of the torch layers disappear:
    ``_number_of_grad_weight_contributions`` is folded into the custom VJP
    (see functional.py) and ``_last_grad_scale`` is dead state in the
    reference (after_batch never called).
  * Inputs are L1-normalized over the patch axis before the iterate
    (NNMFLayerSbSBP.py:275-277), weights kept column-stochastic by init and
    by the after-care transform.
  * NNMF math runs in fp32 regardless of the compute dtype — the
    multiplicative ratios are precision-sensitive.
  * CUDA hard-coding in the reference (device=torch.device("cuda"),
    layers.py:397) is simply gone: JAX arrays live wherever jit puts them.
"""

from __future__ import annotations

from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp

from .functional import conv_output_size, make_nnmf_op, unfold

Dtype = Any


def column_stochastic_uniform(lo: float = 0.0, hi: float = 1.0):
    """uniform(lo, hi) then column-normalize (weights setter, SbSBP.py:139-155)."""

    def init(key, shape, dtype=jnp.float32):
        w = jax.random.uniform(key, shape, dtype, lo, hi)
        return w / w.sum(axis=0, keepdims=True)

    return init


class NNMFConv2d(nn.Module):
    """Column-stochastic NNMF conv layer (NNMFLayerSbSBP.py:8-309).

    Input (B, C_in, H, W) NCHW (matches the reference call sites);
    output (B, M, H', W') with h clamped to ±10 (SbSBP.py:361).
    """

    number_of_input_neurons: int
    number_of_neurons: int
    input_size: tuple[int, int]
    forward_kernel_size: tuple[int, int]
    number_of_iterations: int
    epsilon_0: float = 1.0
    weight_noise_range: tuple[float, float] = (0.0, 1.0)
    strides: tuple[int, int] = (1, 1)
    padding: tuple[int, int] = (0, 0)
    w_trainable: bool = False
    local_learning: bool = False
    output_layer: bool = False
    keep_last_grad_scale: bool = False
    disable_scale_grade: bool = True
    dtype: Dtype = jnp.float32

    def _weights(self):
        kh, kw = self.forward_kernel_size
        C = kh * kw * self.number_of_input_neurons
        return self.param(
            "nnmf_weights",
            column_stochastic_uniform(*self.weight_noise_range),
            (C, self.number_of_neurons),
            jnp.float32,
        )

    def _iterate(self, x, *, eps: float, clamp_grad: bool):
        """Shared unfold -> normalize -> custom-VJP iterate."""
        B = x.shape[0]
        assert x.shape[1] == self.number_of_input_neurons
        assert x.shape[2:] == tuple(self.input_size)
        w = self._weights()

        x = x.astype(jnp.float32)
        patches = unfold(x, self.forward_kernel_size, self.strides, self.padding)
        _, C, Hp, Wp = patches.shape
        inp = patches.reshape(B, C, Hp * Wp)
        inp = inp / (inp.sum(axis=1, keepdims=True) + 1e-20)

        op = make_nnmf_op(
            iterations=self.number_of_iterations,
            eps0=self.epsilon_0,
            eps=eps,
            local_learning=self.local_learning,
            output_layer=self.output_layer,
            w_trainable=self.w_trainable,
            scale_grad=not self.disable_scale_grade,
            clamp_grad=clamp_grad,
        )
        h = op(inp, w)  # (B, M, P)
        return h, inp, w, (Hp, Wp)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h, _, _, (Hp, Wp) = self._iterate(x, eps=1e-20, clamp_grad=True)
        h = jnp.clip(h, -10.0, 10.0)  # SbSBP.py:361
        out = h.reshape(x.shape[0], self.number_of_neurons, Hp, Wp)
        return out.astype(self.dtype)


class AutoNNMFLayer(NNMFConv2d):
    """NNMF autoencoder layer (AutoNNMFLayer.py:5-331): encode with the
    custom-VJP iterate (eps 1e-5, no clamps), decode with DETACHED weights,
    fold back to the input size.  Stores ``hidden_activity`` via sow
    (AutoNNMFLayer.py:304)."""

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h, _, w, (Hp, Wp) = self._iterate(x, eps=1e-5, clamp_grad=False)
        B = x.shape[0]
        self.sow(
            "intermediates", "hidden_activity",
            jax.lax.stop_gradient(h.reshape(B, self.number_of_neurons, Hp, Wp)),
        )

        # decode: sum_m h[m] * W_detached[c,m]  (AutoNNMFLayer.py:310-329)
        wd = jax.lax.stop_gradient(w)
        decoded = jnp.einsum("cm,bmp->bcp", wd, h)  # (B, C, P)

        out = self._decode_fold(decoded, B, (Hp, Wp))
        return out.astype(self.dtype)

    def _decode_fold(self, decoded, B, hw):
        """Fold the decoded patches back to the input size
        (``F.fold``, AutoNNMFLayer.py:315-329).

        The two framings the model zoo exercises reduce to reshapes
        (stride 1, no padding, non-overlapping):
          * kernel == input_size: one patch covering everything (P == 1)
          * kernel == (H, 1) column kernel with 1 input channel: P == W
        The general overlapping case goes through :func:`fold` (the exact
        adjoint of unfold — summing overlapping patches).
        """
        from .functional import fold

        kh, kw = self.forward_kernel_size
        H, W = self.input_size
        if (kh, kw) == (H, W):
            return decoded.reshape(B, self.number_of_input_neurons, H, W)
        if (kh, kw) == (H, 1) and self.number_of_input_neurons == 1 and tuple(
            self.strides
        ) == (1, 1):
            # decoded: (B, C=H, P=W) -> (B, 1, H, W)
            return decoded.reshape(B, 1, H, W)
        Hp, Wp = hw
        return fold(
            decoded.reshape(B, -1, Hp, Wp),
            self.input_size,
            self.forward_kernel_size,
            self.strides,
            self.padding,
        )


class NNMFEncoderDecoder(NNMFConv2d):
    """NNMFLayerSbSBP.py:523-551 — encoder + detached-weight decoder, with the
    SbS-style clamps on the encoder output."""

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        h, _, w, (Hp, Wp) = self._iterate(x, eps=1e-20, clamp_grad=True)
        h = jnp.clip(h, -10.0, 10.0)
        B = x.shape[0]
        wd = jax.lax.stop_gradient(w)
        if tuple(self.forward_kernel_size) == tuple(self.input_size):
            decoded = jnp.einsum("bmp,cm->bcp", h, wd)
            out = decoded.reshape(B, self.number_of_input_neurons, *self.input_size)
        else:
            # conv_transpose2d decode (NNMFLayerSbSBP.py:528-547) ==
            # fold(sum_m h[m] * W[:, m]) — same math as the Auto decode
            from .functional import fold

            decoded = jnp.einsum("cm,bmp->bcp", wd, h)
            out = fold(
                decoded.reshape(B, -1, Hp, Wp),
                self.input_size,
                self.forward_kernel_size,
                self.strides,
                self.padding,
            )
        return out.astype(self.dtype)


class NNMFLinear(nn.Module):
    """2D-input NNMF layer (nnmf/NNMFLinear.py).

    The torch layer stores weights (M, C) row-stochastic over C
    (NNMFLinear.py:118); we store the transpose (C, M) so all NNMF weights
    share one normalization axis.  Math is identical.
    """

    number_of_input_neurons: int
    number_of_neurons: int
    number_of_iterations: int
    epsilon_0: float = 1.0
    weight_noise_range: tuple[float, float] = (0.0, 1.0)
    w_trainable: bool = False
    local_learning: bool = False
    output_layer: bool = False
    keep_last_grad_scale: bool = False
    disable_scale_grade: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        assert x.ndim == 2
        assert x.shape[1] == self.number_of_input_neurons
        w = self.param(
            "nnmf_weights",
            column_stochastic_uniform(*self.weight_noise_range),
            (self.number_of_input_neurons, self.number_of_neurons),
            jnp.float32,
        )
        x = x.astype(jnp.float32)
        inp = x / (x.sum(axis=1, keepdims=True) + 1e-20)
        op = make_nnmf_op(
            iterations=self.number_of_iterations,
            eps0=self.epsilon_0,
            eps=1e-20,
            local_learning=self.local_learning,
            output_layer=self.output_layer,
            w_trainable=self.w_trainable,
            scale_grad=not self.disable_scale_grade,
            clamp_grad=False,  # the linear variant does not clamp
        )
        h = op(inp[:, :, None], w)[:, :, 0]  # (B, M)
        return h.astype(self.dtype)


def nnmf_weight_trainable(names: list, train_md_bases: bool) -> bool:
    """Effective ``w_trainable`` for a ``nnmf_weights`` leaf at path ``names``.

    The heads-NNMF AE layer is built ``w_trainable=True`` UNCONDITIONALLY
    (reference layers.py:941) — in our tree its weight sits directly under the
    ``AE`` module name.  Every other NNMF layer follows ``--train-md-bases``
    via the shared ``_nnmf_params`` dict (network.py:23).
    """
    if "AE" in names:
        rest = names[names.index("AE") + 1 :]
        if rest == ["nnmf_weights"]:
            return True
    return train_md_bases


def _after_care_divisor(names: list, p) -> int:
    """The reference clamps at ``threshold / layer._number_of_input_neurons``
    (network.py:381-386).  Every conv-style NNMF layer in the zoo has
    number_of_input_neurons=1 (layers.py:390,428,941); NNMFLinear (only built
    inside AE DenseBlocks, module name 'nnmf') has number_of_input_neurons ==
    its input width == our weight's axis-0 size (NNMFLinear.py:56)."""
    if len(names) >= 2 and names[-2] == "nnmf":
        return p.shape[0]
    return 1


def nnmf_after_care(params, threshold: float, trainable_fn=None):
    """The post-optimizer-step weight care (network.py:380-386 +
    NNMFLayerSbSBP.py:181-213): for every param named ``nnmf_weights`` whose
    layer is effectively trainable, column-normalize, clamp to
    ``>= threshold / number_of_input_neurons``, and normalize again.  Other
    params pass through untouched.

    ``trainable_fn(names) -> bool`` reproduces the per-layer ``_w_trainable``
    gate inside ``update_after_care`` (NNMFLayerSbSBP.py:181-185) — the
    reference calls after-care on EVERY discovered NNMF module every batch
    and each layer self-gates.  ``None`` treats every NNMF weight as
    trainable (the AE-internal optimizer path, where the whole subtree is the
    always-trainable heads AE).
    """

    def care(path, p):
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if names and names[-1] == "nnmf_weights":
            if trainable_fn is not None and not trainable_fn(names):
                return p
            thr = threshold / _after_care_divisor(names, p)
            p = p / p.sum(axis=0, keepdims=True)
            p = jnp.clip(p, min=thr)
            p = p / p.sum(axis=0, keepdims=True)
        return p

    return jax.tree_util.tree_map_with_path(care, params)


def has_nnmf_weights(params, trainable_fn=None) -> bool:
    """True when any ``nnmf_weights`` leaf exists (optionally: any that
    ``trainable_fn`` accepts)."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, _ in flat:
        names = [getattr(k, "key", getattr(k, "name", "")) for k in path]
        if names and names[-1] == "nnmf_weights":
            if trainable_fn is None or trainable_fn(names):
                return True
    return False
