"""The NNMF iterate with the reference's HAND-DERIVED backward as a custom VJP.

Reference: nnmf/NNMFLayerSbSBP.py:312-520 (NNMFFunctionalBP),
nnmf/AutoNNMFLayer.py:334-506 (FunctionalAutoNNMF),
nnmf/NNMFLinear.py:249-418 (FunctionalNNMFLinear).  All three share one math
core, unified here over (B, C, P) tensors (P = spatial positions; 1 for the
linear case).  Weights are (C, M), column-stochastic over C.

Forward (NNMFLayerSbSBP.py:343-361):
    h <- uniform 1/M
    repeat iterations:
        h_w[b,c,m] = h[m] * W[c,m] / (sum_m' h[m']W[c,m'] + eps)
        h_new[m]   = sum_c input[c] * h_w[b,c,m]
        h          = h + eps0 * h_new        (eps0 = 1.0 default)
        h          = h / (sum_m h + eps)
which collapses to two matmuls per iteration:
    R = W @ h;  h <- normalize(h + eps0 * h * (W^T @ (input / (R + eps))))
— exactly MXU-shaped.  eps is 1e-20 for the SbS/Linear variants and 1e-5 for
the Auto variant (AutoNNMFLayer.py:363-369).

Backward — deliberately NOT the true gradient of the forward; it is the
reference's reconstruction-ratio rule (NNMFLayerSbSBP.py:432-479):
    r[b,c,m] = W[c,m] * h_out[m];  R = sum_m r
    grad_input[c] = sum_m r[c,m] * g[m] / (R[c] + 1e-20)
    grad_W: local-learning rule  -2 * sum_{b,p} (input - R)[c] * h[m]
            or backprop rule     sum_{b,p} input[c] (R[c] g[m] - s[c]) h[m] / (R[c]^2+1e-20)
            with s[c] = sum_m r[c,m] g[m]
Gradient post-processing preserved:
  * optional scale normalization: g /= max(|g|).  (The reference's
    ``_last_grad_scale`` carry is dead code: ``after_batch`` — the only place
    the carried scale is written — is commented out in the harness
    (network.py:329-332), so the stored scale stays -1.0 and the max() always
    picks the current batch's |g|max.  We implement that actual behavior.)
  * grad clamps to ±5 for the SbS variant (NNMFLayerSbSBP.py:503-506)
  * grad_weights divided by the contribution count B*P — this IS
    ``update_pre_care`` (network.py:326-333): with one forward per step the
    counter always equals B*P, so we fold the division into the backward and
    the stateful counter disappears.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp

# NNMF_DEBUG=1 prints cotangent/grad statistics from inside the custom VJP
# (requires a runtime with host callbacks; the axon relay lacks them)
_DEBUG = bool(os.environ.get("NNMF_DEBUG"))
# diagnostic switches: zero out non-finite values at the bwd entry / exit
_SAN_G = bool(os.environ.get("NNMF_SANITIZE_G"))
_SAN_OUT = bool(os.environ.get("NNMF_SANITIZE_OUT"))
# NNMF_DUMP=<dir>: save each bwd invocation's (inp, w, h, g) to <dir>/bwd_<n>.npz
_DUMP = os.environ.get("NNMF_DUMP", "")


def _dump_cb(inp, w, h, g):
    import numpy as _np

    n = len([f for f in os.listdir(_DUMP) if f.startswith("bwd_")])
    _np.savez(os.path.join(_DUMP, f"bwd_{n}.npz"), inp=inp, w=w, h=h, g=g)


@functools.lru_cache(maxsize=None)
def make_nnmf_op(
    iterations: int,
    eps0: float = 1.0,
    eps: float = 1e-20,
    local_learning: bool = False,
    output_layer: bool = False,
    w_trainable: bool = False,
    scale_grad: bool = False,
    clamp_grad: bool = False,
    divide_grad_by_contributions: bool = True,
):
    """Build the custom-VJP NNMF iterate for a static flag configuration.

    Returns ``op(input, weights) -> h`` with input (B, C, P) L1-normalized
    over C, weights (C, M) column-stochastic; h (B, M, P).
    """

    def _forward(inp, w):
        B, C, P = inp.shape
        M = w.shape[1]
        h = jnp.full((B, M, P), 1.0 / M, dtype=inp.dtype)
        for _ in range(iterations):
            r = jnp.einsum("cm,bmp->bcp", w, h)  # sum_m h W
            t = inp / (r + eps)
            h_new = h * jnp.einsum("cm,bcp->bmp", w, t)
            h = h + eps0 * h_new if eps0 > 0 else h_new
            h = h / (h.sum(axis=1, keepdims=True) + eps)
        return h

    @jax.custom_vjp
    def op(inp, w):
        return _forward(inp, w)

    def fwd(inp, w):
        h = _forward(inp, w)
        return h, (inp, w, h)

    def bwd(res, g):
        inp, w, h = res
        B, C, P = inp.shape

        if _DEBUG:
            jax.debug.print(
                "nnmf-bwd g: min {} max {} nonfinite {}",
                g.min(), g.max(), jnp.sum(~jnp.isfinite(g)),
            )
        if _SAN_G:
            g = jnp.where(jnp.isfinite(g), g, 0.0)
        if _DUMP:
            jax.debug.callback(_dump_cb, inp, w, h, g)

        # XLA-fusion guard (do NOT remove): without this barrier, XLA fuses
        # the forward's L1-normalization of ``inp`` (x / (sum + 1e-20)) into
        # this backward's renormalization + ratio math and the rewritten
        # expression produces all-NaN grad_w — with FINITE inputs, on both the
        # CPU and TPU backends, in fp32 as well as bf16-mixed, while the same
        # math is finite eagerly.  Repro: tools/repro_nonfinite_fusion.py
        # (gnnmf_sbs + madam + trainable bases NaNs at step ~9; barrier on
        # ``inp`` alone fixes it, barriers on ``g`` or ``h`` alone do not).
        inp = jax.lax.optimization_barrier(inp)

        if scale_grad:
            # max(|g|max, stored_scale=-1.0) == |g|max (see module docstring)
            scale = jnp.maximum(jnp.abs(g).max(), 1e-20)
            g = g / scale

        inp = inp / (inp.sum(axis=1, keepdims=True) + 1e-20)

        bigr = jnp.einsum("cm,bmp->bcp", w, h)  # (B,C,P)
        s = jnp.einsum("cm,bmp->bcp", w, h * g)  # sum_m r*g
        grad_input = s / (bigr + 1e-20)

        if not w_trainable:
            grad_w = jnp.zeros_like(w)
        elif (not output_layer) and local_learning:
            grad_w = -2.0 * jnp.einsum("bcp,bmp->cm", inp - bigr, h)
        else:
            denom = bigr**2 + 1e-20
            grad_w = jnp.einsum(
                "bcp,bmp->cm", inp * bigr / denom, h * g
            ) - jnp.einsum("bcp,bmp->cm", inp * s / denom, h)

        if divide_grad_by_contributions and w_trainable:
            grad_w = grad_w / (B * P)

        if clamp_grad:
            grad_input = jnp.clip(grad_input, -5.0, 5.0)
            grad_w = jnp.clip(grad_w, -5.0, 5.0)

        if _DEBUG:
            jax.debug.print(
                "nnmf-bwd grad_w: min {} max {} nonfinite {} | grad_input nonfinite {}",
                grad_w.min(), grad_w.max(), jnp.sum(~jnp.isfinite(grad_w)),
                jnp.sum(~jnp.isfinite(grad_input)),
            )
        if _SAN_OUT:
            grad_w = jnp.where(jnp.isfinite(grad_w), grad_w, 0.0)

        return grad_input, grad_w

    op.defvjp(fwd, bwd)
    return op


def unfold(x, kernel_size, strides=(1, 1), padding=(0, 0)):
    """torch F.unfold equivalent: (B, C, H, W) -> (B, C*kh*kw, H', W').

    Channel ordering matches torch: (c, kh, kw) with c slowest — i.e. patches
    are laid out channel-major, then kernel-row, then kernel-col.

    The reference calls unfold with dilation=0 (the model-zoo defaults,
    layers.py:383-400 via NNMFLayerSbSBP.py:252-265), which torch REJECTS at
    runtime — those paths crash as shipped.  We use dilation=1 (the intended
    semantics, and what the reference's own __main__ smoke test passes).
    """
    B, C, H, W = x.shape
    kh, kw = kernel_size
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=(kh, kw),
        window_strides=tuple(strides),
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (B, C*kh*kw, H', W') with channel-major ordering
    return patches


def fold(patches, output_size, kernel_size, strides=(1, 1), padding=(0, 0)):
    """torch ``F.fold`` equivalent: (B, C*kh*kw, Hp, Wp) -> (B, C, H, W) by
    summing overlapping patches.

    Implemented as the exact adjoint (VJP) of :func:`unfold`, so the
    channel-major patch layout always matches and XLA lowers it to the
    transposed convolution.  This is the general NNMF decode the reference
    reaches via ``F.fold`` (AutoNNMFLayer.py:315-329) / ``conv_transpose2d``
    (NNMFLayerSbSBP.py:528-547) — both compute fold(sum_m h[m] * W[:, m]).
    Cross-checked against torch in tests/test_nnmf.py.
    """
    B = patches.shape[0]
    kh, kw = kernel_size
    C = patches.shape[1] // (kh * kw)
    H, W = output_size
    zeros = jnp.zeros((B, C, H, W), patches.dtype)
    _, vjp = jax.vjp(lambda x: unfold(x, kernel_size, strides, padding), zeros)
    return vjp(patches)[0]


def conv_output_size(size, kernel, stride=(1, 1), padding=(0, 0)):
    return (
        (size[0] + 2 * padding[0] - (kernel[0] - 1) - 1) // stride[0] + 1,
        (size[1] + 2 * padding[1] - (kernel[1] - 1) - 1) // stride[1] + 1,
    )
