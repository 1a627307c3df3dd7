"""Fused multi-head self-attention as a Pallas TPU kernel.

One kernel per batch element fuses QK^T -> softmax -> AV for ALL heads: the
logits/attention tensor (H,T,T) never leaves VMEM, so HBM sees only Q,K,V in
and the context out.  At this repo's scale (T=65, head_dim=32) one block per
batch element easily fits VMEM (3*12*65*32*4B ≈ 300 KB + 12*65*65*4B ≈ 200 KB).

Numerics match ops.attention.MultiHeadSelfAttention exactly: the reference's
full-model-dim softmax scale (layers.py:97) is passed in as ``scale``, and the
softmax runs in fp32 with max-subtraction like jax.nn.softmax.

Forward-only: the custom VJP simply recomputes attention with einsums for the
backward (cheap at T=65); training uses the einsum path by default and this
kernel is opt-in via MultiHeadSelfAttention(use_pallas=True).

Measured on one v5e chip (B=128, H=12, T=65, D=32, fp32): 1.81 ms vs 0.90 ms
for XLA's fused einsums — the mandatory lane padding (D 32 -> 128) quadruples
the MXU work at this size, so XLA remains the default.  Re-tested in round 4
with read-synced windows and a grid-(B,H) masked-block variant
(docs/PERFORMANCE.md "Fused Pallas attention, re-tested"): both layouts stay
3-5x slower than XLA's fused core — each (b,h) program is two ~(80,128)
matmuls, too little work to hide Mosaic per-program overhead.  The kernel
becomes the right tool when head_dim >= 128 (no padding waste) or when T
grows enough that keeping the (H,T,T) attention tensor out of HBM dominates
— measured (tools/ab_pallas_shape.py, round 4): 1.60x over XLA at
(512,8,256,128), 1.92x at (128,8,512,128), 2.11x at (64,4,1024,128).
Past fused_attention's T<=1024 VMEM cap, :func:`flash_attention` (online
softmax, q and kv both tiled) runs at ANY sequence length with exact
numerics — 1.25-1.28x over XLA at T=512-1024 and still ahead at T=4096
where the whole-(T,T) kernel cannot compile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _mhsa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int, t: int):
    for h in range(heads):
        q = q_ref[h].astype(jnp.float32)  # (Tp, Dp)
        k = k_ref[h].astype(jnp.float32)
        v = v_ref[h].astype(jnp.float32)
        logits = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale  # (Tp, Tp)
        # mask padded keys (cols >= t); padded D lanes are zero-filled already
        col = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        logits = jnp.where(col < t, logits, -jnp.inf)
        logits = logits - jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits)
        attn = p / jnp.sum(p, axis=-1, keepdims=True)
        o_ref[h] = jnp.dot(
            attn, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)


def _fused_attention_fwd_impl(q, k, v, scale: float):
    """q/k/v: (B, H, T, D) -> context (B, H, T, D).

    Mosaic requires lane-aligned block slices: T pads to a multiple of 8
    (sublanes), D to 128 (lanes); padded keys are masked in the kernel and
    padded rows sliced away after.
    """
    B, H, T, D = q.shape
    Tp, Dp = _round_up(T, 8), _round_up(D, 128)
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)]
    qp, kp, vp = (jnp.pad(a, pad) for a in (q, k, v))

    kernel = functools.partial(_mhsa_kernel, scale=scale, heads=H, t=T)
    spec = pl.BlockSpec((1, H, Tp, Dp), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)

    def kernel3(q_ref, k_ref, v_ref, o_ref):
        kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0])

    out = pl.pallas_call(
        kernel3,
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        # interpreter on non-TPU backends so the CPU test suite runs it
        interpret=(jax.default_backend() != "tpu"),
    )(qp, kp, vp)
    return out[:, :, :T, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """(B,H,T,D)^3 -> (B,T,H,D) context (the reference's "bihf" layout,
    layers.py:101)."""
    out = _fused_attention_fwd_impl(q, k, v, scale)
    return out.transpose(0, 2, 1, 3)


def _fwd(q, k, v, scale):
    return fused_attention(q, k, v, scale), (q, k, v)


def _bwd(scale, res, g):
    """Einsum recompute backward (T=65: recompute is cheaper than residuals)."""
    q, k, v = res
    qf, kf, vf = (a.astype(jnp.float32) for a in (q, k, v))
    logits = jnp.einsum("bhid,bhjd->bhij", qf, kf) * scale
    attn = jax.nn.softmax(logits, axis=-1)
    gf = g.astype(jnp.float32).transpose(0, 2, 1, 3)  # (B,H,T,D)
    dv = jnp.einsum("bhij,bhid->bhjd", attn, gf)
    dattn = jnp.einsum("bhid,bhjd->bhij", gf, vf)
    dlogits = attn * (dattn - jnp.sum(dattn * attn, axis=-1, keepdims=True))
    dq = jnp.einsum("bhij,bhjd->bhid", dlogits, kf) * scale
    dk = jnp.einsum("bhij,bhid->bhjd", dlogits, qf) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


fused_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# KV-tiled online-softmax ("flash") attention: lifts the whole-(T,T) VMEM cap
# --------------------------------------------------------------------------- #


def _flash_kernel(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                  *, scale: float, t: int, block_kv: int):
    """One (b, h, i, j) program: fold KV tile j into q-tile i's running
    softmax.

    Scratch (m: row max, l: row normalizer, acc: unnormalized context)
    persists across the sequential innermost kv-grid dimension; the output
    block is revisited and written once on the last tile.  Classic
    two-pass-free online softmax: p = exp(s - m_new),
    acc <- acc*exp(m - m_new) + p @ v.
    """
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = jnp.full_like(m_ref, -jnp.inf)
        l_ref[:] = jnp.zeros_like(l_ref)
        acc_ref[:] = jnp.zeros_like(acc_ref)

    q = q_ref[0, 0].astype(jnp.float32)  # (Tq, Dp)
    k = k_ref[0, 0].astype(jnp.float32)  # (Bk, Dp)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Tq, Bk)
    # mask kv positions beyond the true length (last tile padding)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    s = jnp.where(col < t, s, -jnp.inf)

    m_prev = m_ref[:][:, :1]  # (Tq, 1); lanes replicated
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=-1, keepdims=True))
    # a fully-masked tile keeps m at -inf; exp(-inf - -inf) would be NaN
    safe_m = jnp.where(jnp.isfinite(m_new), m_new, 0.0)
    p = jnp.exp(s - safe_m)  # masked cols: exp(-inf) = 0
    corr = jnp.exp(jnp.where(jnp.isfinite(m_prev), m_prev - safe_m, -jnp.inf))

    l_new = l_ref[:][:, :1] * corr + jnp.sum(p, axis=-1, keepdims=True)
    acc_ref[:] = acc_ref[:] * corr + jax.lax.dot_general(
        p, v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    m_ref[:] = jnp.broadcast_to(m_new, m_ref.shape)
    l_ref[:] = jnp.broadcast_to(l_new, l_ref.shape)

    @pl.when(j == nj - 1)
    def _finalize():
        o_ref[0, 0] = (acc_ref[:] / l_ref[:][:, :1]).astype(o_ref.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float, block_q: int = 1024,
                    block_kv: int = 512):
    """Fully tiled (q AND kv) fused attention: (B,H,T,D)^3 -> (B,T,H,D).

    Unlike :func:`fused_attention` (whole (T,T) block in VMEM, T <= ~1024),
    only one (block_q, block_kv) logits tile is live at a time, so T scales
    to arbitrary lengths; VMEM holds one q tile + the f32 accumulator and
    running max/normalizer scratch.  Forward-only kernel with the same
    einsum-recompute backward class as fused_attention; intended for
    long-context inference/serving and as the scaling path measured in
    tools/ab_pallas_shape.py.
    """
    B, H, T, D = q.shape
    Dp = _round_up(D, 128)
    Bq = min(_round_up(block_q, 8), _round_up(T, 8))
    Bk = min(_round_up(block_kv, 128), _round_up(T, 128))
    Tq, Tkv = _round_up(T, Bq), _round_up(T, Bk)
    ni, nj = Tq // Bq, Tkv // Bk
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Tq - T), (0, Dp - D)])
    kp, vp = (jnp.pad(a, [(0, 0), (0, 0), (0, Tkv - T), (0, Dp - D)])
              for a in (k, v))

    qspec = pl.BlockSpec((1, 1, Bq, Dp), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, Bk, Dp), lambda b, h, i, j: (b, h, j, 0),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, Bq, Dp), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)

    kernel = functools.partial(
        _flash_kernel, scale=scale, t=T, block_kv=Bk
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, H, ni, nj),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=ospec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bq, 128), jnp.float32),  # running row max
            pltpu.VMEM((Bq, 128), jnp.float32),  # running row normalizer
            pltpu.VMEM((Bq, Dp), jnp.float32),   # unnormalized context
        ],
        interpret=(jax.default_backend() != "tpu"),
    )(qp, kp, vp)
    return out[:, :, :T, :D].transpose(0, 2, 1, 3)


def _flash_fwd(q, k, v, scale, block_q, block_kv):
    return flash_attention(q, k, v, scale, block_q, block_kv), (q, k, v)


def _flash_bwd(scale, block_q, block_kv, res, g):
    # same einsum-recompute backward as fused_attention (materializes the
    # (B,H,T,T) attention in HBM — fine for the T this repo trains at; a
    # tiled flash backward is the known upgrade if long-T TRAINING lands)
    return _bwd(scale, res, g)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
