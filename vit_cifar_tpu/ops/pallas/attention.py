"""Fused multi-head self-attention as a Pallas TPU kernel.

One kernel per batch element fuses QK^T -> softmax -> AV for ALL heads: the
logits/attention tensor (H,T,T) never leaves VMEM, so HBM sees only Q,K,V in
and the context out.  At this repo's scale (T=65, head_dim=32) one block per
batch element easily fits VMEM (3*12*65*32*4B ≈ 300 KB + 12*65*65*4B ≈ 200 KB).

Numerics match ops.attention.MultiHeadSelfAttention exactly: the reference's
full-model-dim softmax scale (layers.py:97) is passed in as ``scale``, and the
softmax runs in fp32 with max-subtraction like jax.nn.softmax.

Training-grade since round 5: the custom VJP saves the per-row logsumexp and
runs the tiled flash backward (shared with :func:`flash_attention`), so no
(T,T) tensor reaches HBM in either direction.  Training at the flagship shape
still uses the einsum path by default (measured faster at D < 128); the
kernels are opt-in via MultiHeadSelfAttention(use_pallas=True), which routes
by the measured policy (:func:`select_kernel`).

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
where the whole-(T,T) kernel cannot compile.  Since round 5 its BACKWARD is
tiled too (two kernels: dq, then dk/dv, FlashAttention-2 style with the
forward's logsumexp as the only extra residual), so training through
flash_attention keeps flash memory economics — no (B,H,T,T) tensor in HBM
in either direction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# Leave headroom under v5e's ~16 MB VMEM for double buffering + temporaries.
VMEM_BUDGET_BYTES = 12 * 2**20


def select_kernel(heads: int, t: int, head_dim: int,
                  training: bool = False) -> str:
    """Measured-policy kernel routing (docs/PERFORMANCE.md, "division of
    labor"): returns "einsum", "fused", or "flash".

    - ``head_dim < 128``: the mandatory lane padding (D -> 128) multiplies
      the MXU work; XLA's fused einsums win (kernel measured 0.76x at the
      flagship (128,12,65,32) — ``use_pallas=True`` must never hand the user
      a measured slowdown, so this routes back to einsum).
    - ``training`` additionally routes ``T < 512`` to einsum: fwd+bwd
      measured 0.96x at (512,8,256,128) where the fwd alone is 1.60x — the
      backward's tile revisits only pay off once the (T,T) tensors get big.
    - ``fused_attention`` when its per-batch block fits VMEM: all-heads
      q/k/v/o tiles plus one per-head (Tp,Tp) f32 logits tile.  H-aware —
      a bare ``T <= 1024`` check would Mosaic-OOM at e.g. H=12, T~1024,
      D=128 (~24 MB of head tiles alone).
    - ``flash_attention`` beyond (any T; tiled fwd AND bwd).
    """
    if head_dim < 128:
        return "einsum"
    if training and t < 512:
        return "einsum"
    tp, dp = _round_up(t, 8), _round_up(head_dim, 128)
    # q/k/v/o all-heads blocks + the per-head (Tp,Tp) f32 logits tile + the
    # lane-broadcast lse output the training forward also writes (measured:
    # omitting it put (64,4,1024,128) 16 KB over the 16 MB stack limit)
    vmem = 4 * heads * tp * dp * 4 + tp * tp * 4 + heads * tp * 128 * 4
    if t <= 1024 and vmem <= VMEM_BUDGET_BYTES:
        return "fused"
    return "flash"


def _mhsa_kernel(q_ref, k_ref, v_ref, o_ref, *, scale: float, heads: int,
                 t: int, lse_ref=None):
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
        m = jnp.max(logits, axis=-1, keepdims=True)
        p = jnp.exp(logits - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        attn = p / l
        o_ref[h] = jnp.dot(
            attn, v, preferred_element_type=jnp.float32
        ).astype(o_ref.dtype)
        if lse_ref is not None:
            # per-row logsumexp residual for the shared tiled flash backward
            lse_ref[h] = jnp.broadcast_to(m + jnp.log(l), lse_ref[h].shape)


def _fused_attention_fwd_impl(q, k, v, scale: float, with_lse: bool = False):
    """q/k/v: (B, H, T, D) -> context (B, H, T, D) [+ lse (B, H, Tp, 128)].

    Mosaic requires lane-aligned block slices: T pads to a multiple of 8
    (sublanes), D to 128 (lanes); padded keys are masked in the kernel and
    padded rows sliced away after.  ``with_lse`` (the training/VJP path)
    also emits the per-row logsumexp in the lane-broadcast layout the tiled
    flash backward consumes.
    """
    B, H, T, D = q.shape
    Tp, Dp = _round_up(T, 8), _round_up(D, 128)
    pad = [(0, 0), (0, 0), (0, Tp - T), (0, Dp - D)]
    qp, kp, vp = (jnp.pad(a, pad) for a in (q, k, v))

    kernel = functools.partial(_mhsa_kernel, scale=scale, heads=H, t=T)
    spec = pl.BlockSpec((1, H, Tp, Dp), lambda b: (b, 0, 0, 0),
                        memory_space=pltpu.VMEM)
    interpret = jax.default_backend() != "tpu"

    if with_lse:
        lspec = pl.BlockSpec((1, H, Tp, 128), lambda b: (b, 0, 0, 0),
                             memory_space=pltpu.VMEM)

        def kernel3l(q_ref, k_ref, v_ref, o_ref, lse_ref):
            kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0],
                   lse_ref=lse_ref.at[0])

        out, lse = pl.pallas_call(
            kernel3l,
            grid=(B,),
            in_specs=[spec, spec, spec],
            out_specs=(spec, lspec),
            out_shape=(jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
                       jax.ShapeDtypeStruct((B, H, Tp, 128), jnp.float32)),
            interpret=interpret,
        )(qp, kp, vp)
        return out[:, :, :T, :D], lse

    def kernel3(q_ref, k_ref, v_ref, o_ref):
        kernel(q_ref.at[0], k_ref.at[0], v_ref.at[0], o_ref.at[0])

    out = pl.pallas_call(
        kernel3,
        grid=(B,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((B, H, Tp, Dp), q.dtype),
        # interpreter on non-TPU backends so the CPU test suite runs it
        interpret=interpret,
    )(qp, kp, vp)
    return out[:, :, :T, :D]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def fused_attention(q, k, v, scale: float):
    """(B,H,T,D)^3 -> (B,T,H,D) context (the reference's "bihf" layout,
    layers.py:101)."""
    out = _fused_attention_fwd_impl(q, k, v, scale)
    return out.transpose(0, 2, 1, 3)


def _fwd(q, k, v, scale):
    out, lse = _fused_attention_fwd_impl(q, k, v, scale, with_lse=True)
    out = out.transpose(0, 2, 1, 3)
    return out, (q, k, v, out, lse)


def _bwd(scale, res, g):
    """Tiled flash backward shared with :func:`flash_attention` (round 5).

    The previous einsum-recompute backward materialized the (B,H,T,T)
    attention + dattn tensors in HBM — at fused_attention's routed regime
    (D >= 128, T up to 1024, e.g. (128,8,512,128)) that is 2 x 1 GB of f32
    per step.  With block_q=1024 the flash tiling degenerates to one q tile
    of Tp rows, so the lse emitted by the fused forward is exactly the
    residual the tiled kernels expect.
    """
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, 1024, 512)


fused_attention.defvjp(_fwd, _bwd)


# --------------------------------------------------------------------------- #
# KV-tiled online-softmax ("flash") attention: lifts the whole-(T,T) VMEM cap
# --------------------------------------------------------------------------- #


def _flash_fwd_body(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                    *, scale: float, t: int, block_kv: int, lse_ref=None):
    """One (b, h, i, j) program: fold KV tile j into q-tile i's running
    softmax.

    Scratch (m: row max, l: row normalizer, acc: unnormalized context)
    persists across the sequential innermost kv-grid dimension; the output
    block is revisited and written once on the last tile.  Classic
    two-pass-free online softmax: p = exp(s - m_new),
    acc <- acc*exp(m - m_new) + p @ v.

    When ``lse_ref`` is given (the training/VJP forward) the per-row
    logsumexp ``m + log(l)`` is also written on the last tile — the only
    residual besides (q, k, v, o) the tiled backward needs.
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
        if lse_ref is not None:
            lse_ref[0, 0] = m_ref[:] + jnp.log(l_ref[:])


def _flash_tiles(T: int, D: int, block_q: int, block_kv: int):
    """Shared tiling arithmetic: lane-pad D to 128, sublane-pad q tiles to 8,
    lane-pad kv tiles to 128 (they appear as the lane dim of the logits)."""
    Dp = _round_up(D, 128)
    Bq = min(_round_up(block_q, 8), _round_up(T, 8))
    Bk = min(_round_up(block_kv, 128), _round_up(T, 128))
    Tq, Tkv = _round_up(T, Bq), _round_up(T, Bk)
    return Dp, Bq, Bk, Tq, Tkv, Tq // Bq, Tkv // Bk


def _flash_forward_impl(q, k, v, scale: float, block_q: int, block_kv: int,
                        with_lse: bool):
    """(B,H,T,D)^3 -> context (B,H,Tq,Dp) [+ lse (B,H,Tq,128) f32].

    The lse output follows the official TPU flash-attention convention of
    lane-broadcast per-row scalars (the row dim must stay on sublanes; a
    (…,Bq)-last layout would need an in-kernel transpose)."""
    B, H, T, D = q.shape
    Dp, Bq, Bk, Tq, Tkv, ni, nj = _flash_tiles(T, D, block_q, block_kv)
    qp = jnp.pad(q, [(0, 0), (0, 0), (0, Tq - T), (0, Dp - D)])
    kp, vp = (jnp.pad(a, [(0, 0), (0, 0), (0, Tkv - T), (0, Dp - D)])
              for a in (k, v))

    qspec = pl.BlockSpec((1, 1, Bq, Dp), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    kvspec = pl.BlockSpec((1, 1, Bk, Dp), lambda b, h, i, j: (b, h, j, 0),
                          memory_space=pltpu.VMEM)
    ospec = pl.BlockSpec((1, 1, Bq, Dp), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)
    lspec = pl.BlockSpec((1, 1, Bq, 128), lambda b, h, i, j: (b, h, i, 0),
                         memory_space=pltpu.VMEM)

    if with_lse:
        def kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, m_ref, l_ref, acc_ref):
            _flash_fwd_body(q_ref, k_ref, v_ref, o_ref, m_ref, l_ref, acc_ref,
                            scale=scale, t=T, block_kv=Bk, lse_ref=lse_ref)
        out_shape = (jax.ShapeDtypeStruct((B, H, Tq, Dp), q.dtype),
                     jax.ShapeDtypeStruct((B, H, Tq, 128), jnp.float32))
        out_specs = (ospec, lspec)
    else:
        kernel = functools.partial(
            _flash_fwd_body, scale=scale, t=T, block_kv=Bk
        )
        out_shape = jax.ShapeDtypeStruct((B, H, Tq, Dp), q.dtype)
        out_specs = ospec

    return pl.pallas_call(
        kernel,
        grid=(B, H, ni, nj),
        in_specs=[qspec, kvspec, kvspec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((Bq, 128), jnp.float32),  # running row max
            pltpu.VMEM((Bq, 128), jnp.float32),  # running row normalizer
            pltpu.VMEM((Bq, Dp), jnp.float32),   # unnormalized context
        ],
        interpret=(jax.default_backend() != "tpu"),
    )(qp, kp, vp)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def flash_attention(q, k, v, scale: float, block_q: int = 1024,
                    block_kv: int = 512):
    """Fully tiled (q AND kv) fused attention: (B,H,T,D)^3 -> (B,T,H,D).

    Unlike :func:`fused_attention` (whole (T,T) block in VMEM, T <= ~1024),
    only one (block_q, block_kv) logits tile is live at a time, so T scales
    to arbitrary lengths; VMEM holds one q tile + the f32 accumulator and
    running max/normalizer scratch.  The backward is tiled too (see
    ``_flash_bwd_impl``): training-grade flash economics — nothing of size
    (T, T) ever reaches HBM in either direction.
    """
    B, H, T, D = q.shape
    out = _flash_forward_impl(q, k, v, scale, block_q, block_kv,
                              with_lse=False)
    return out[:, :, :T, :D].transpose(0, 2, 1, 3)


def _flash_bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref,
                         dq_ref, dq_acc, delta_ref,
                         *, scale: float, t: int, block_kv: int):
    """Grid (B, H, i, j), kv tile j innermost: accumulate q-tile i's grad.

    dq_i = scale * sum_j ds_ij @ k_j with
    ds = p * (dp - delta), p = exp(s - lse), dp = do @ v^T,
    delta_i = rowsum(do_i * o_i)  (computed once at j == 0).
    """
    j = pl.program_id(3)
    nj = pl.num_programs(3)

    do = do_ref[0, 0].astype(jnp.float32)  # (Bq, Dp)

    @pl.when(j == 0)
    def _init():
        dq_acc[:] = jnp.zeros_like(dq_acc)
        o = o_ref[0, 0].astype(jnp.float32)
        delta_ref[:] = jnp.broadcast_to(
            jnp.sum(do * o, axis=-1, keepdims=True), delta_ref.shape
        )

    q = q_ref[0, 0].astype(jnp.float32)  # (Bq, Dp)
    k = k_ref[0, 0].astype(jnp.float32)  # (Bk, Dp)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    s = jnp.where(col < t, s, -jnp.inf)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])  # masked cols -> exp(-inf) = 0
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bq, Bk)
    ds = p * (dp - delta_ref[:][:, :1]) * scale
    dq_acc[:] += jax.lax.dot_general(
        ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )

    @pl.when(j == nj - 1)
    def _finalize():
        dq_ref[0, 0] = dq_acc[:].astype(dq_ref.dtype)


def _flash_bwd_dkv_kernel(k_ref, v_ref, q_ref, do_ref, o_ref, lse_ref,
                          dk_ref, dv_ref, dk_acc, dv_acc,
                          *, scale: float, t: int, block_kv: int):
    """Grid (B, H, j, i), q tile i innermost: accumulate kv-tile j's grads.

    dv_j = sum_i p_ij^T @ do_i;  dk_j = scale * sum_i ds_ij^T @ q_i.
    delta_i is recomputed per (j, i) from the o/do tiles — elementwise VPU
    work, negligible next to the four MXU matmuls per program.
    """
    i = pl.program_id(3)
    ni = pl.num_programs(3)
    j = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_acc[:] = jnp.zeros_like(dk_acc)
        dv_acc[:] = jnp.zeros_like(dv_acc)

    q = q_ref[0, 0].astype(jnp.float32)    # (Bq, Dp)
    do = do_ref[0, 0].astype(jnp.float32)
    o = o_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)    # (Bk, Dp)
    v = v_ref[0, 0].astype(jnp.float32)

    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # (Bq, Bk)
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + j * block_kv
    s = jnp.where(col < t, s, -jnp.inf)
    p = jnp.exp(s - lse_ref[0, 0][:, :1])  # (Bq, Bk); pad kv cols are 0
    dv_acc[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bk, Dp)
    delta = jnp.sum(do * o, axis=-1, keepdims=True)  # (Bq, 1)
    dp = jax.lax.dot_general(
        do, v, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    ds = p * (dp - delta) * scale  # (Bq, Bk)
    dk_acc[:] += jax.lax.dot_general(
        ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )  # (Bk, Dp)

    @pl.when(i == ni - 1)
    def _finalize():
        dk_ref[0, 0] = dk_acc[:].astype(dk_ref.dtype)
        dv_ref[0, 0] = dv_acc[:].astype(dv_ref.dtype)


def _flash_bwd_impl(q, k, v, o, lse, g, scale: float, block_q: int,
                    block_kv: int):
    """Tiled flash backward: two kernels, dq then dk/dv, each revisiting
    (block_q, block_kv) logits tiles — the (B,H,T,T) attention tensor never
    exists in HBM, matching the forward's memory economics.

    ``o``/``g`` arrive in the public (B,T,H,D) layout; ``lse`` is the padded
    lane-broadcast (B,H,Tq,128) residual from the forward.  Zero-padded
    do rows make every pad-q contribution vanish identically (delta = 0,
    ds = 0), and masked pad-kv columns zero p, so no extra row masking is
    needed — pinned by the ragged-shape cases in tests/test_pallas_attention.
    """
    B, H, T, D = q.shape
    Dp, Bq, Bk, Tq, Tkv, ni, nj = _flash_tiles(T, D, block_q, block_kv)
    pad_q = [(0, 0), (0, 0), (0, Tq - T), (0, Dp - D)]
    pad_kv = [(0, 0), (0, 0), (0, Tkv - T), (0, Dp - D)]
    qp = jnp.pad(q, pad_q)
    kp, vp = jnp.pad(k, pad_kv), jnp.pad(v, pad_kv)
    dop = jnp.pad(g.transpose(0, 2, 1, 3), pad_q)
    op = jnp.pad(o.transpose(0, 2, 1, 3), pad_q)

    def qblock(idx):
        return pl.BlockSpec((1, 1, Bq, Dp), idx, memory_space=pltpu.VMEM)

    def kvblock(idx):
        return pl.BlockSpec((1, 1, Bk, Dp), idx, memory_space=pltpu.VMEM)

    interpret = jax.default_backend() != "tpu"

    # --- pass 1: dq (grid i outer, j inner) ---
    qi = lambda b, h, i, j: (b, h, i, 0)
    kvj = lambda b, h, i, j: (b, h, j, 0)
    lse_i = pl.BlockSpec((1, 1, Bq, 128), qi, memory_space=pltpu.VMEM)
    dq = pl.pallas_call(
        functools.partial(_flash_bwd_dq_kernel, scale=scale, t=T, block_kv=Bk),
        grid=(B, H, ni, nj),
        in_specs=[qblock(qi), kvblock(kvj), kvblock(kvj), qblock(qi),
                  qblock(qi), lse_i],
        out_specs=qblock(qi),
        out_shape=jax.ShapeDtypeStruct((B, H, Tq, Dp), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((Bq, Dp), jnp.float32),   # dq accumulator
            pltpu.VMEM((Bq, 128), jnp.float32),  # delta = rowsum(do * o)
        ],
        interpret=interpret,
    )(qp, kp, vp, dop, op, lse)

    # --- pass 2: dk, dv (grid j outer, i inner) ---
    qi2 = lambda b, h, j, i: (b, h, i, 0)
    kvj2 = lambda b, h, j, i: (b, h, j, 0)
    lse_i2 = pl.BlockSpec((1, 1, Bq, 128), qi2, memory_space=pltpu.VMEM)
    dk, dv = pl.pallas_call(
        functools.partial(_flash_bwd_dkv_kernel, scale=scale, t=T,
                          block_kv=Bk),
        grid=(B, H, nj, ni),
        in_specs=[kvblock(kvj2), kvblock(kvj2), qblock(qi2), qblock(qi2),
                  qblock(qi2), lse_i2],
        out_specs=(kvblock(kvj2), kvblock(kvj2)),
        out_shape=(jax.ShapeDtypeStruct((B, H, Tkv, Dp), k.dtype),
                   jax.ShapeDtypeStruct((B, H, Tkv, Dp), v.dtype)),
        scratch_shapes=[
            pltpu.VMEM((Bk, Dp), jnp.float32),  # dk accumulator
            pltpu.VMEM((Bk, Dp), jnp.float32),  # dv accumulator
        ],
        interpret=interpret,
    )(kp, vp, qp, dop, op, lse)

    return (dq[:, :, :T, :D], dk[:, :, :T, :D], dv[:, :, :T, :D])


def _flash_fwd(q, k, v, scale, block_q, block_kv):
    B, H, T, D = q.shape
    out, lse = _flash_forward_impl(q, k, v, scale, block_q, block_kv,
                                   with_lse=True)
    out = out[:, :, :T, :D].transpose(0, 2, 1, 3)
    return out, (q, k, v, out, lse)


def _flash_bwd(scale, block_q, block_kv, res, g):
    q, k, v, o, lse = res
    return _flash_bwd_impl(q, k, v, o, lse, g, scale, block_q, block_kv)


flash_attention.defvjp(_flash_fwd, _flash_bwd)
