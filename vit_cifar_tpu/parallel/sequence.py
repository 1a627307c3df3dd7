"""Sequence parallelism: the token dim pinned to a ``seq`` mesh axis.

No reference equivalent: the reference's distributed story is Lightning DDP
(reference main.py:223-224), data parallelism only — SURVEY.md §2.9.  This
fills the SP slot of the mesh vocabulary (alongside ``data`` = DP,
``model`` = TP in parallel/mesh.py, and ``pipe`` = GPipe in
parallel/pipeline.py).

TPU-native design
-----------------
GSPMD-style: no manual collectives.  ``seq_parallel_model`` clones the ViT
trunk with its ``act_constraint`` hook (models/vit.py) set to a
``with_sharding_constraint`` that pins the (B, T, F) token stream to
``P('data', 'seq', None)`` after the embedding and after every encoder
block.  From those anchors XLA partitions everything elementwise-in-T —
LayerNorm, residuals, the MLP (whose matmuls contract F, not T), dropout —
over the ``seq`` axis, and inserts the all-gathers around the attention
core (QK^T needs the full K/V sequence) on its own.  That is exactly the
published sequence-parallel schedule (LN/dropout sharded over tokens,
attention gathered), derived from shardings instead of hand-written
communication.

Padding: the parity token count (T = 65 = 8x8 patches + cls) divides no
power-of-two mesh axis, so the clone also pads the stream with zero tokens
to the next multiple of the axis size (``ViT.seq_pad``) and gives the
attention mixer a static ``valid_len`` key mask so real tokens never attend
to pad.  Pad QUERY rows carry garbage but are sliced off before pooling —
the logits are bit-identical in semantics to the unpadded model
(tests/test_sequence.py pins fwd + grads against the plain trunk).

Scope: SP covers the flagship ``vit`` mixer (MultiHeadSelfAttention, which
knows how to mask pad keys).  The other mixers mix over the token dim in
ways zero-padding would corrupt (AFT's global max/sum over tokens, gMLP's
spatial gate, NNMF over tokens) — they raise here rather than silently
mis-train.

Scale intent: at the parity scale (T=65) this is a validated capability,
not a throughput win — activation memory per chip shrinks by ~S while ICI
pays for the attention gathers.  It exists for the regime the mesh design
targets (long token streams).
"""

from __future__ import annotations

import functools

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import ViT
from ..ops.attention import MultiHeadSelfAttention


def has_seq_axis(mesh) -> bool:
    return (
        mesh is not None
        and "seq" in mesh.axis_names
        and mesh.shape["seq"] > 1
    )


def seq_parallel_model(vit: ViT, mesh: Mesh) -> ViT:
    """Clone ``vit`` with its token stream constrained onto the ``seq`` axis.

    The returned module has the identical parameter tree, init, and math —
    the activation layout changes and the stream is zero-padded (masked in
    attention, sliced before pooling), so checkpoints/TP/DP all compose.
    """
    if not isinstance(vit, ViT):
        raise ValueError(
            "sequence parallelism covers the ViT trunk (models/vit.ViT); "
            f"got {type(vit).__name__}. CNN models have no token stream to "
            "shard — run them on a data-only mesh."
        )
    if not has_seq_axis(mesh):
        raise ValueError("mesh has no 'seq' axis > 1")

    mixer = vit.mixer
    base = mixer.func if isinstance(mixer, functools.partial) else mixer
    if base is not MultiHeadSelfAttention:
        raise ValueError(
            "sequence parallelism is scoped to the MultiHeadSelfAttention "
            f"mixer (model 'vit'); mixer {getattr(base, '__name__', base)} "
            "mixes over the token dim without a pad mask and would silently "
            "mis-train on a padded stream. Run it on a data/model mesh."
        )

    seq_len = vit.patch**2 + (1 if vit.is_cls_token else 0)
    S = mesh.shape["seq"]
    pad = (-seq_len) % S
    if pad and vit.mlp_factory is not None:
        raise ValueError(
            "sequence parallelism needs pad tokens here (T="
            f"{seq_len} does not divide the seq axis {S}) and the MoE "
            "mlp_factory routes pad tokens through the Switch router, "
            "silently stealing per-example expert capacity from real "
            "tokens. Use a seq axis that divides T, or scale MoE over an "
            "'expert' mesh axis instead."
        )

    data_dim = (
        "data" if "data" in mesh.axis_names and mesh.shape["data"] > 1 else None
    )
    sharding = NamedSharding(mesh, P(data_dim, "seq", None))
    seq_only = NamedSharding(mesh, P(None, "seq", None))

    def constrain(h):
        # init_state traces the model on a tiny (2, H, W, C) sample whose
        # batch does not divide the data axis — drop the batch pin there
        # (params depend on shapes only, not layout).  Real train/eval
        # batches are divisible by construction (train/loop.py asserts).
        if data_dim is not None and h.shape[0] % mesh.shape["data"]:
            return jax.lax.with_sharding_constraint(h, seq_only)
        return jax.lax.with_sharding_constraint(h, sharding)

    kwargs = {"act_constraint": constrain, "seq_pad": pad}
    if pad:
        kwargs["mixer"] = functools.partial(mixer, valid_len=seq_len)
    return vit.clone(**kwargs)
