"""Pipeline parallelism (GPipe) for the ViT trunk over a ``pipe`` mesh axis.

No reference equivalent: the reference's distributed story is Lightning DDP
(reference main.py:223-224), i.e. data parallelism only — SURVEY.md §2.9.
This module extends the mesh vocabulary beyond the ``data`` (DP) and
``model`` (TP, parallel/mesh.py) axes with a third, ``pipe``: the encoder
stack is cut into S contiguous stages, each stage's blocks live on one
mesh slice, and microbatches stream through the stages GPipe-style.

TPU-native design
-----------------
* The S stages run as ONE SPMD program under ``jax.shard_map``: every device
  executes the same tick loop, selects its role with ``lax.axis_index
  ("pipe")``, and hands activations to the next stage with a single
  ``lax.ppermute`` per tick — a neighbor hop that rides ICI.
* The per-stage block parameters are the standard flax tree's ``enc{i}``
  subtrees stacked on a leading layer dim and split over ``pipe`` — the
  checkpoint/optimizer layout is untouched, so resume/TP/DP all compose.
* The tick loop has a static trip count (M + S - 1) and is Python-unrolled:
  fully differentiable, and the reversed (backward) schedule falls out of
  jax.grad through ``ppermute`` (its transpose is the inverse permutation),
  giving the classic GPipe forward-then-backward wave with no hand-written
  schedule.
* Composes with data parallelism: on a ("data", "pipe") mesh the batch is
  split over ``data`` and each data-shard runs its own pipeline; gradient
  psums over ``data`` are inserted by shard_map's transpose as usual.

Scale intent: at the parity scale (7 layers, 6.3M params) pipelining is a
validated capability, not a throughput win — one v5e chip holds the whole
model thousands of times over, and DP is strictly better until the model
stops fitting.  The capability exists for the regime the mesh design targets
(deeper trunks / bigger hidden sizes), and its numerics are pinned against
the sequential trunk by tests/test_pipeline.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models.vit import ViT


def has_pipe_axis(mesh) -> bool:
    return (
        mesh is not None
        and "pipe" in mesh.axis_names
        and mesh.shape["pipe"] > 1
    )


def stack_block_params(params, num_layers: int):
    """Stack the ``enc0..enc{L-1}`` subtrees on a new leading layer dim.

    Returns the stacked tree only; the embedding/head subtrees stay where
    they are in the original tree (the caller keeps using them directly).
    """
    blocks = [params[f"enc{i}"] for i in range(num_layers)]
    return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *blocks)


class PipelineViT:
    """A drop-in ``apply``/``init`` wrapper that runs a ``ViT``'s encoder
    stack pipelined over the mesh's ``pipe`` axis.

    The parameter tree, init, checkpoints, and every debug path are the
    inner module's own; only the hot ``apply`` (no mutable collections, no
    capture kwargs — the exact call the train/eval steps make) switches to
    the GPipe execution.  Anything else (nn.tabulate, capture_intermediates,
    mutable BN state) delegates to the sequential module, which is
    numerically identical.
    """

    def __init__(self, vit: ViT, mesh: Mesh, microbatches: int = 0):
        if not isinstance(vit, ViT):
            raise ValueError(
                "pipeline parallelism covers the ViT trunk "
                f"(models/vit.ViT); got {type(vit).__name__}. CNN models "
                "have no layer stack to cut into stages — run them on a "
                "data-only mesh."
            )
        if vit.dropout != 0.0:
            raise ValueError(
                "pipeline parallelism requires dropout=0 (per-stage rng "
                "folding for stochastic layers is not implemented; the "
                "README recipe uses dropout 0)."
            )
        if vit.mlp_factory is not None:
            raise ValueError(
                "pipeline parallelism does not compose with the MoE "
                "mlp_factory: the staged block rebuild would drop the sown "
                "Switch balance loss silently. Scale MoE over an 'expert' "
                "mesh axis instead (parallel/mesh._ep_spec)."
            )
        # mixers that draw the 'mask' rng per call (hamburger rand_init MD
        # bases, AE random masks) would silently fall back to a FIXED
        # PRNGKey(0) inside the staged block rebuild (ops/hamburger.py
        # has_rng fallback) while the sequential trunk draws fresh per-step
        # randomness — numerical divergence with no error.  Reject loudly,
        # mirroring the dropout/MoE guards.
        import functools as _ft

        mixer = vit.mixer
        base = mixer.func if isinstance(mixer, _ft.partial) else mixer
        kw = dict(getattr(mixer, "keywords", None) or {})
        base_name = getattr(base, "__name__", str(base))
        draws_mask_rng = (
            (base_name in ("Hamburger", "HamburgerAttention")
             and kw.get("rand_init", True))
            # GatedNNMF's "ham" variant wraps the same burger machinery with
            # rand_init = not train_bases (ops/gated_nnmf.py)
            or (base_name == "GatedNNMF" and kw.get("nnmf_type") == "ham"
                and not kw.get("train_bases", False))
            or kw.get("mask_type") == "random"
        )
        if draws_mask_rng:
            raise ValueError(
                f"pipeline parallelism does not support the {base_name} "
                "mixer with per-step random state (rand_init MD bases / "
                "random AE masks): the pipelined apply does not thread the "
                "'mask' rng, so the mixer would silently reuse a fixed key "
                "every step. Use --train-md-bases (persistent EMA bases) or "
                "run this model on a data-only mesh."
            )
        if not has_pipe_axis(mesh):
            raise ValueError("mesh has no 'pipe' axis > 1")
        stages = mesh.shape["pipe"]
        if vit.num_layers % stages != 0:
            raise ValueError(
                f"num_layers={vit.num_layers} must divide evenly into "
                f"{stages} pipeline stages"
            )
        object.__setattr__(self, "inner", vit)
        object.__setattr__(self, "mesh", mesh)
        object.__setattr__(self, "microbatches", microbatches or stages)

    def init(self, *args, **kwargs):
        return self.inner.init(*args, **kwargs)

    def __getattr__(self, name):
        return getattr(object.__getattribute__(self, "inner"), name)

    def apply(self, variables, x, *, deterministic: bool = True, rngs=None,
              mutable=None, **kwargs):
        # Debug/stateful paths (capture_intermediates, mutable collections)
        # stay on the sequential module — same math, no pipelining.
        if kwargs or mutable:
            return self.inner.apply(
                variables, x, deterministic=deterministic, rngs=rngs,
                mutable=mutable, **kwargs,
            )
        return pipeline_forward(
            self.inner, self.mesh, self.microbatches,
            variables["params"], x, deterministic,
        )


def pipeline_forward(vit: ViT, mesh: Mesh, microbatches: int, params, x,
                     deterministic: bool = True):
    """The ViT forward with the encoder stack executed GPipe-style.

    Embedding and head run outside the shard_map (replicated over ``pipe``,
    sharded over ``data`` when the batch is — they are <2% of the FLOPs);
    the block stack runs inside it.  Math per example is identical to
    ``ViT.__call__`` (models/vit.py) — asserted by tests/test_pipeline.py.
    """
    import flax.linen as nn

    from ..ops.init import TorchLinear
    from ..ops.patchify import to_words

    dtype = vit.dtype
    out = to_words(x.astype(dtype), vit.patch)
    out = TorchLinear(vit.hidden, dtype=dtype, name="emb").apply(
        {"params": params["emb"]}, out
    )
    if vit.is_cls_token:
        cls = jnp.broadcast_to(
            params["cls_token"].astype(dtype), (out.shape[0], 1, vit.hidden)
        )
        out = jnp.concatenate([cls, out], axis=1)
    if vit.pos_emb:
        out = out + params["pos_emb"].astype(dtype)

    stacked = stack_block_params(params, vit.num_layers)
    out = _gpipe_blocks(vit, mesh, microbatches, stacked, out, deterministic)

    out = out[:, 0] if vit.is_cls_token else out.mean(axis=1)
    out = nn.LayerNorm(epsilon=1e-5, dtype=dtype, name="fc_norm").apply(
        {"params": params["fc_norm"]}, out
    )
    return TorchLinear(vit.num_classes, dtype=dtype, name="fc").apply(
        {"params": params["fc"]}, out
    )


def _gpipe_blocks(vit: ViT, mesh: Mesh, M: int, stacked, h_all,
                  deterministic: bool):
    """Run the stacked encoder blocks over the ``pipe`` axis.

    Schedule: T = M + S - 1 ticks.  At tick t stage 0 ingests microbatch t
    (zeros once the feed is exhausted — the GPipe drain bubble), every stage
    applies its L/S blocks to its in-flight microbatch, the last stage banks
    its result, and one ``ppermute`` advances the wave.  Microbatch m exits
    at tick m + S - 1.
    """
    from ..ops.common import EncoderBlock

    S = mesh.shape["pipe"]
    layers_per_stage = vit.num_layers // S
    n_data = mesh.shape.get("data", 1)
    B, T, F = h_all.shape
    b_local = B // max(n_data, 1)
    if b_local % M != 0:
        raise ValueError(
            f"per-data-shard batch {b_local} must divide into "
            f"{M} microbatches"
        )

    block = EncoderBlock(
        features=vit.hidden,
        mlp_hidden=vit.mlp_hidden,
        mixer=vit.mixer,
        use_mlp=vit.use_encoder_mlp,
        dropout=0.0,
        dtype=vit.dtype,
    )

    def block_apply(p, h):
        return block.apply({"params": p}, h, deterministic=deterministic)

    if vit.remat:
        block_apply = jax.checkpoint(block_apply)

    data_dim = "data" if "data" in mesh.axis_names and n_data > 1 else None
    batch_spec = P(data_dim, None, None)
    param_specs = jax.tree_util.tree_map(
        lambda a: P("pipe", *([None] * (a.ndim - 1))), stacked
    )
    # every mesh axis other than data/pipe/model (e.g. seq/expert) must be
    # size 1 for this entry point
    for ax in mesh.axis_names:
        if ax not in ("data", "pipe", "model") and mesh.shape[ax] > 1:
            raise ValueError(
                f"pipeline_forward supports (data, pipe[, model]) meshes; "
                f"axis '{ax}' has size {mesh.shape[ax]}"
            )

    # Megatron-within-stage (dp x pp x tp): the 'model' axis stays AUTO in
    # the shard_map (jax.shard_map's axis_names marks data/pipe as manual;
    # GSPMD partitions everything else), so pinning the stacked per-stage
    # weights to the standard TP layout (parallel/mesh._tp_spec, shifted one
    # dim for the stacked layer axis) makes XLA run the usual column/row
    # parallel schedule INSIDE each pipeline stage — the canonical
    # tp-inside-pp composition, with no hand-written collectives.
    tp = "model" in mesh.axis_names and mesh.shape["model"] > 1
    if tp:
        from .mesh import _tp_spec

        def stacked_tp_sharding(path, a):
            names = [
                str(getattr(k, "key", getattr(k, "name", k))) for k in path
            ]
            return NamedSharding(mesh, P("pipe", *_tp_spec(names, a.ndim - 1)))

        stacked = jax.tree_util.tree_map_with_path(
            lambda path, a: jax.lax.with_sharding_constraint(
                a, stacked_tp_sharding(path, a)
            ),
            stacked,
        )

    def stage_fn(local_params, h_local):
        s = jax.lax.axis_index("pipe")
        mb = h_local.shape[0] // M
        xs = h_local.reshape(M, mb, T, F)
        zeros_mb = jnp.zeros((mb, T, F), h_local.dtype)
        arriving = zeros_mb
        outs = []
        for t in range(M + S - 1):
            feed = xs[t] if t < M else zeros_mb
            cur = jnp.where(s == 0, feed, arriving)
            for j in range(layers_per_stage):
                pj = jax.tree_util.tree_map(lambda a: a[j], local_params)
                cur = block_apply(pj, cur)
            outs.append(jnp.where(s == S - 1, cur, jnp.zeros_like(cur)))
            arriving = jax.lax.ppermute(
                cur, "pipe", [(i, (i + 1) % S) for i in range(S)]
            )
        # microbatch m exits the last stage at tick m + S - 1; psum
        # replicates it across the pipe axis (every other stage contributed
        # zeros), so the head below runs on a pipe-invariant value.
        out = jnp.concatenate(outs[S - 1 :], axis=0)
        return jax.lax.psum(out, "pipe")

    manual = frozenset(ax for ax in mesh.axis_names if ax in ("data", "pipe"))
    fn = jax.shard_map(
        stage_fn,
        mesh=mesh,
        in_specs=(param_specs, batch_spec),
        out_specs=batch_spec,
        axis_names=manual,
    )
    return fn(stacked, h_all)
