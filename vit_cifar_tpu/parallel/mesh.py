"""Device mesh and sharding layout.

This replaces the reference's entire distributed stack: Lightning's
DDP/DataParallel device handling (main.py:223-224) and the vendored
thread-queue SynchronizedBatchNorm machinery (hamburger/sync_bn.py,
hamburger/comm.py).  On TPU the same capability is: build one
``jax.sharding.Mesh``, shard the batch over the ``data`` axis, keep params
replicated, and let XLA insert the gradient ``psum`` over ICI when the train
step is jitted with these shardings.  Cross-replica batch-norm statistics
(sync_bn.py:51-116) collapse into a ``pmean`` over the data axis — see
``ops/norm.py``.

The mesh defaults to 1D ("data",) covering all visible devices.  A 2D
("data", "model") layout enables tensor parallelism (no reference equivalent
— SURVEY.md §2.9 notes the reference is DP-only): ``shard_params`` lays the
transformer weights out Megatron-style (Wq/Wk/Wv and the MLP's fc1
column-parallel over "model", out_project and fc2 row-parallel), and GSPMD
inserts the all-reduces over ICI from the shardings alone.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
    **extra,
) -> dict:
    """Multi-host (DCN) initialization — the TPU-native equivalent of
    Lightning's multi-node story (SURVEY §2.9/§5).

    Calls ``jax.distributed.initialize``; on Cloud TPU pods the coordinator /
    process count / process id are auto-detected from the TPU metadata, so all
    arguments may be None.  For manual clusters, pass them or set
    ``JAX_COORDINATOR_ADDRESS`` / ``JAX_NUM_PROCESSES`` / ``JAX_PROCESS_ID``.

    After this, ``jax.devices()`` spans every host's chips and the SAME mesh /
    NamedSharding code path used single-host works across hosts — DP gradient
    psums ride ICI within a pod slice and DCN across slices, with no code
    change (mesh axes are logical).  Returns process topology info.

    Idempotent: safe to call when already initialized or single-process.
    """
    kw = {}
    addr = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if addr:
        kw["coordinator_address"] = addr
    nproc = num_processes or os.environ.get("JAX_NUM_PROCESSES")
    if nproc:
        kw["num_processes"] = int(nproc)
    pid = process_id if process_id is not None else os.environ.get("JAX_PROCESS_ID")
    if pid is not None:
        kw["process_id"] = int(pid)
    try:
        jax.distributed.initialize(**kw, **extra)
    except (RuntimeError, ValueError) as e:
        # auto-detection failure raises ValueError ("coordinator_address
        # should be defined"), re-init raises RuntimeError ("distributed.
        # initialize should only be called once") — handle both.
        msg = str(e).lower()
        if "already" in msg or "only be called once" in msg:
            pass  # idempotent re-init: fine
        elif kw:
            # the caller explicitly described a cluster — failing to join it
            # must never silently degrade to a process_count=1 run
            raise
        else:
            # no explicit coordinator AND auto-detection failed.  On a real
            # pod this is a wrong-world outcome (each host would train
            # independently, ~N x slower), so be loud about it; for a plain
            # single-process run it is the expected no-op path.
            print(
                "[vit_cifar_tpu] WARNING: jax.distributed.initialize failed "
                f"with no explicit coordinator ({e}); continuing as a "
                "SINGLE process. If this is a multi-host run, set "
                "JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID."
            )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_device_count": jax.local_device_count(),
        "global_device_count": jax.device_count(),
    }


def make_mesh(mesh_shape=(), mesh_axes=("data",), devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    if not mesh_shape:
        mesh_shape = (len(devices),) + (1,) * (len(mesh_axes) - 1)
    n = int(np.prod(mesh_shape))
    if n != len(devices):
        devices = devices[:n]
    dev_array = np.asarray(devices).reshape(mesh_shape)
    return Mesh(dev_array, mesh_axes)


def batch_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard the leading (batch) dim over the data axis; rest replicated."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch dim sharded."""
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(x, batch_sharding(mesh, x.ndim)), batch
    )


def has_model_axis(mesh: Mesh) -> bool:
    return "model" in mesh.axis_names and mesh.shape["model"] > 1


def has_expert_axis(mesh: Mesh) -> bool:
    return "expert" in mesh.axis_names and mesh.shape["expert"] > 1


def _ep_spec(path_names: list[str], ndim: int) -> P:
    """Expert-parallel layout: MoE expert stacks (ops/moe.MoEMLP params
    ``expert_w1/b1/w2/b2``, leading dim = num_experts) are sharded over the
    ``expert`` axis; everything else — including the router — is replicated.
    GSPMD then partitions the dispatch/combine einsums so each chip computes
    only its experts' FFNs."""
    if path_names[-1].startswith("expert_"):
        return P("expert", *([None] * (ndim - 1)))
    return P()


def _tp_spec(path_names: list[str], ndim: int) -> P:
    """Megatron-style layout for the transformer-trunk Linears.

    Column-parallel (output features over "model"): Wq/Wk/Wv, fc1, and the
    gMLP/GatedNNMF expansion U — each device holds a head/hidden slice; the
    following elementwise ops stay local.  Row-parallel (input features over
    "model"): out_project, fc2, and the contraction V — their matmul
    contracts the sharded dim, so GSPMD emits one psum per block, exactly
    the Megatron schedule.  Everything else (LayerNorm, cls, pos_emb,
    spatial-gating weights, the classifier) is replicated.

    Covered mixers: ViT/AFT/HamburgerAttention (Wq/Wk/Wv/out_project),
    the MLP block (fc1/fc2), gMLP/wgMLP/linear and GatedNNMF (U/V).
    ``shard_params`` raises for models where nothing matches (CNNs, pure
    hamburger, AE mixers) instead of silently replicating.
    """
    col = ("Wq", "Wk", "Wv", "fc1", "U")
    row = ("out_project", "fc2", "V")
    if any(c in path_names for c in col):
        if path_names[-1] == "kernel" and ndim == 2:
            return P(None, "model")
        if path_names[-1] == "bias" and ndim == 1:
            return P("model")
    if any(r in path_names for r in row):
        if path_names[-1] == "kernel" and ndim == 2:
            return P("model", None)
    return P()


def shard_params(mesh: Mesh, params):
    """Device-put a param tree with tensor-parallel layout over "model".

    No-op (replication) when the mesh has no model axis.  Works on the
    TrainState's params; optimizer state built from these params inherits the
    layout through jit's sharding propagation.
    """

    tp = has_model_axis(mesh)
    ep = has_expert_axis(mesh)
    n_sharded = n_ep = 0

    def put(path, p):
        nonlocal n_sharded, n_ep
        names = [str(getattr(k, "key", getattr(k, "name", k))) for k in path]
        spec = _tp_spec(names, p.ndim) if tp else P()
        if ep and spec == P():
            spec = _ep_spec(names, p.ndim)
            if spec != P():
                n_ep += 1
        if spec != P():
            n_sharded += 1
        return jax.device_put(p, NamedSharding(mesh, spec))

    out = jax.tree_util.tree_map_with_path(put, params)
    if tp and n_sharded == 0:
        raise ValueError(
            "tensor parallelism requested (mesh 'model' axis > 1) but no "
            "parameter of this model matches the TP layout table "
            "(parallel/mesh._tp_spec covers ViT/AFT/Hamburger attention, the "
            "MLP block, and gMLP/GatedNNMF U/V). Silently replicating would "
            "waste the model-axis chips — run this model on a data-only mesh."
        )
    if ep and n_ep == 0:
        raise ValueError(
            "expert parallelism requested (mesh 'expert' axis > 1) but the "
            "model has no MoE expert stacks (--moe-experts > 0 builds them, "
            "ops/moe.MoEMLP). Silently replicating would waste the "
            "expert-axis chips — run this model on a data-only mesh."
        )
    return out
