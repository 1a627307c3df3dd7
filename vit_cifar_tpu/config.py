"""Typed configuration for the whole framework.

The reference threads a single argparse ``Namespace`` with ~70 flags through
every constructor (``/root/reference/main.py:12-167``).  Here the equivalent is
one frozen dataclass: every flag has the same name (dashes -> underscores), the
same default, and the same semantics, but it is typed, hashable (so it can be
a static argument to ``jax.jit``), and serialises to/from JSON for
checkpointing.

Derived fields that the reference mutates onto ``args`` at startup
(``main.py:174-184``: ``num_classes``, ``seq_len``) are computed properties
here instead.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
from dataclasses import dataclass, field
from typing import Any

# Dataset constants (reference: utils.py:445-503).
DATASET_INFO: dict[str, dict[str, Any]] = {
    "c10": {
        "num_classes": 10,
        "in_c": 3,
        "size": 32,
        "padding": 4,
        "mean": (0.4914, 0.4822, 0.4465),
        "std": (0.2470, 0.2435, 0.2616),
    },
    "c100": {
        "num_classes": 100,
        "in_c": 3,
        "size": 32,
        "padding": 4,
        "mean": (0.5071, 0.4867, 0.4408),
        "std": (0.2675, 0.2565, 0.2761),
    },
    "svhn": {
        "num_classes": 10,
        "in_c": 3,
        "size": 32,
        "padding": 4,
        "mean": (0.4377, 0.4438, 0.4728),
        "std": (0.1980, 0.2010, 0.1970),
    },
}

MODEL_NAMES = (
    "vit",
    "aftfull",
    "aftsimple",
    "hamburger",
    "hamburger_attention",
    "gnnmf_ham",
    "gnnmf_sbs",
    "gnnmf_sbsed",
    "gmlp",
    "wgmlp",
    "lgcnn",
    "wlgcnn",
    "ae",
    "ae_baseline",
    "linear",
    # in the reference factory (utils.py:323) but not its CLI choices;
    # exposed here since the working equivalent actually runs
    "cnn_baseline",
)


@dataclass(frozen=True)
class Config:
    """One typed config object; field-for-field parity with main.py:12-167."""

    # -- dataset / loader -------------------------------------------------
    dataset: str = "c10"  # c10 | c100 | svhn
    model_name: str = "ae"  # reference default is the AEViT (main.py:22)
    semi_supervised: bool = False
    patch: int = 8  # patches per row/col
    batch_size: int = 128
    eval_batch_size: int = 256
    shuffle: bool = True
    download_data: bool = False  # no egress in this env; kept for CLI parity
    data_dir: str = "data"  # extra field: where dataset archives live
    synthetic_data: bool = False  # extra field: force synthetic data

    # -- optimizer / schedule ---------------------------------------------
    optimizer: str = "adam"  # adam | sgd | madam
    lr: float = 1e-3
    lr_nnmf: float = 1e-2
    min_lr: float = 1e-5
    beta1: float = 0.9
    beta2: float = 0.999
    max_epochs: int = 100
    weight_decay: float = 5e-5
    warmup_epoch: int = 5
    # reference precision flag is "16-mixed"/"32" (main.py:58); on TPU the
    # native mixed mode is bf16 activations + fp32 params.
    precision: str = "bf16-mixed"  # bf16-mixed | 32
    matmul_precision: str = "medium"  # medium | high | highest

    # -- criterion / augmentation ------------------------------------------
    criterion: str = "ce"  # ce | aece
    label_smoothing: bool = False
    smoothing: float = 0.1
    autoaugment: bool = False
    rcpaste: bool = False
    cutmix: bool = False
    mixup: bool = False

    # -- architecture ------------------------------------------------------
    dropout: float = 0.0
    head: int = 12
    num_layers: int = 1  # reference default (main.py:89); README recipe uses 7
    hidden: int = 384
    ffn_features: int = 384 * 2
    mlp_hidden: int = 384
    use_encoder_mlp: bool = True
    kernel_size: int = 1  # lgcnn conv kernel
    is_cls_token: bool = True
    pos_emb: bool = True
    query: bool = True  # AFT sigmoid query gate
    factorize: bool = False  # AFTFull factorized position bias
    factorization_dimension: int = 32
    cnn_normalization: str = "layer_norm"

    # -- hamburger / matrix decomposition -----------------------------------
    burger_mode: str = "V1"  # V1 | V2 | V2+ | Gated
    depthwise: bool = False
    md_iter: int = 7
    train_md_bases: bool = False

    # -- NNMF ----------------------------------------------------------------
    local_learning: bool = False
    use_nnmf_layers: bool = False
    nnmf_local_learning: bool = False
    nnmf_scale_grade: bool = False
    nnmf_learning_rate_threshold_w: float = 1e-3

    # -- autoencoder attention ------------------------------------------------
    unsupervised_steps: int = 0
    mask_type: str = "zeros"  # zeros | random
    chunk: bool = False
    legacy_heads: bool = False
    ae_type: str = "simple"  # simple | transpose | heads | 2d
    ae_hidden_features: int = 128
    ae_hidden_seq_len: int = 8
    order_2d: str = "sfsf"  # sfsf | sffs
    AE_transpose: bool = False
    aece_l1_regularization: float = 0.0
    aece_l1_outputs: bool = False

    # -- run control / logging -----------------------------------------------
    dry_run: bool = False
    benchmark: bool = True
    seed: int = 2045  # singularity is near (main.py:150)
    project_name: str = "Rethinking-Transformers"
    tags: str = ""
    log_gradients: bool = False
    log_gradients_interval: int = 250
    log_weights: bool = True
    model_summary_depth: int = -1
    comet_api_key: str = ""
    log_dir: str = "logs"
    ckpt_dir: str = "models"

    # not a CLI flag in the reference either — run_model.py:45-47 flips the
    # module attribute post-hoc; here it is part of the (immutable) config
    save_attn_map: bool = False
    profile_dir: str = ""  # jax.profiler trace output (TPU equiv of SURVEY §5)
    # resume training from a checkpoint dir (Lightning embeds optimizer and
    # scheduler state in its checkpoints, reference main.py:234-236; ours
    # carries the full TrainState so a killed run continues seamlessly)
    resume: str = ""

    # -- TPU-native knobs (no reference equivalent) ----------------------------
    mesh_shape: tuple[int, ...] = ()  # () -> all devices on the data axis
    mesh_axes: tuple[str, ...] = ("data",)
    # GPipe microbatches per step when the mesh has a 'pipe' axis
    # (parallel/pipeline.py); 0 -> one microbatch per stage
    pipeline_microbatches: int = 0
    # Mixture-of-Experts encoder MLP (ops/moe.py): 0 -> the reference's dense
    # MLP; >0 replaces it with that many Switch-routed experts.  Shardable
    # over an 'expert' mesh axis (expert parallelism).
    moe_experts: int = 0
    moe_capacity_factor: float = 1.25
    # weight on the Switch load-balance aux loss (mean over layers)
    moe_aux_weight: float = 0.01
    # multi-host (DCN): jax.distributed.initialize before building the mesh —
    # the TPU-native equivalent of Lightning's multi-node trainer (SURVEY §2.9)
    multihost: bool = False
    # semi-supervised epoch pacing: the reference's CombinedLoader paces an
    # epoch by the LARGER (unlabeled) loader (utils.py:419-436), so the 4,000
    # labeled images repeat ~11x per epoch (reshuffled each pass).  False = one
    # pass over the labeled split per epoch (10x fewer steps, same curve shape).
    ss_combined_epoch: bool = True
    donate_buffers: bool = True
    remat: bool = False  # jax.checkpoint the encoder stack
    # Pallas attention kernels (ops/pallas/attention.py) for the 'vit' mixer.
    # use_pallas routes by the measured policy (einsum below head_dim 128,
    # fused while its block fits VMEM, tiled flash beyond — see
    # docs/PERFORMANCE.md); pallas_kernel forces one of
    # einsum|fused|flash for benchmarking ('' = route automatically).
    use_pallas: bool = False
    pallas_kernel: str = ""
    # pre-augment the whole dataset once per epoch instead of inside the
    # train step (same distribution; trades step work for an epoch-level pass)
    preaugment_epoch: bool = False
    # skip optimizer updates on non-finite loss/grads (torch-AMP-style inf
    # skip; the reference's AE update has the same guard, layers.py:1071-1072)
    nonfinite_guard: bool = True
    device_data: bool = True  # keep the full dataset resident in HBM
    # persistent XLA compilation cache (works through the axon relay:
    # measured 20.8 s -> 3.9 s for the flagship train-step compile on a warm
    # cache).  Empty string disables.
    compile_cache_dir: str = "~/.cache/vit_cifar_tpu/xla"
    # AEAttentionHeads: rows of the eye-masked (B,T,h*T,F/h) tensor built per
    # chunk (0 = materialize fully, the reference layout layers.py:862-877)
    ae_mask_chunk: int = 16
    # run adam/sgd on one raveled param vector (bit-identical updates, ~60x
    # faster optimizer kernels; see train/optim.flatten_transform)
    flat_optimizer: bool = True

    # ------------------------------------------------------------------ #
    @property
    def num_classes(self) -> int:
        return DATASET_INFO[self.dataset]["num_classes"]

    @property
    def in_c(self) -> int:
        return DATASET_INFO[self.dataset]["in_c"]

    @property
    def img_size(self) -> int:
        return DATASET_INFO[self.dataset]["size"]

    @property
    def padding(self) -> int:
        return DATASET_INFO[self.dataset]["padding"]

    @property
    def mean(self) -> tuple[float, ...]:
        return DATASET_INFO[self.dataset]["mean"]

    @property
    def std(self) -> tuple[float, ...]:
        return DATASET_INFO[self.dataset]["std"]

    @property
    def seq_len(self) -> int:
        # main.py:184
        return self.patch**2 + 1 if self.is_cls_token else self.patch**2

    @property
    def patch_size(self) -> int:
        return self.img_size // self.patch

    @property
    def compute_dtype(self):
        import jax.numpy as jnp

        return jnp.bfloat16 if self.precision.startswith("bf16") else jnp.float32

    # ------------------------------------------------------------------ #
    def replace(self, **kw) -> "Config":
        return dataclasses.replace(self, **kw)

    def to_json(self) -> str:
        d = dataclasses.asdict(self)
        return json.dumps(d, sort_keys=True)

    @classmethod
    def from_json(cls, s: str) -> "Config":
        d = json.loads(s)
        # tolerate configs saved by older/newer versions
        names = {f.name for f in dataclasses.fields(cls)}
        d = {k: v for k, v in d.items() if k in names}
        for k in ("mesh_shape", "mesh_axes"):
            if k in d and isinstance(d[k], list):
                d[k] = tuple(d[k])
        return cls(**d)


def _add_bool_flag(p: argparse.ArgumentParser, name: str, default: bool, dest: str | None = None, inverse: str | None = None):
    """store_true flag, or an inverse store_false flag (e.g. --off-cls-token)."""
    if inverse is not None:
        p.add_argument(inverse, action="store_false", dest=dest or name.replace("-", "_"), default=default)
    else:
        p.add_argument(f"--{name}", action="store_true", dest=dest or name.replace("-", "_"), default=default)


def build_parser() -> argparse.ArgumentParser:
    """CLI with the same surface as the reference (main.py:12-167)."""
    p = argparse.ArgumentParser(description="TPU-native ViT-CIFAR framework")
    d = Config()

    p.add_argument("--comet-api-key", default=d.comet_api_key, dest="comet_api_key")
    p.add_argument("--dataset", default=d.dataset, choices=list(DATASET_INFO))
    p.add_argument("--model-name", default=d.model_name, choices=list(MODEL_NAMES))
    _add_bool_flag(p, "semi-supervised", d.semi_supervised)
    p.add_argument("--patch", default=d.patch, type=int)
    p.add_argument("--batch-size", default=d.batch_size, type=int)
    p.add_argument("--eval-batch-size", default=d.eval_batch_size, type=int)
    p.add_argument("--optimizer", default=d.optimizer, choices=["adam", "sgd", "madam"])
    p.add_argument("--lr", default=d.lr, type=float)
    p.add_argument("--lr-nnmf", default=d.lr_nnmf, type=float)
    p.add_argument("--min-lr", default=d.min_lr, type=float)
    p.add_argument("--beta1", default=d.beta1, type=float)
    p.add_argument("--beta2", default=d.beta2, type=float)
    p.add_argument("--off-benchmark", action="store_false", dest="benchmark", default=True)
    p.add_argument("--max-epochs", default=d.max_epochs, type=int)
    _add_bool_flag(p, "dry-run", d.dry_run)
    p.add_argument("--weight-decay", default=d.weight_decay, type=float)
    p.add_argument("--warmup-epoch", default=d.warmup_epoch, type=int)
    p.add_argument("--precision", default=d.precision, type=str)
    _add_bool_flag(p, "autoaugment", d.autoaugment)
    p.add_argument("--criterion", default=d.criterion, choices=["ce", "aece"])
    _add_bool_flag(p, "label-smoothing", d.label_smoothing)
    p.add_argument("--smoothing", default=d.smoothing, type=float)
    _add_bool_flag(p, "rcpaste", d.rcpaste)
    _add_bool_flag(p, "cutmix", d.cutmix)
    _add_bool_flag(p, "mixup", d.mixup)
    _add_bool_flag(p, "depthwise", d.depthwise)
    p.add_argument("--md-iter", default=d.md_iter, type=int)
    _add_bool_flag(p, "train-md-bases", d.train_md_bases)
    _add_bool_flag(p, "local-learning", d.local_learning)
    p.add_argument("--dropout", default=d.dropout, type=float)
    p.add_argument("--head", default=d.head, type=int)
    p.add_argument("--num-layers", default=d.num_layers, type=int)
    p.add_argument("--hidden", default=d.hidden, type=int)
    p.add_argument("--ffn-features", default=d.ffn_features, type=int)
    p.add_argument("--mlp-hidden", default=d.mlp_hidden, type=int)
    p.add_argument("--no-encoder-mlp", action="store_false", dest="use_encoder_mlp", default=True)
    p.add_argument("--kernel-size", default=d.kernel_size, type=int)
    p.add_argument("--unsupervised-steps", default=d.unsupervised_steps, type=int)
    p.add_argument("--mask-type", default=d.mask_type, choices=["zeros", "random"])
    _add_bool_flag(p, "use-nnmf-layers", d.use_nnmf_layers)
    _add_bool_flag(p, "nnmf-local-learning", d.nnmf_local_learning)
    _add_bool_flag(p, "nnmf-scale-grade", d.nnmf_scale_grade)
    _add_bool_flag(p, "chunk", d.chunk)
    _add_bool_flag(p, "legacy-heads", d.legacy_heads)
    p.add_argument("--ae-type", default=d.ae_type, choices=["simple", "transpose", "heads", "2d"])
    p.add_argument("--ae-hidden-features", default=d.ae_hidden_features, type=int)
    p.add_argument("--ae-hidden-seq-len", default=d.ae_hidden_seq_len, type=int)
    p.add_argument("--order-2d", default=d.order_2d, choices=["sfsf", "sffs"], dest="order_2d")
    p.add_argument("--ae-transpose", action="store_true", dest="AE_transpose", default=False)
    p.add_argument("--cnn-normalization", default=d.cnn_normalization, type=str)
    _add_bool_flag(p, "factorize", d.factorize)
    p.add_argument("--no-query", action="store_false", dest="query", default=True)
    p.add_argument("--no-pos-emb", action="store_false", dest="pos_emb", default=True)
    p.add_argument("--burger-mode", default=d.burger_mode, choices=["V1", "V2", "V2+", "Gated"])
    p.add_argument("--factorization-dimension", default=d.factorization_dimension, type=int)
    p.add_argument("--off-cls-token", action="store_false", dest="is_cls_token", default=True)
    p.add_argument("--matmul-precision", default=d.matmul_precision, choices=["medium", "high", "highest"])
    _add_bool_flag(p, "log-gradients", d.log_gradients)
    p.add_argument("--log-gradients-interval", default=d.log_gradients_interval, type=int)
    p.add_argument("--no-log-weights", action="store_false", dest="log_weights", default=True)
    p.add_argument("--model-summary-depth", default=d.model_summary_depth, type=int)
    p.add_argument("--tags", default=d.tags, type=str)
    p.add_argument("--seed", default=d.seed, type=int)
    p.add_argument("--project-name", default=d.project_name, type=str)
    p.add_argument("--nnmf_learning_rate_threshold_w", default=d.nnmf_learning_rate_threshold_w, type=float)
    p.add_argument("--aece_l1_regularization", default=d.aece_l1_regularization, type=float)
    _add_bool_flag(p, "aece_l1_outputs", d.aece_l1_outputs)
    p.add_argument("--no-pin-memory", action="store_false", dest="pin_memory", default=True)
    p.add_argument("--no-shuffle", action="store_false", dest="shuffle", default=True)
    p.add_argument("--allow-download", action="store_true", dest="download_data", default=False)

    # TPU-native extras
    p.add_argument("--resume", default=d.resume, type=str,
                   help="checkpoint dir to resume training from")
    p.add_argument("--profile-dir", default=d.profile_dir, type=str)
    p.add_argument("--data-dir", default=d.data_dir, type=str)
    _add_bool_flag(p, "synthetic-data", d.synthetic_data)
    p.add_argument("--mesh-shape", default="", type=str, help="comma ints, e.g. '8' or '4,2'")
    p.add_argument("--mesh-axes", default=",".join(d.mesh_axes), type=str)
    p.add_argument("--pipeline-microbatches", default=d.pipeline_microbatches,
                   type=int, help="GPipe microbatches when the mesh has a "
                   "'pipe' axis; 0 = one per stage")
    p.add_argument("--moe-experts", default=d.moe_experts, type=int,
                   help="replace the encoder MLP with this many Switch-"
                   "routed experts (0 = dense reference MLP)")
    p.add_argument("--moe-capacity-factor", default=d.moe_capacity_factor,
                   type=float)
    p.add_argument("--moe-aux-weight", default=d.moe_aux_weight, type=float)
    _add_bool_flag(p, "multihost", d.multihost)
    p.add_argument("--no-ss-combined-epoch", action="store_false",
                   dest="ss_combined_epoch", default=True)
    p.add_argument("--no-donate", action="store_false", dest="donate_buffers", default=True)
    _add_bool_flag(p, "remat", d.remat)
    _add_bool_flag(p, "use-pallas", d.use_pallas)
    p.add_argument("--pallas-kernel", default=d.pallas_kernel,
                   choices=["", "einsum", "fused", "flash"],
                   help="force an attention kernel ('' = measured-policy "
                        "routing when --use-pallas)")
    p.add_argument("--no-device-data", action="store_false", dest="device_data", default=True)
    p.add_argument("--ae-mask-chunk", default=d.ae_mask_chunk, type=int,
                   help="AEAttentionHeads masked-row chunk size (0 = materialize)")
    p.add_argument("--compile-cache-dir", default=d.compile_cache_dir, type=str,
                   help="persistent XLA compilation cache ('' disables)")
    p.add_argument("--no-flat-optimizer", action="store_false",
                   dest="flat_optimizer", default=True)
    _add_bool_flag(p, "preaugment-epoch", d.preaugment_epoch)
    p.add_argument("--log-dir", default=d.log_dir, type=str)
    p.add_argument("--ckpt-dir", default=d.ckpt_dir, type=str)
    return p


def config_from_args(argv: list[str] | None = None) -> Config:
    ns = build_parser().parse_args(argv)
    d = vars(ns).copy()
    d.pop("pin_memory", None)  # host-loader knob; meaningless with HBM-resident data
    d["mesh_shape"] = tuple(int(x) for x in d["mesh_shape"].split(",") if x) if d["mesh_shape"] else ()
    d["mesh_axes"] = tuple(x for x in d["mesh_axes"].split(",") if x)
    names = {f.name for f in dataclasses.fields(Config)}
    d = {k: v for k, v in d.items() if k in names}
    return Config(**d)
