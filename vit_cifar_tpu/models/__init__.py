"""Model factory: one ViT trunk + a mixer registry.

Reference: ``utils.get_model`` (utils.py:66-334) builds 13 model classes that
all subclass ``ViT`` and swap ``self.enc``; here every variant is one registry
entry that injects a token-mixer factory into the shared trunk
(``models/vit.py``), plus the two CNN models (``models/cnn.py``).

``get_model(cfg) -> (model, can_learn_unsupervised)`` mirrors the reference's
return contract (utils.py:67, 279: only the AEViT can learn unsupervised).

Deliberate deviations from reference bugs (each documented at the site):
  * aft models: the reference forwards ``args.head`` into AFTFull/AFTSimple,
    which raise ``NotImplementedError`` for head > 1 (layers.py:128-129,
    183-184) — i.e. every default run (--head 12) crashes.  We pin head=1 (the
    paper's setting) so the models actually run.
  * aftsimple never receives ``query`` (layers.py:233): its sigmoid gate is
    always on regardless of --no-query.  Replicated.
  * ``ae_baseline`` and ``cnn_baseline`` crash in the reference (utils.py:293
    passes nonexistent ``args.ae_hidden``; cnn.py:13,17 reference undefined
    names); working equivalents are provided.
"""

from __future__ import annotations

import functools

from ..config import Config
from ..ops.ae_attention import AEAttention, AEAttentionHeads, BaselineAEAttention
from ..ops.aft import AFT
from ..ops.attention import MultiHeadSelfAttention
from ..ops.autoencoders import NNMFParams
from ..ops.gated_nnmf import GatedNNMF
from ..ops.gmlp import GatedMLP, LinearAttention, WeightGatedMLP
from ..ops.hamburger import Hamburger, HamburgerAttention
from .cnn import BaselineCNN, LocalGlobalCNN
from .vit import ViT

AFT_MODES = {"aftfull": "full", "aftsimple": "simple"}


def nnmf_params_from_cfg(cfg: Config) -> NNMFParams:
    """The reference's ``_nnmf_params`` dict (network.py:19-33) from the config."""
    return NNMFParams(
        number_of_iterations=cfg.md_iter,
        w_trainable=cfg.train_md_bases,
        local_learning=cfg.nnmf_local_learning,
        keep_last_grad_scale=cfg.nnmf_scale_grade,
        disable_scale_grade=not cfg.nnmf_scale_grade,
    )


def _make_mixer(cfg: Config, dtype):
    """Mixer factory for the trunk; mirrors the per-model encoder dispatch
    (utils.py:66-334 + layers.py:206-240 et al.)."""
    name = cfg.model_name
    h = cfg.hidden

    if name == "vit":
        return functools.partial(
            MultiHeadSelfAttention,
            features=h,
            head=cfg.head,
            dropout=cfg.dropout,
            save_attn_map=cfg.save_attn_map,
            # Pallas attention kernels, routed by the measured policy
            # (ops/pallas/attention.select_kernel); no reference equivalent
            use_pallas=cfg.use_pallas,
            pallas_kernel=cfg.pallas_kernel or None,
            dtype=dtype,
        )
    if name in AFT_MODES:
        return functools.partial(
            AFT,
            features=h,
            seq_len=cfg.seq_len,
            mode=AFT_MODES[name],
            factorize=cfg.factorize,
            factorization_dimension=cfg.factorization_dimension,
            head=1,  # pinned: reference AFT crashes for head>1 (layers.py:128)
            dropout=cfg.dropout,
            # the encoder dispatch never forwards --no-query to AFTSimple
            # (layers.py:233): its gate is always on
            query=cfg.query if name == "aftfull" else True,
            dtype=dtype,
        )
    if name == "hamburger":
        # the reference wrapper passes only version/in_c/depthwise
        # (layers.py:243-258); MD steps stay at the burger defaults (6/7).
        # --train-md-bases additionally enables the persistent EMA bases
        # (RAND_INIT=False) exactly as GatedNNMFViT plumbs train_bases
        # (vit.py:376-380) — the reference's hamburger CLI can't reach that
        # knob, but the underlying module supports it (ham.py:29,75-83) and
        # deterministic bases are what makes trajectory parity testable.
        return functools.partial(
            Hamburger,
            seq_len=cfg.seq_len,
            features=h,
            burger_mode=cfg.burger_mode,
            depthwise=cfg.depthwise,
            rand_init=not cfg.train_md_bases,
            dtype=dtype,
        )
    if name == "hamburger_attention":
        return functools.partial(
            HamburgerAttention,
            seq_len=cfg.seq_len,
            features=h,
            burger_mode=cfg.burger_mode,
            depthwise=cfg.depthwise,
            rand_init=not cfg.train_md_bases,
            dropout=cfg.dropout,
            query=cfg.query,
            dtype=dtype,
        )
    if name.startswith("gnnmf"):
        nnmf_type = name.split("_")[1]  # utils.py:150
        return functools.partial(
            GatedNNMF,
            features=h,
            ffn_features=cfg.ffn_features,
            seq_len=cfg.seq_len,
            nnmf_type=nnmf_type,
            md_iter=cfg.md_iter,
            depthwise=cfg.depthwise,
            train_bases=cfg.train_md_bases,
            local_learning=cfg.local_learning,
            dtype=dtype,
        )
    if name == "gmlp":
        return functools.partial(
            GatedMLP, features=h, ffn_features=cfg.ffn_features,
            seq_len=cfg.seq_len, dtype=dtype,
        )
    if name == "wgmlp":
        return functools.partial(
            WeightGatedMLP, features=h, ffn_features=cfg.ffn_features,
            seq_len=cfg.seq_len, dtype=dtype,
        )
    if name == "linear":
        return functools.partial(
            LinearAttention, features=h, ffn_features=cfg.ffn_features,
            seq_len=cfg.seq_len, dtype=dtype,
        )
    if name == "ae":
        if cfg.ae_type == "heads" and not cfg.legacy_heads:
            return functools.partial(
                AEAttentionHeads,
                features=h,
                seq_len=cfg.seq_len,
                ffn_features=cfg.ffn_features,
                heads=cfg.head,
                ae_hidden_seq_len=cfg.ae_hidden_seq_len,
                mask_type=cfg.mask_type,
                chunk=cfg.chunk,
                use_nnmf_layers=cfg.use_nnmf_layers,
                nnmf_params=nnmf_params_from_cfg(cfg),
                save_attn_map=cfg.save_attn_map,
                mask_chunk=cfg.ae_mask_chunk,
                dtype=dtype,
            )
        return functools.partial(
            AEAttention,
            features=h,
            seq_len=cfg.seq_len,
            ffn_features=cfg.ffn_features,
            head=cfg.head,
            ae_type=cfg.ae_type,
            ae_hidden_features=cfg.ae_hidden_features,
            ae_hidden_seq_len=cfg.ae_hidden_seq_len,
            order_2d=cfg.order_2d,
            mask_type=cfg.mask_type,
            chunk=cfg.chunk,
            legacy_heads=cfg.legacy_heads,
            use_nnmf_layers=cfg.use_nnmf_layers,
            nnmf_params=nnmf_params_from_cfg(cfg),
            save_attn_map=cfg.save_attn_map,
            dtype=dtype,
        )
    if name == "ae_baseline":
        return functools.partial(
            BaselineAEAttention,
            features=h,
            seq_len=cfg.seq_len,
            ffn_features=cfg.ffn_features,
            ae_hidden_features=cfg.ae_hidden_features,
            save_attn_map=cfg.save_attn_map,
            dtype=dtype,
        )
    raise NotImplementedError(f"{name} is not implemented yet...")


def get_model(cfg: Config):
    """utils.get_model(args) equivalent: ``cfg -> (model, can_learn_unsupervised)``."""
    dtype = cfg.compute_dtype
    name = cfg.model_name

    if cfg.moe_experts > 0 and name in ("cnn_baseline", "lgcnn", "wlgcnn"):
        raise ValueError(
            "--moe-experts replaces the ViT-trunk encoder MLP (ops/moe.py); "
            f"CNN model {name!r} has no encoder MLP to replace."
        )
    if cfg.moe_experts > 0 and not cfg.use_encoder_mlp:
        raise ValueError(
            "--moe-experts requires the encoder MLP; it is disabled "
            "(use_encoder_mlp=False)."
        )
    if name == "cnn_baseline":
        # working equivalent of the broken reference BaselineCNN (cnn.py:6-29)
        return BaselineCNN(num_classes=cfg.num_classes, dtype=dtype), False
    if name in ("lgcnn", "wlgcnn"):
        model = LocalGlobalCNN(
            weight_gated=(name == "wlgcnn"),
            num_layers=cfg.num_layers,
            num_classes=cfg.num_classes,
            n_channels=cfg.hidden,  # utils.py:220: CNN channels == ViT hidden
            hidden_features=cfg.ffn_features,
            img_size=cfg.img_size,
            patch=cfg.patch,
            kernel_size=cfg.kernel_size,
            use_cls_token=cfg.is_cls_token,
            mlp_hidden=cfg.mlp_hidden,
            dropout=cfg.dropout,
            normalization=cfg.cnn_normalization,
            use_mlp=cfg.use_encoder_mlp,
            dtype=dtype,
        )
        return model, False

    mixer = _make_mixer(cfg, dtype)
    # MoE encoder MLP (beyond reference; ops/moe.py): swap the dense MLP for
    # Switch-routed experts, shardable over an 'expert' mesh axis
    mlp_factory = None
    if cfg.moe_experts > 0:
        from ..ops.moe import MoEMLP

        mlp_factory = functools.partial(
            MoEMLP,
            features=cfg.hidden,
            mlp_hidden=cfg.mlp_hidden,
            num_experts=cfg.moe_experts,
            capacity_factor=cfg.moe_capacity_factor,
            dropout=cfg.dropout,
            dtype=dtype,
        )
    model = ViT(
        mixer=mixer,
        mlp_factory=mlp_factory,
        num_classes=cfg.num_classes,
        img_size=cfg.img_size,
        patch=cfg.patch,
        num_layers=cfg.num_layers,
        hidden=cfg.hidden,
        mlp_hidden=cfg.mlp_hidden,
        dropout=cfg.dropout,
        use_encoder_mlp=cfg.use_encoder_mlp,
        is_cls_token=cfg.is_cls_token,
        # plain ViT has no pos_emb flag (vit.py:19-48); all other transformer
        # variants accept it and freeze the embedding at zeros when off
        # (vit.py:143-144)
        pos_emb=True if name == "vit" else cfg.pos_emb,
        remat=cfg.remat,
        dtype=dtype,
    )
    # only the AEViT can learn unsupervised (utils.py:279; ae_baseline's branch
    # never sets the flag, utils.py:281-300)
    return model, name == "ae"
