"""Long-horizon two-stack collapse study for the two chance-plateau models.

Round-4 10-epoch TPU runs showed `gnnmf_sbsed`+madam and `ae` simple
(+1 unsupervised step) converge to EXACTLY chance (val_acc 0.100, loss ->
ln 10): checkpoint forensics found the patch-embedding kernel decayed to ~0
(fro 9e-7 / 2e-4) and, for gnnmf_sbsed, every NNMF weight column identical
(hidden activity exactly uniform 1/M for every input) — a self-inflicted
dead state where weight decay outruns the vanishing task gradient, the same
class of reference-design fixed point as cnn_baseline's ReLU collapse
(docs/PARITY.md).

This script proves the dynamic is the REFERENCE's own, not ours: it trains
the tiny trajectory-parity configs for 600 steps (200 simulated epochs — the
real recipe's schedule shape) in BOTH stacks (our train step vs the actual
torch reference with our init transplanted, exactly like
tests/test_trajectory_parity.py) and reports per-step loss agreement, the
patch-embedding norm trajectory, NNMF column spread, and final logit
input-dependence on both sides.

Run:  PYTHONPATH= JAX_PLATFORMS=cpu python tools/collapse_study.py
Results are recorded in docs/PARITY.md (zoo table + collapse section).
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import numpy as np  # noqa: E402
import torch  # noqa: E402

import test_trajectory_parity as T  # noqa: E402  (adds /root/reference to path)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from vit_cifar_tpu.config import Config  # noqa: E402
from vit_cifar_tpu.models import get_model  # noqa: E402
from vit_cifar_tpu.train.loop import init_state  # noqa: E402
from vit_cifar_tpu.train.optim import make_optimizer  # noqa: E402
from vit_cifar_tpu.train.steps import make_train_step  # noqa: E402

EPOCHS = int(os.environ.get("COLLAPSE_EPOCHS", "200"))
PROBE_EVERY = 25  # epochs


def emb_fro_ours(state):
    return float(np.linalg.norm(np.asarray(
        jax.device_get(state.params["emb"]["kernel"]), np.float64)))


def emb_fro_torch(ref):
    return float(np.linalg.norm(ref.emb.weight.detach().numpy().astype(np.float64)))


def logit_batch_std(fn, x):
    logits = np.asarray(fn(x), np.float64)
    return float(logits.std(axis=0).mean())


def run_ours(cfg, x_u8, y_np, spe):
    model, _ = get_model(cfg)
    tx = make_optimizer(cfg, spe)
    state = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), jnp.float32))
    state0 = init_state(cfg, model, tx, jnp.zeros((2, 32, 32, 3), jnp.float32))
    step = jax.jit(make_train_step(cfg, model, tx, pre_augmented=True))
    N = len(y_np)
    x_all = jnp.asarray(x_u8.reshape(N, -1))
    y_all = jnp.asarray(y_np)
    perm = jnp.arange(N, dtype=jnp.int32)
    losses, emb_traj = [], []
    for e in range(EPOCHS):
        if e % PROBE_EVERY == 0:
            emb_traj.append((e, emb_fro_ours(state)))
        for i in range(spe):
            state, m = step(state, x_all, y_all, perm, i)
            losses.append(float(m["loss"]))
    emb_traj.append((EPOCHS, emb_fro_ours(state)))
    return model, state0, state, np.array(losses), emb_traj


def normalized_chw(cfg, x_u8):
    mean = np.asarray(cfg.mean, np.float32).reshape(1, 3, 1, 1)
    std = np.asarray(cfg.std, np.float32).reshape(1, 3, 1, 1)
    return (x_u8.astype(np.float32).transpose(0, 3, 1, 2) / 255.0 - mean) / std


def report(tag, ours_losses, ref_losses, ours_emb, ref_emb, ours_lstd, ref_lstd,
           extra=""):
    d = np.abs(ours_losses - ref_losses)
    print(f"\n===== {tag} ({len(ours_losses)} steps / {EPOCHS} simulated epochs)")
    print(f"loss[0]   ours={ours_losses[0]:.6f} ref={ref_losses[0]:.6f}")
    print(f"loss[-1]  ours={ours_losses[-1]:.6f} ref={ref_losses[-1]:.6f} "
          f"(ln10={np.log(10):.6f})")
    for w in ((0, 100), (100, 300), (300, len(d))):
        seg = d[w[0]:w[1]]
        if len(seg):
            print(f"  max|dloss| steps {w[0]}-{w[1]}: {seg.max():.2e}")
    print(f"emb fro trajectory (epoch, ours, ref):")
    for (e, a), (_, b) in zip(ours_emb, ref_emb):
        print(f"  {e:4d}  {a:.3e}  {b:.3e}")
    print(f"final logits batch-std: ours={ours_lstd:.3e} ref={ref_lstd:.3e}")
    if extra:
        print(extra)


def study_gnnmf_sbsed():
    B, spe, W, L = 8, 3, 1, 2
    cfg = Config(
        model_name="gnnmf_sbsed", dataset="c10", num_layers=L, hidden=32,
        mlp_hidden=32, head=1, patch=8, batch_size=B, precision="32",
        label_smoothing=True, warmup_epoch=W, max_epochs=EPOCHS,
        synthetic_data=True, dropout=0.0, optimizer="madam",
        ffn_features=16, md_iter=3, train_md_bases=True,
        local_learning=False, depthwise=False,
    )
    rng = np.random.default_rng(11)
    N = B * spe
    x_u8 = rng.integers(0, 256, (N, 32, 32, 3), dtype=np.uint8)
    y_np = rng.integers(0, 10, N).astype(np.int32)

    model, state0, state, ours_losses, ours_emb = run_ours(cfg, x_u8, y_np, spe)

    # ---- torch side (construction identical to the trajectory-parity test)
    from criterions import LabelSmoothingCrossEntropyLoss
    from nnmf.optimizer import Madam
    from nnmf.utils import calculate_output_size
    from torch.optim.lr_scheduler import CosineAnnealingLR
    from vit import GatedNNMFViT as RefGatedNNMFViT

    torch.manual_seed(0)
    import nnmf.NNMFLayerSbSBP  # noqa: F401

    real_device = torch.device
    torch.device = lambda *a, **k: real_device("cpu")
    try:
        ref = RefGatedNNMFViT(
            NNMF_type="sbsed", seq_len=cfg.seq_len, in_c=3, num_classes=10,
            img_size=32, patch=8, dropout=0.0, num_layers=L, hidden=32,
            ffn_features=16, MD_iterations=3, train_bases=True,
            local_learning=False, depthwise=False,
            encoder_mlp=True, mlp_hidden=32, head=1, is_cls_token=True,
            pos_emb=True,
        )
    finally:
        torch.device = real_device
    T._flax_to_torch_gnnmf(jax.device_get(state0.params), ref, L)
    ref.train()
    nnmf_layers = [m for n, m in ref.named_modules()
                   if "nnmf" in n.lower() or hasattr(m, "_weights")]
    for layer in nnmf_layers:  # as-shipped dilation=0 crash fix (see test)
        layer._dilation = [1, 1]
        fixed = calculate_output_size(
            value=list(layer._input_size), kernel_size=layer._kernel_size,
            stride=layer._stride, dilation=layer._dilation,
            padding=layer._padding)
        if hasattr(layer, "_inbetween_size"):
            layer._inbetween_size = fixed
        else:
            layer._output_size = fixed

    nnmf_params, other_params = [], []
    for name, param in ref.named_parameters():
        (nnmf_params if "nnmf" in name.lower() or "_weights" in name.lower()
         else other_params).append(param)
    opt = Madam(params=[
        {"params": other_params, "lr": cfg.lr},
        {"params": nnmf_params, "lr": cfg.lr_nnmf, "nnmf": True,
         "foreach": False}],
        betas=(cfg.beta1, cfg.beta2), weight_decay=cfg.weight_decay)
    cos = CosineAnnealingLR(opt, T_max=cfg.max_epochs, eta_min=cfg.min_lr)
    sch = T.GradualWarmupScheduler(opt, 1.0, W, after_scheduler=cos)
    crit = LabelSmoothingCrossEntropyLoss(classes=10, smoothing=cfg.smoothing)
    x_chw = normalized_chw(cfg, x_u8)

    ref_losses, ref_emb = [], []
    for e in range(EPOCHS):
        if e % PROBE_EVERY == 0:
            ref_emb.append((e, emb_fro_torch(ref)))
        for i in range(spe):
            xb = T._t(x_chw[i * B:(i + 1) * B])
            yb = torch.from_numpy(y_np[i * B:(i + 1) * B].astype(np.int64))
            out = ref(xb)
            loss = crit(out, yb)
            opt.zero_grad()
            loss.backward()
            for layer in nnmf_layers:
                layer.update_pre_care()
            opt.step()
            for layer in nnmf_layers:
                layer.update_after_care(
                    cfg.nnmf_learning_rate_threshold_w
                    / layer._number_of_input_neurons)
            ref_losses.append(float(loss))
        sch.step()
    ref_emb.append((EPOCHS, emb_fro_torch(ref)))

    # final probes: logit input-dependence + NNMF column spread, both stacks
    probe = np.asarray(normalized_chw(cfg, x_u8), np.float32)
    ours_logits = lambda x: model.apply(
        {"params": state.params, **jax.device_get(state.model_state)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), deterministic=True)
    ref.eval()
    with torch.no_grad():
        ref_lstd = logit_batch_std(lambda x: ref(T._t(x)).numpy(), probe)
    ours_lstd = logit_batch_std(lambda x: np.asarray(ours_logits(x)), probe)

    def colspread(w):
        w = np.asarray(w, np.float64)
        return float(np.abs(w - w.mean(axis=1, keepdims=True)).max())

    ours_spread = [colspread(jax.device_get(
        state.params[f"enc{i}"]["mixer"]["NNMF"]["nnmf_weights"]))
        for i in range(L)]
    ref_spread = [colspread(layer._weights.detach().numpy())
                  for layer in nnmf_layers]
    report("gnnmf_sbsed + madam", ours_losses, np.array(ref_losses),
           ours_emb, ref_emb, ours_lstd, ref_lstd,
           extra=(f"NNMF col-spread ours={['%.3e' % s for s in ours_spread]} "
                  f"ref={['%.3e' % s for s in ref_spread]}"))


def study_ae_simple():
    B, spe, W, L = 16, 3, 1, 2
    cfg = Config(
        model_name="ae", ae_type="simple", dataset="c10", num_layers=L,
        hidden=64, mlp_hidden=64, head=4, patch=8, batch_size=B,
        precision="32", label_smoothing=True, warmup_epoch=W,
        max_epochs=EPOCHS, synthetic_data=True, dropout=0.0,
        unsupervised_steps=1, ffn_features=96, ae_hidden_features=32,
        chunk=False, mask_type="zeros",
    )
    rng = np.random.default_rng(1)
    N = B * spe
    x_u8 = rng.integers(0, 256, (N, 32, 32, 3), dtype=np.uint8)
    y_np = rng.integers(0, 10, N).astype(np.int32)

    model, state0, state, ours_losses, ours_emb = run_ours(cfg, x_u8, y_np, spe)

    from criterions import LabelSmoothingCrossEntropyLoss
    from torch.optim.lr_scheduler import CosineAnnealingLR
    from vit import AEViT as RefAEViT

    torch.manual_seed(0)
    ref = RefAEViT(
        AE_type="simple", seq_len=cfg.seq_len, in_c=3, num_classes=10,
        img_size=32, patch=8, dropout=0.0, num_layers=L, hidden=64,
        ffn_features=96, AE_hidden_features=32, chunk=False,
        encoder_mlp=True, mlp_hidden=64, head=4, mask_type="zeros",
        is_cls_token=True,
    )
    T._flax_to_torch_aevit(jax.device_get(state0.params), ref, L)
    ref.train()
    opt = torch.optim.Adam(ref.parameters(), lr=cfg.lr,
                           betas=(cfg.beta1, cfg.beta2),
                           weight_decay=cfg.weight_decay)
    cos = CosineAnnealingLR(opt, T_max=cfg.max_epochs, eta_min=cfg.min_lr)
    sch = T.GradualWarmupScheduler(opt, 1.0, W, after_scheduler=cos)
    crit = LabelSmoothingCrossEntropyLoss(classes=10, smoothing=cfg.smoothing)
    x_chw = normalized_chw(cfg, x_u8)

    ref_losses, ref_emb = [], []
    for e in range(EPOCHS):
        if e % PROBE_EVERY == 0:
            ref_emb.append((e, emb_fro_torch(ref)))
        for i in range(spe):
            xb = T._t(x_chw[i * B:(i + 1) * B])
            yb = torch.from_numpy(y_np[i * B:(i + 1) * B].astype(np.int64))
            out = ref(xb)
            loss = crit(out, yb)
            ref.unsupervised_update()
            opt.zero_grad()
            loss.backward()
            opt.step()
            ref_losses.append(float(loss))
        sch.step()
    ref_emb.append((EPOCHS, emb_fro_torch(ref)))

    probe = np.asarray(normalized_chw(cfg, x_u8), np.float32)
    ref.eval()
    with torch.no_grad():
        ref_lstd = logit_batch_std(lambda x: ref(T._t(x)).numpy(), probe)
    ours_lstd = logit_batch_std(lambda x: np.asarray(model.apply(
        {"params": state.params, **jax.device_get(state.model_state)},
        jnp.asarray(x.transpose(0, 2, 3, 1)), deterministic=True)), probe)
    report("ae simple + 1 unsupervised step", ours_losses,
           np.array(ref_losses), ours_emb, ref_emb, ours_lstd, ref_lstd)


if __name__ == "__main__":
    study_gnnmf_sbsed()
    study_ae_simple()
