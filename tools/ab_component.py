"""A/B: per-component cost of the flagship step at the recipe batch size.

The round-4 scaling study (tools/ab_scaling_diag.py) showed the model runs at
~22% of the efficiency its own projection matmuls achieve in isolation (48%
of bf16 peak via the mm16 probe) — i.e. roughly half the step is non-matmul
overhead.  This tool decomposes the fwd and fwd+bwd time of the 7-layer
flagship by swapping parts of the trunk:

  * full        — the real model (MultiHeadSelfAttention mixer)
  * id_mixer    — mixer replaced by identity       (mixer total = full - this)
  * proj_mixer  — mixer keeps the 4 projections but skips QK^T/softmax/AV
                  (core attention = full - this)
  * no_mlp      — use_encoder_mlp=False            (MLP total = full - this)
  * mhsa_nt     — attention without the explicit (B,h,T,d) transposes
                  (einsum contracts straight from (B,T,h,d); algebraically
                  identical — tests pin this if adopted)
  * mhsa_b16sm  — softmax without the f32 upcast (numerics change; measures
                  what the two extra full passes over (B,h,T,T) cost)

Methodology per docs/PERFORMANCE.md: read-synced windows (block_until_ready
is a no-op on this relay), warm until two consecutive windows agree within
5%, steady window reported.

Usage: python tools/ab_component.py [--batch-size 128] [--steps 128]
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models.vit import ViT
from vit_cifar_tpu.ops.attention import MultiHeadSelfAttention
from vit_cifar_tpu.ops.init import TorchLinear
from vit_cifar_tpu.train.loop import MATMUL_PRECISION
from vit_cifar_tpu.train.losses import make_criterion


class IdentityMixer(nn.Module):
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        return x


class ProjOnlyMixer(nn.Module):
    """The MHSA's four projections with the core attention skipped."""

    features: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
        k = TorchLinear(self.features, dtype=self.dtype, name="Wk")(x)
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)
        out = v + 0.0 * (q + k)  # keep all three live so nothing is DCE'd
        return TorchLinear(self.features, dtype=self.dtype, name="out_project")(out)


class MHSANoTranspose(nn.Module):
    """MHSA contracting straight from (B,T,h,d) — no (B,h,T,d) transposes."""

    features: int
    head: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, F = x.shape
        d = self.features // self.head
        sqrt_d = jnp.asarray(self.features**0.5, dtype=self.dtype)
        q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
        k = TorchLinear(self.features, dtype=self.dtype, name="Wk")(x)
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)
        q = q.reshape(B, T, self.head, d)
        k = k.reshape(B, T, self.head, d)
        v = v.reshape(B, T, self.head, d)
        logits = jnp.einsum("bihd,bjhd->bhij", q, k) / sqrt_d
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bjhd->bihd", attn, v).reshape(B, T, F)
        return TorchLinear(self.features, dtype=self.dtype, name="out_project")(out)


class MHSABf16Softmax(nn.Module):
    features: int
    head: int
    dtype: object = jnp.float32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        B, T, F = x.shape
        d = self.features // self.head
        sqrt_d = jnp.asarray(self.features**0.5, dtype=self.dtype)
        q = TorchLinear(self.features, dtype=self.dtype, name="Wq")(x)
        k = TorchLinear(self.features, dtype=self.dtype, name="Wk")(x)
        v = TorchLinear(self.features, dtype=self.dtype, name="Wv")(x)
        q = q.reshape(B, T, self.head, d).transpose(0, 2, 1, 3)
        k = k.reshape(B, T, self.head, d).transpose(0, 2, 1, 3)
        v = v.reshape(B, T, self.head, d).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhif,bhjf->bhij", q, k) / sqrt_d
        attn = nn.softmax(logits, axis=-1)  # no f32 upcast
        out = jnp.einsum("bhij,bhjf->bihf", attn, v).reshape(B, T, F)
        return TorchLinear(self.features, dtype=self.dtype, name="out_project")(out)


def _steady(run_window, n_windows=8):
    times = []
    for _ in range(n_windows):
        times.append(run_window())
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    return min(times[-2:]) if len(times) >= 2 else times[-1], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=128)
    args = ap.parse_args()

    jax.config.update("jax_default_matmul_precision", MATMUL_PRECISION["medium"])
    from vit_cifar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(Config().compile_cache_dir)

    cfg = Config(model_name="vit", num_layers=7, hidden=384, mlp_hidden=384,
                 head=12, label_smoothing=True, precision="bf16-mixed")
    criterion = make_criterion(cfg)
    dt = cfg.compute_dtype

    mixers = {
        "full": functools.partial(MultiHeadSelfAttention, features=384, head=12,
                                  dtype=dt),
        "id_mixer": functools.partial(IdentityMixer, dtype=dt),
        "proj_mixer": functools.partial(ProjOnlyMixer, features=384, dtype=dt),
        "mhsa_nt": functools.partial(MHSANoTranspose, features=384, head=12,
                                     dtype=dt),
        "mhsa_b16sm": functools.partial(MHSABf16Softmax, features=384, head=12,
                                        dtype=dt),
    }

    rng = np.random.default_rng(0)
    B, K = args.batch_size, args.steps
    xb = jnp.asarray(rng.standard_normal((B, 32, 32, 3)).astype(np.float32)).astype(dt)
    y = jnp.asarray(rng.integers(0, 10, B, dtype=np.int32))

    results = []

    def run_variant(name, mixer, use_mlp=True):
        model = ViT(mixer=mixer, num_layers=7, hidden=384, mlp_hidden=384,
                    use_encoder_mlp=use_mlp, dtype=dt)
        k0 = jax.random.PRNGKey(0)
        params = model.init({"params": k0, "dropout": k0, "mask": k0}, xb,
                            deterministic=True)["params"]

        def loss_fn(p, x):
            logits = model.apply({"params": p}, x, deterministic=False,
                                 rngs={"dropout": k0, "mask": k0})
            return criterion(logits, y, {})

        @jax.jit
        def fwdbwd(p, x):
            loss, g = jax.value_and_grad(loss_fn)(p, x)
            new = jax.tree_util.tree_map(
                lambda pp, gg: pp - 1e-6 * gg.astype(pp.dtype), p, g)
            return new, loss

        @jax.jit
        def fwd(p, x):
            return criterion(model.apply({"params": p}, x, deterministic=True),
                             y, {})

        def win_fwdbwd():
            p = params
            t0 = time.perf_counter()
            for _ in range(K):
                p, loss = fwdbwd(p, xb)
            float(jax.device_get(loss))
            return time.perf_counter() - t0

        def win_fwd():
            t0 = time.perf_counter()
            for _ in range(K):
                loss = fwd(params, xb)
            float(jax.device_get(loss))
            return time.perf_counter() - t0

        row = {"variant": name}
        for nm, w in (("fwdbwd", win_fwdbwd), ("fwd", win_fwd)):
            sdt, times = _steady(w)
            row[f"{nm}_ms"] = round(1e3 * sdt / K, 3)
            row[f"{nm}_windows"] = [round(t, 2) for t in times]
        results.append(row)
        print(f"[ab_component] {row}", flush=True)

    for name, mixer in mixers.items():
        run_variant(name, mixer)
    run_variant("no_mlp", mixers["full"], use_mlp=False)

    print(json.dumps({"ab": "component", "batch_size": B, "results": results}))


if __name__ == "__main__":
    main()
