"""A/B: where the fused Pallas attention kernel beats XLA — shape scaling.

At the flagship shape (B=128, H=12, T=65, D=32) the kernel loses 2-3x: the
mandatory lane padding (D 32 -> 128) quadruples the MXU work and each
program is too small to hide Mosaic per-program overhead
(docs/PERFORMANCE.md "Fused Pallas attention, re-tested").  The kernel's
claimed regime is D >= 128 (no padding waste) and larger T (the (H,T,T)
attention tensor never leaves VMEM, so HBM sees only Q/K/V + context).
This tool measures that crossover on the real chip.

Methodology per docs/PERFORMANCE.md: each window is K dispatches of the
jitted core followed by ONE device_get (block_until_ready is a no-op on
this relay); warm until two consecutive windows agree within 5%.

Usage: python tools/ab_pallas_shape.py [--iters 64]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.ops.pallas.attention import flash_attention, fused_attention


def xla_core(q, k, v, scale):
    logits = jnp.einsum("bhid,bhjd->bhij", q, k) * scale
    attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhij,bhjd->bihd", attn, v)


def steady_window_ms(fn, args, iters, n_windows=8):
    times = []
    for _ in range(n_windows):
        t0 = time.perf_counter()
        out = None
        for _ in range(iters):
            out = fn(*args)
        _ = float(jnp.sum(out))  # the ONLY real sync on this relay
        times.append((time.perf_counter() - t0) / iters * 1e3)
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    return min(times[-2:]) if len(times) >= 2 else times[-1]


def grad_fn(core, scale):
    """fwd+bwd of a weighted scalar through the attention core: the
    training-economics A/B for the round-5 tiled flash backward."""
    def f(q, k, v, w):
        return jnp.sum(w * core(q, k, v, scale).astype(jnp.float32))
    return jax.jit(jax.grad(f, argnums=(0, 1, 2)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=64)
    ap.add_argument("--bwd", action="store_true",
                    help="measure fwd+bwd (value_and_grad) instead of fwd")
    args = ap.parse_args()

    # (label, B, H, T, D) — ~137 GFLOP of attention core per call so the
    # execution time (a few ms) dwarfs the ~0.4-0.5 ms relay dispatch floor
    # (a first pass with ~1 GFLOP shapes measured only the floor: every row
    # ~0.5 ms both sides).  D=128 kills the padding waste; growing T grows
    # the VMEM-resident (T,T) saving.  VMEM bound per program:
    # 3*H*T*Dp*4B + (T,T)*4B must stay well under ~16 MB (T=1024 is the cap:
    # the kernel materializes the full per-head (T,T) block).
    shapes = [
        ("flagship", 128, 12, 65, 32),
        ("d128_t256", 512, 8, 256, 128),
        ("t512", 128, 8, 512, 128),
        ("t1024", 64, 4, 1024, 128),
        # beyond fused_attention's whole-(T,T) VMEM cap: flash only
        ("t2048", 16, 2, 2048, 128),
        ("t4096", 8, 1, 4096, 128),
    ]
    rng = np.random.default_rng(0)
    results = []
    for label, B, H, T, D in shapes:
        scale = 1.0 / float((H * D) ** 0.5)
        q, k, v = (
            jnp.asarray(rng.standard_normal((B, H, T, D)), jnp.bfloat16)
            for _ in range(3)
        )

        if args.bwd:
            w = jnp.asarray(rng.standard_normal((B, T, H, D)), jnp.bfloat16)
            gx = grad_fn(lambda q, k, v, s: xla_core(q, k, v, s), scale)
            gf = grad_fn(flash_attention, scale)

            def sync_grads(fn, q, k, v):
                outs = None
                t0 = time.perf_counter()
                for _ in range(args.iters):
                    outs = fn(q, k, v, w)
                _ = float(jnp.sum(outs[0]))
                return (time.perf_counter() - t0) / args.iters * 1e3, outs

            row = {"shape": label, "B": B, "H": H, "T": T, "D": D,
                   "mode": "fwd+bwd"}
            want = None
            try:
                want = gx(q, k, v, w)
                times = [sync_grads(gx, q, k, v)[0] for _ in range(6)]
                row["xla_ms"] = round(min(times[-2:]), 3)
            except Exception as e:  # einsum bwd can OOM at long T
                row["xla_ms"] = None
                row["xla_error"] = type(e).__name__
            got = gf(q, k, v, w)
            if want is not None:
                for name, a, b in zip("qkv", got, want):
                    np.testing.assert_allclose(
                        np.asarray(a, np.float32), np.asarray(b, np.float32),
                        rtol=1e-1, atol=1e-1, err_msg=f"d{name} {label}")
            times = [sync_grads(gf, q, k, v)[0] for _ in range(6)]
            row["flash_ms"] = round(min(times[-2:]), 3)
            if row["xla_ms"]:
                row["flash_speedup"] = round(row["xla_ms"] / row["flash_ms"], 2)
            from vit_cifar_tpu.ops.pallas.attention import select_kernel

            if select_kernel(H, T, D) == "fused" or (T <= 512 and D >= 128):
                # fused fwd + shared tiled bwd (round 5); only at shapes the
                # router would pick (its VMEM estimate includes the training
                # lse output — forcing fused past it Mosaic-OOMs)
                gfu = grad_fn(fused_attention, scale)
                got_f = gfu(q, k, v, w)
                if want is not None:
                    for name, a, b in zip("qkv", got_f, want):
                        np.testing.assert_allclose(
                            np.asarray(a, np.float32),
                            np.asarray(b, np.float32),
                            rtol=1e-1, atol=1e-1, err_msg=f"fused d{name} {label}")
                times = [sync_grads(gfu, q, k, v)[0] for _ in range(6)]
                row["fused_ms"] = round(min(times[-2:]), 3)
                if row["xla_ms"]:
                    row["fused_speedup"] = round(
                        row["xla_ms"] / row["fused_ms"], 2)
            results.append(row)
            print(json.dumps(row))
            continue

        fx = jax.jit(lambda q, k, v: xla_core(q, k, v, scale))
        want = np.asarray(fx(q, k, v), np.float32)
        ms_x = steady_window_ms(fx, (q, k, v), args.iters)
        row = {"shape": label, "B": B, "H": H, "T": T, "D": D,
               "xla_ms": round(ms_x, 3)}

        if T <= 1024:  # fused materializes the whole per-head (T,T) in VMEM
            fp = jax.jit(lambda q, k, v: fused_attention(q, k, v, scale))
            np.testing.assert_allclose(
                np.asarray(fp(q, k, v), np.float32), want, rtol=2e-2, atol=2e-2)
            ms_p = steady_window_ms(fp, (q, k, v), args.iters)
            row["fused_ms"] = round(ms_p, 3)
            row["fused_speedup"] = round(ms_x / ms_p, 2)

        ff = jax.jit(lambda q, k, v: flash_attention(q, k, v, scale))
        np.testing.assert_allclose(
            np.asarray(ff(q, k, v), np.float32), want, rtol=2e-2, atol=2e-2)
        ms_f = steady_window_ms(ff, (q, k, v), args.iters)
        row["flash_ms"] = round(ms_f, 3)
        row["flash_speedup"] = round(ms_x / ms_f, 2)

        results.append(row)
        print(json.dumps(row))
    return results


if __name__ == "__main__":
    main()
