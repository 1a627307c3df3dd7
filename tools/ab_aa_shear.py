"""A/B: AutoAugment shear via precomputed constant R tables vs per-image
in-kernel one-hot construction.

The round-5 xprof kernel table (docs/PERFORMANCE.md, "Kernel-level
accounting") measured the AutoAugment geometry fusions as the largest
single kernel class in the train step — 2 x ~435 us — and a transposed
einsum layout A/B proved the cost is the per-image elementwise one-hot R
*construction*, not the matmul.  Shear magnitudes come from the published
FIXED 10-bin grid with only a random sign, so every R an image can need is
known at trace time: data/autoaugment.py now indexes a constant
(20, L, S, S) table (exact same arithmetic, hoisted out of the per-image
fusion; equality pinned by tests/test_autoaugment.py).

This tool measures the full ``autoaugment_batch`` per-batch cost both ways
(the "construct" variant monkeypatches the original per-image path back in)
with the standard methodology: read-synced windows, warm until two
consecutive windows agree within 5%.

Usage: python tools/ab_aa_shear.py [--batch-size 128] [--steps 400]
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

import vit_cifar_tpu.data.autoaugment as aa


def _shear_x_construct(img, mag, key):
    return aa._shear_axis(img, mag * aa._rand_sign(key), axis=1)


def _shear_y_construct(img, mag, key):
    return aa._shear_axis(img, mag * aa._rand_sign(key), axis=0)


def _steady(run_window, n_windows=10):
    times = []
    for _ in range(n_windows):
        times.append(run_window())
        if len(times) >= 2 and abs(times[-1] - times[-2]) <= 0.05 * min(times[-2:]):
            break
    return min(times[-2:]) if len(times) >= 2 else times[-1], times


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch-size", type=int, default=128)
    ap.add_argument("--steps", type=int, default=400)
    ap.add_argument("--policies", default="cifar10,svhn")
    args = ap.parse_args()

    from vit_cifar_tpu.config import Config
    from vit_cifar_tpu.utils.cache import enable_compile_cache

    enable_compile_cache(Config().compile_cache_dir)

    rng = np.random.default_rng(0)
    B, K = args.batch_size, args.steps
    imgs = jnp.asarray(rng.integers(0, 256, (B, 32, 32, 3), dtype=np.uint8))

    idx_x, idx_y = aa._OP_ID["shearX"], aa._OP_ID["shearY"]
    table_fns = (aa._OP_FNS[idx_x], aa._OP_FNS[idx_y])

    results = []
    for policy in args.policies.split(","):
        for variant in ("table", "construct"):
            if variant == "construct":
                aa._OP_FNS[idx_x] = _shear_x_construct
                aa._OP_FNS[idx_y] = _shear_y_construct
            else:
                aa._OP_FNS[idx_x], aa._OP_FNS[idx_y] = table_fns

            @jax.jit
            def step(x, i):
                key = jax.random.fold_in(jax.random.PRNGKey(0), i)
                return aa.autoaugment_batch(key, x, policy).astype(
                    jnp.int32).sum()

            def window():
                t0 = time.perf_counter()
                s = None
                for i in range(K):
                    s = step(imgs, i)
                int(jax.device_get(s))  # ONLY a host read syncs on this relay
                return time.perf_counter() - t0

            sdt, times = _steady(window)
            row = {"policy": policy, "variant": variant,
                   "ms_per_batch": round(1e3 * sdt / K, 3),
                   "windows_s": [round(t, 2) for t in times]}
            results.append(row)
            print(f"[ab_aa_shear] {row}", flush=True)

    aa._OP_FNS[idx_x], aa._OP_FNS[idx_y] = table_fns
    print(json.dumps({"ab": "aa_shear", "batch_size": B, "results": results}))


if __name__ == "__main__":
    main()
