"""A/B: equalize via hi/lo-nibble bit-split one-hots vs the flat (P, 256)
one-hot.

After the shear-table fix, the round-5 xprof kernel table's largest
remaining kernel class was equalize's 6 loop fusions (3 channels x 2
policy-op slots; the vmapped lax.switch evaluates every branch) at ~91 us
each, ~546 us of a ~6.9 ms step — compute-bound on the (P, 256) one-hot's
262K comparisons per channel.  The bit-split (idx = hi*16 + lo) builds two
(P, 16) one-hots instead (8x fewer comparisons) and moves histogram + lut
application onto the MXU as tiny exact matmuls (data/autoaugment.py
_equalize docstring).

Measures the full ``autoaugment_batch`` per-batch cost both ways (the
"flat" variant monkeypatches the original implementation back in) with the
standard methodology: read-synced windows, warm until two consecutive
windows agree within 5%.

Usage: python tools/ab_aa_equalize.py [--batch-size 128] [--steps 400]
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


def _equalize_flat(img, mag, key):
    """The pre-bit-split implementation: one (P, 256) one-hot per channel."""

    def chan(ch):
        idx = ch.astype(jnp.int32)
        onehot = (idx.reshape(-1, 1) == jnp.arange(256)[None, :]).astype(
            jnp.float32)
        h = onehot.sum(0).astype(jnp.int32)
        nz = h > 0
        n_nz = nz.sum()
        last_idx = 255 - jnp.argmax(nz[::-1])
        total = h.sum()
        step = (total - h[last_idx]) // 255
        cum_excl = jnp.cumsum(h) - h
        lut = jnp.clip((step // 2 + cum_excl) // jnp.maximum(step, 1), 0, 255)
        use_id = (n_nz <= 1) | (step == 0)
        lut = jnp.where(use_id, jnp.arange(256), lut)
        return (onehot @ lut.astype(jnp.float32)).reshape(ch.shape)

    return jnp.stack([chan(img[..., c]) for c in range(img.shape[-1])],
                     axis=-1)


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

    idx_eq = aa._OP_ID["equalize"]
    bitsplit_fn = aa._OP_FNS[idx_eq]

    # sanity: both variants agree bit-for-bit on this batch's value range
    probe = jnp.asarray(rng.integers(0, 256, (32, 32, 3), dtype=np.uint8),
                        jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(bitsplit_fn(probe, jnp.float32(0), jax.random.PRNGKey(0))),
        np.asarray(_equalize_flat(probe, jnp.float32(0),
                                  jax.random.PRNGKey(0))))

    results = []
    for policy in args.policies.split(","):
        for variant in ("bitsplit", "flat"):
            aa._OP_FNS[idx_eq] = (
                bitsplit_fn if variant == "bitsplit" else _equalize_flat)

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
            print(f"[ab_aa_equalize] {row}", flush=True)

    aa._OP_FNS[idx_eq] = bitsplit_fn
    print(json.dumps({"ab": "aa_equalize", "batch_size": B,
                      "results": results}))


if __name__ == "__main__":
    main()
