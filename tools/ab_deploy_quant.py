"""Measure serving-artifact latency and size: f32 vs --quantize int8.

Exports the same checkpoint both ways, then times warm `predict` calls on
the current backend (median of N synced calls — each predict ends in a
host read, the only thing that synchronizes on this relay) at B=1 and
B=128, and reports artifact bytes plus the max logit deviation between the
two artifacts on a fixed probe batch.

Usage: python tools/ab_deploy_quant.py <ckpt_dir> [--n 50]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from vit_cifar_tpu.deploy import export_inference, load_inference


def _median_latency(predict, imgs, n):
    predict(imgs)  # warm (compile + cold-executable settle)
    predict(imgs)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = predict(imgs)
        float(np.asarray(out).ravel()[0])  # host read = the only real sync
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt_dir")
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--which", default="best", choices=["best", "last"])
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    img1 = rng.integers(0, 256, (1, 32, 32, 3), dtype=np.uint8)
    img128 = rng.integers(0, 256, (128, 32, 32, 3), dtype=np.uint8)

    rows = []
    outs = {}
    with tempfile.TemporaryDirectory() as td:
        for mode in (None, "int8"):
            name = mode or "f32"
            art = export_inference(args.ckpt_dir, os.path.join(td, name),
                                   which=args.which, quantize=mode)
            loaded = load_inference(art)
            outs[name] = np.asarray(loaded.predict(img128))
            b1 = _median_latency(loaded.predict, img1, args.n)
            b128 = _median_latency(loaded.predict, img128, args.n)
            row = {"artifact": name, "bytes": loaded.meta["bytes"],
                   "b1_ms": round(1e3 * b1, 2),
                   "b128_ms": round(1e3 * b128, 2),
                   "b128_img_per_s": round(128 / b128, 1)}
            rows.append(row)
            print(f"[ab_deploy_quant] {row}", flush=True)

    dev = float(np.abs(outs["int8"] - outs["f32"]).max())
    top1_match = float(
        (outs["int8"].argmax(-1) == outs["f32"].argmax(-1)).mean())
    print(json.dumps({"ab": "deploy_quant", "results": rows,
                      "max_logit_dev": round(dev, 4),
                      "top1_agreement": top1_match}))


if __name__ == "__main__":
    main()
