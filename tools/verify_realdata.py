"""Real-data acceptance kit: archives -> md5 check -> 200-epoch README
recipe -> accuracy + time-to-accuracy verdict.

The day real archives exist under data/, ONE command produces the
BASELINE.md verdict (round-4 verdict missing #1):

    python tools/verify_realdata.py --dataset c10

It (1) verifies the archive md5s — the same per-file checksums torchvision
pins and the reference checks (/root/reference/datasets.py:36-50,241-266);
(2) runs the reference README recipe (200 epochs, batch 128, AutoAugment,
label smoothing, bf16-mixed — /root/reference/README.md:63-80); (3) asserts
the published accuracy (README.md:33-35) and reports wall-clock against the
<=10-min north star (BASELINE.md).  Writes REALDATA_VERDICT_<ds>.json.

CI path (no archives in this image): ``--dry-run`` skips the md5 gate and
accuracy assert but drives the identical code path on synthetic data for a
few epochs — tests/test_tools.py runs it, so the kit itself stays green.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# per-file md5s as pinned by torchvision and checked by the reference
# (/root/reference/datasets.py:41-50 for c10, :295-300 for c100; svhn from
# torchvision.datasets.SVHN's split_list)
ARCHIVE_MD5 = {
    "c10": {
        "cifar-10-batches-py/data_batch_1": "c99cafc152244af753f735de768cd75f",
        "cifar-10-batches-py/data_batch_2": "d4bba439e000b95fd0a9bffe97cbabec",
        "cifar-10-batches-py/data_batch_3": "54ebc095f3ab1f0389bbae665268c751",
        "cifar-10-batches-py/data_batch_4": "634d18415352ddfa80567beed471001a",
        "cifar-10-batches-py/data_batch_5": "482c414d41f54cd18b22e5b47cb7c3cb",
        "cifar-10-batches-py/test_batch": "40351d587109b95175f43aff81a1287e",
    },
    "c100": {
        "cifar-100-python/train": "16019d7e3df5f24257cddd939b257f8d",
        "cifar-100-python/test": "f0ef6b0ae62326f3e7ffdfab6717acfc",
    },
    "svhn": {
        "train_32x32.mat": "e26dedcc434d2e4c54c9b2d4a06d8373",
        "test_32x32.mat": "eb5a983be6a315427106f1b164d9cef3",
    },
}

# published reference accuracies (/root/reference/README.md:33-35)
TARGET_ACC = {"c10": 0.9092, "c100": 0.6654, "svhn": 0.9731}
# reference wall-clock on 1x V100 (BASELINE.md), seconds
REFERENCE_TIME_S = {"c10": 8062, "c100": 8057, "svhn": 12263}
NORTH_STAR_TIME_S = 600  # BASELINE.md: <=10 min on TPU


def check_md5s(dataset: str, data_dir: str) -> list[str]:
    """Returns a list of problems (empty = verified)."""
    problems = []
    for rel, want in ARCHIVE_MD5[dataset].items():
        path = os.path.join(data_dir, rel)
        if not os.path.exists(path):
            problems.append(f"missing: {path}")
            continue
        h = hashlib.md5()
        with open(path, "rb") as f:
            for chunk in iter(lambda: f.read(1 << 20), b""):
                h.update(chunk)
        if h.hexdigest() != want:
            problems.append(f"md5 mismatch: {path} {h.hexdigest()} != {want}")
    return problems


def recipe_config(dataset: str, dry_run: bool, data_dir: str, out_dir: str):
    """The reference README recipe (/root/reference/README.md:63-80)."""
    from vit_cifar_tpu.config import Config

    return Config(
        model_name="vit", dataset=dataset, num_layers=7, hidden=384,
        mlp_hidden=384, head=12, batch_size=128, max_epochs=3 if dry_run else 200,
        warmup_epoch=1 if dry_run else 5, lr=1e-3, min_lr=1e-5,
        weight_decay=5e-5, autoaugment=True, label_smoothing=True,
        precision="bf16-mixed", synthetic_data=dry_run, data_dir=data_dir,
        log_dir=os.path.join(out_dir, "logs"),
        ckpt_dir=os.path.join(out_dir, "ckpt"),
    )


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--dataset", default="c10", choices=sorted(ARCHIVE_MD5))
    ap.add_argument("--data-dir", default="data")
    ap.add_argument("--out-dir", default="logs/realdata_acceptance")
    ap.add_argument("--dry-run", action="store_true",
                    help="synthetic data, 3 epochs, no md5/accuracy gate — "
                         "CI exercises the kit itself")
    ap.add_argument("--tiny", action="store_true",
                    help="with --dry-run: shrink the model/epoch so the CI "
                         "test finishes in seconds on CPU")
    args = ap.parse_args(argv)

    verdict = {"dataset": args.dataset, "dry_run": bool(args.dry_run)}

    if not args.dry_run:
        problems = check_md5s(args.dataset, args.data_dir)
        verdict["md5_verified"] = not problems
        if problems:
            print("ARCHIVE VERIFICATION FAILED:")
            for p in problems:
                print(" ", p)
            print(json.dumps(verdict))
            return 2
        print(f"archives verified ({len(ARCHIVE_MD5[args.dataset])} md5s OK)")

    from vit_cifar_tpu.train.loop import train

    cfg = recipe_config(args.dataset, args.dry_run, args.data_dir,
                        args.out_dir)
    if args.tiny:
        assert args.dry_run, "--tiny is a CI knob; real acceptance runs full"
        cfg = cfg.replace(num_layers=1, hidden=32, mlp_hidden=32, head=4,
                          batch_size=5000, eval_batch_size=5000,
                          max_epochs=1, warmup_epoch=0, autoaugment=False,
                          precision="32")
    t0 = time.time()
    res = train(cfg, verbose=True)
    wall = time.time() - t0

    best_acc = max(row["val_acc"] for row in res["history"])
    verdict.update(
        best_val_acc=round(best_acc, 4),
        final_val_acc=round(res["val_acc"], 4),
        wall_clock_s=round(wall, 1),
        images_per_sec=round(res["images_per_sec"], 1),
        target_acc=TARGET_ACC[args.dataset],
        reference_time_s=REFERENCE_TIME_S[args.dataset],
        north_star_time_s=NORTH_STAR_TIME_S,
        speedup_vs_reference=round(REFERENCE_TIME_S[args.dataset] / wall, 2),
    )

    if args.dry_run:
        verdict["verdict"] = "DRY-RUN OK (synthetic data; no accuracy gate)"
        print(json.dumps(verdict))
        return 0

    ok = best_acc >= TARGET_ACC[args.dataset]
    within_north_star = wall <= NORTH_STAR_TIME_S
    verdict["verdict"] = (
        f"{'PASS' if ok else 'FAIL'}: best_val_acc {best_acc:.4f} "
        f"{'>=' if ok else '<'} {TARGET_ACC[args.dataset]:.4f}; wall "
        f"{wall:.0f}s ({'within' if within_north_star else 'over'} the "
        f"{NORTH_STAR_TIME_S}s north star; reference "
        f"{REFERENCE_TIME_S[args.dataset]}s)"
    )
    print(json.dumps(verdict))
    with open(f"REALDATA_VERDICT_{args.dataset}.json", "w") as f:
        json.dump(verdict, f, indent=2)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
