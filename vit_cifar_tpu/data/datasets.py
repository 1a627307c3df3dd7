"""Dataset loading.

Reference: ``get_dataloader`` (utils.py:370-522) backed by torchvision
CIFAR10/CIFAR100/SVHN, and the manual pickle-loading semi-supervised
``CIFAR10SS`` (datasets.py:20-301).

TPU-native design: there are no DataLoader worker processes — the whole
dataset is returned as one uint8 numpy array, device_put into HBM once, and
every augmentation runs inside the jitted train step (see train/steps.py).
CIFAR-10 is 147 MB as uint8; trivially HBM-resident.

This image has no network egress, so when the raw archives are absent the
loaders fall back to DETERMINISTIC synthetic data with identical
shapes/dtypes (and a printed warning).  ``synthetic=True`` forces that path.
Real data is read from the standard torchvision on-disk layouts
(``cifar-10-batches-py/``, ``cifar-100-python/``, ``train_32x32.mat``).

Semi-supervised split: per-class quotas of 500 valid / 400 labeled /
rest unlabeled, assigned in dataset order (datasets.py:116-133).  The
reference's "unlabeled targets become -1" line is a no-op expression
(datasets.py:215, a shipped bug); here the unlabeled split really does carry
-1 labels.
"""

from __future__ import annotations

import os
import pickle
from typing import NamedTuple

import numpy as np

_SIZES = {
    "c10": (50_000, 10_000, 10),
    "c100": (50_000, 10_000, 100),
    "svhn": (73_257, 26_032, 10),
}
_SYNTH_GEN = "v2"  # chunked float32 generator (round 3)


class RawData(NamedTuple):
    x_train: np.ndarray  # (N, H, W, C) uint8
    y_train: np.ndarray  # (N,) int32
    x_test: np.ndarray
    y_test: np.ndarray
    num_classes: int
    synthetic: bool = False


def _synthetic(dataset: str) -> RawData:
    """Deterministic, class-structured synthetic data (same shapes as real)."""
    n_train, n_test, n_classes = _SIZES[dataset]
    rng = np.random.default_rng({"c10": 10, "c100": 100, "svhn": 3}[dataset])
    # class templates: low-frequency patterns so the task is learnable
    yy, xx = np.mgrid[0:32, 0:32].astype(np.float32) / 31.0
    templates = np.stack(
        [
            127.5
            + 80 * np.sin(2 * np.pi * ((c % 7 + 1) * xx + (c // 7) * yy))[..., None]
            * np.array([1.0, (c % 3) - 1.0, 1.0 - (c % 2) * 2])
            for c in range(n_classes)
        ]
    )  # (C, 32, 32, 3)

    templates = templates.astype(np.float32)

    def make(n, seed_rng):
        y = np.tile(np.arange(n_classes, dtype=np.int32), -(-n // n_classes))[:n]
        # chunked float32 generation: the one-shot float64 version peaked at
        # ~5 GB of intermediates and took ~78 s on this 1-CPU box (measured,
        # round 3) — this takes ~3 s with a ~100 MB peak
        x = np.empty((n, 32, 32, 3), np.uint8)
        chunk = 8192
        for i in range(0, n, chunk):
            j = min(n, i + chunk)
            noise = seed_rng.standard_normal((j - i, 32, 32, 3), dtype=np.float32)
            noise *= 40.0
            noise += templates[y[i:j]]
            np.clip(noise, 0, 255, out=noise)
            x[i:j] = noise.astype(np.uint8)
        return x, y

    x_train, y_train = make(n_train, rng)
    x_test, y_test = make(n_test, rng)
    return RawData(x_train, y_train, x_test, y_test, n_classes, synthetic=True)


def _load_cifar10(root: str) -> RawData | None:
    d = os.path.join(root, "cifar-10-batches-py")
    if not os.path.isdir(d):
        return None
    xs, ys = [], []
    for i in range(1, 6):
        with open(os.path.join(d, f"data_batch_{i}"), "rb") as f:
            b = pickle.load(f, encoding="bytes")
        xs.append(b[b"data"])
        ys.extend(b[b"labels"])
    with open(os.path.join(d, "test_batch"), "rb") as f:
        b = pickle.load(f, encoding="bytes")
    x_train = np.concatenate(xs).reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    x_test = b[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
    return RawData(
        np.ascontiguousarray(x_train), np.asarray(ys, np.int32),
        np.ascontiguousarray(x_test), np.asarray(b[b"labels"], np.int32), 10,
    )


def _load_cifar100(root: str) -> RawData | None:
    d = os.path.join(root, "cifar-100-python")
    if not os.path.isdir(d):
        return None
    out = []
    for name in ("train", "test"):
        with open(os.path.join(d, name), "rb") as f:
            b = pickle.load(f, encoding="bytes")
        x = b[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1)
        out.append((np.ascontiguousarray(x), np.asarray(b[b"fine_labels"], np.int32)))
    (xtr, ytr), (xte, yte) = out
    return RawData(xtr, ytr, xte, yte, 100)


def _load_svhn(root: str) -> RawData | None:
    tr, te = os.path.join(root, "train_32x32.mat"), os.path.join(root, "test_32x32.mat")
    if not (os.path.exists(tr) and os.path.exists(te)):
        return None
    from scipy.io import loadmat

    out = []
    for p in (tr, te):
        m = loadmat(p)
        x = np.ascontiguousarray(m["X"].transpose(3, 0, 1, 2))  # HWCN -> NHWC
        y = m["y"].reshape(-1).astype(np.int32) % 10  # torchvision: label 10 -> 0
        out.append((x, y))
    (xtr, ytr), (xte, yte) = out
    return RawData(xtr, ytr, xte, yte, 10)


def load_dataset(dataset: str, data_dir: str = "data", synthetic: bool = False) -> RawData:
    if dataset not in _SIZES:
        raise NotImplementedError(f"dataset {dataset!r}")
    if not synthetic:
        loader = {"c10": _load_cifar10, "c100": _load_cifar100, "svhn": _load_svhn}
        raw = loader[dataset](data_dir)
        if raw is not None:
            return raw
        print(
            f"[vit_cifar_tpu] {dataset} archives not found under {data_dir!r} "
            "(no network egress in this environment) — using deterministic "
            "synthetic data with identical shapes."
        )
    return _synthetic_cached(dataset)


def _synthetic_cached(dataset: str) -> RawData:
    """Memoized-on-disk synthetic data: generation is RNG-bound (~23 s for
    c10 on this 1-CPU box even chunked), and every training run and most
    tests pay it.  The cache lives under /tmp (the repo's data/ dir is
    reserved for real archives) and memory-maps in ~0.1 s."""
    # bump _SYNTH_GEN when the generator changes, or stale caches poison runs
    cache = os.path.join("/tmp", f"vit_cifar_tpu_synth_{_SYNTH_GEN}_{dataset}")
    names = ("x_train", "y_train", "x_test", "y_test")
    try:
        if all(os.path.exists(os.path.join(cache, n + ".npy")) for n in names):
            arrs = [
                np.load(os.path.join(cache, n + ".npy"), mmap_mode="r")
                for n in names
            ]
            return RawData(*arrs, _SIZES[dataset][2], synthetic=True)
    except Exception:
        pass  # unreadable cache: regenerate
    raw = _synthetic(dataset)
    try:
        os.makedirs(cache, exist_ok=True)
        for n in names:
            tmp = os.path.join(cache, f".{n}.{os.getpid()}.npy")
            np.save(tmp, getattr(raw, n))
            os.replace(tmp, os.path.join(cache, n + ".npy"))  # atomic vs races
    except Exception:
        pass  # read-only /tmp: just skip caching
    return raw


def semi_supervised_split(raw: RawData, n_valid: int = 500, n_labeled: int = 400):
    """Per-class quota split in dataset order (datasets.py:116-133).

    Returns {"labeled": (x, y), "valid": (x, y), "unlabeled": (x, -1),
    "test": (x, y)}.
    """
    counts = np.zeros(raw.num_classes, np.int64)
    split_id = np.empty(len(raw.y_train), np.int8)  # 0=valid 1=labeled 2=unlabeled
    for i, y in enumerate(raw.y_train):
        c = counts[y]
        split_id[i] = 0 if c < n_valid else (1 if c < n_valid + n_labeled else 2)
        counts[y] += 1
    out = {}
    for sid, name in [(1, "labeled"), (0, "valid"), (2, "unlabeled")]:
        m = split_id == sid
        x, y = raw.x_train[m], raw.y_train[m].copy()
        if name == "unlabeled":
            # the reference INTENDS -1 targets but its replacement line is a
            # no-op expression (datasets.py:215); implemented for real here
            y[:] = -1
        out[name] = (x, y)
    out["test"] = (raw.x_test, raw.y_test)
    return out
