"""Installed console entry point (``vit-cifar-tpu``) — same surface as the
repo-root ``main.py`` (the reference's ``python main.py`` CLI)."""

from __future__ import annotations

from pprint import pprint

from .config import config_from_args
from .train import train


def main(argv=None):
    cfg = config_from_args(argv)
    pprint({k: v for k, v in cfg.__dict__.items()})
    result = train(cfg)
    print(
        f"Finished '{result['experiment']}': "
        f"val_acc={result['val_acc']:.4f} val_loss={result['val_loss']:.4f} "
        f"({result['images_per_sec']:.0f} img/s, {result['total_time_s']:.1f}s)"
    )
    return result


if __name__ == "__main__":
    main()
