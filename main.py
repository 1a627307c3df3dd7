"""Training entry point — equivalent of the reference's ``main.py``.

    python main.py --dataset c10 --model-name vit --label-smoothing --autoaugment

Same CLI surface (see vit_cifar_tpu/config.py); runs the jitted TPU train loop.
"""

from __future__ import annotations

from pprint import pprint

from vit_cifar_tpu.config import config_from_args
from vit_cifar_tpu.train import train


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
