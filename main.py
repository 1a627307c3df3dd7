"""Training entry point — equivalent of the reference's ``main.py``.

    python main.py --dataset c10 --model-name vit --label-smoothing --autoaugment

Same CLI surface (see vit_cifar_tpu/config.py); runs the jitted TPU train
loop.  Also installed as the ``vit-cifar-tpu`` console script
(vit_cifar_tpu/cli.py).
"""

from __future__ import annotations

from vit_cifar_tpu.cli import main

if __name__ == "__main__":
    main()
