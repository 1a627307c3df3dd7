"""Data pipeline: dataset loading (HBM-resident), on-device augmentation,
and the on-device AutoAugment port.  Reference: utils.py:337-522,
autoaugment.py, da.py, datasets.py."""
