import numpy as np

from vit_cifar_tpu.data.datasets import RawData, load_dataset, semi_supervised_split


def test_synthetic_shapes():
    raw = load_dataset("c10", synthetic=True)
    assert raw.x_train.shape == (50000, 32, 32, 3)
    assert raw.x_train.dtype == np.uint8
    assert raw.y_train.shape == (50000,)
    assert raw.x_test.shape == (10000, 32, 32, 3)
    assert raw.num_classes == 10
    assert raw.synthetic


def test_synthetic_deterministic():
    a = load_dataset("c10", synthetic=True)
    b = load_dataset("c10", synthetic=True)
    np.testing.assert_array_equal(a.x_train[:10], b.x_train[:10])


def test_synthetic_c100():
    raw = load_dataset("c100", synthetic=True)
    assert raw.num_classes == 100
    assert raw.y_train.max() == 99


def test_semi_supervised_split_quotas():
    # datasets.py:116-133: per class 500 valid, 400 labeled, rest unlabeled
    raw = load_dataset("c10", synthetic=True)
    splits = semi_supervised_split(raw, seed=0)
    xl, yl = splits["labeled"]
    xv, yv = splits["valid"]
    xu, yu = splits["unlabeled"]
    for c in range(10):
        assert (yl == c).sum() == 400
        assert (yv == c).sum() == 500
    assert (yu == -1).all()
    assert len(xl) + len(xv) + len(xu) == len(raw.x_train)
