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
    splits = semi_supervised_split(raw)
    xl, yl = splits["labeled"]
    xv, yv = splits["valid"]
    xu, yu = splits["unlabeled"]
    for c in range(10):
        assert (yl == c).sum() == 400
        assert (yv == c).sum() == 500
    assert (yu == -1).all()
    assert len(xl) + len(xv) + len(xu) == len(raw.x_train)


def test_semi_supervised_training_dry_run(tmp_path):
    from vit_cifar_tpu.config import Config
    from vit_cifar_tpu.train.loop import train

    cfg = Config(model_name="vit", num_layers=1, hidden=48, mlp_hidden=48,
                 head=4, batch_size=16, eval_batch_size=16, precision="32",
                 semi_supervised=True, dry_run=True, synthetic_data=True,
                 log_dir=str(tmp_path / "logs"), ckpt_dir=str(tmp_path / "models"))
    res = train(cfg, verbose=False)
    assert np.isfinite(res["val_loss"])


def test_semi_supervised_non_c10_raises(tmp_path):
    import pytest
    from vit_cifar_tpu.config import Config
    from vit_cifar_tpu.train.loop import train

    cfg = Config(dataset="c100", model_name="vit", semi_supervised=True,
                 synthetic_data=True, dry_run=True,
                 log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    with pytest.raises(NotImplementedError):
        train(cfg, verbose=False)
