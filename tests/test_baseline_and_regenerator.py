"""BaselineCNN (working cnn_baseline equivalent) and the regenerator study."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.models import get_model


def test_cnn_baseline_forward():
    cfg = Config(model_name="cnn_baseline", precision="32")
    model, can_unsup = get_model(cfg)
    assert not can_unsup
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
         "mask": jax.random.PRNGKey(2)}, x, deterministic=True,
    )
    assert "batch_stats" in variables  # CNN builder uses BatchNorm
    out = model.apply(variables, x, deterministic=True)
    assert out.shape == (2, 10)


def test_ann_cnn_builders():
    from vit_cifar_tpu.ops.basic import ANN, CNN

    ann = ANN(layers=(12, 8, 4))
    v = ann.init(jax.random.PRNGKey(0), jnp.zeros((2, 12)))
    out = ann.apply(v, jnp.ones((2, 12)))
    assert out.shape == (2, 4)
    assert float(out.min()) >= 0  # trailing ReLU (reference quirk)

    cnn = CNN(features=(3, 8))
    v = cnn.init(jax.random.PRNGKey(0), jnp.zeros((2, 16, 16, 3)))
    out = cnn.apply(v, jnp.ones((2, 16, 16, 3)), deterministic=True)
    # conv VALID 3x3 -> 14x14, maxpool -> 7x7
    assert out.shape == (2, 7, 7, 8)


def test_regenerator_study_smoke(tmp_path, monkeypatch):
    from vit_cifar_tpu.analysis import regenerator as regen
    from vit_cifar_tpu.data import datasets

    # shrink the dataset so one "epoch" is 2 steps
    real_load = datasets.load_dataset

    def small_load(dataset, data_dir="data", synthetic=False):
        raw = real_load(dataset, data_dir, synthetic=True)
        return datasets.RawData(
            raw.x_train[:64], raw.y_train[:64], raw.x_test[:16], raw.y_test[:16],
            raw.num_classes, synthetic=True,
        )

    monkeypatch.setattr(regen, "load_dataset", small_load)
    hist = regen.run_study(
        epochs=1, batch_size=32, hidden=48, patch=8, log_interval=2,
        out_dir=str(tmp_path), synthetic=True, verbose=False,
    )
    assert len(hist) == 1
    assert np.isfinite(hist[0]["loss"])
    assert np.isfinite(hist[0]["score"])
    assert os.path.exists(tmp_path / "reconstruction.png")
    assert os.path.exists(tmp_path / "metrics.csv")


def test_regenerator_score_matrix_shapes():
    from vit_cifar_tpu.analysis.regenerator import RegeneratorNet, score_matrices

    model = RegeneratorNet(hidden=24, patch=4, ae_hidden=8)
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), x)
    regen_in, masked_out = model.apply(variables, x, mask=True)
    T = 17  # 4*4 + cls
    assert regen_in.shape == (2, T, 24)
    assert masked_out.shape == (2, T, T, 24)
    cos, mse = score_matrices(regen_in, masked_out)
    assert cos.shape == (2, T, T) and mse.shape == (2, T, T)
