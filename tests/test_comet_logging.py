"""Comet logging paths, executed against a recording stub.

comet_ml is not in this image, so the Comet branch of the logger
(utils/logging.py CometLogger), the 3D-histogram path
(utils/observability.log_histograms), and the end-of-fit model upload
(train/loop.py) would otherwise never run.  Reference behaviors covered:
Comet experiment creation + naming + tags (main.py:201-211,
utils.py:550-556), per-epoch metric logging (network.py:206-208),
log_histogram_3d for weights/layer outputs/gradients (network.py:229-374),
and the final log_model upload (main.py:239-242).
"""

from __future__ import annotations

import sys
import types

import pytest

from vit_cifar_tpu.config import Config


class _StubExperiment:
    def __init__(self, **kw):
        self.kw = kw
        self.name = None
        self.tags = []
        self.metrics = []  # (dict, step, epoch)
        self.histograms = []  # (name, n_values, step)
        self.models = []  # (name, path)
        self.ended = False

    def set_name(self, name):
        self.name = name

    def add_tag(self, tag):
        self.tags.append(tag)

    def log_metrics(self, metrics, step=None, epoch=None):
        self.metrics.append((dict(metrics), step, epoch))

    def log_histogram_3d(self, values, name=None, step=None, epoch=None):
        self.histograms.append((name, len(values), step))

    def log_model(self, name, path):
        self.models.append((name, path))

    def end(self):
        self.ended = True


@pytest.fixture
def comet_stub(monkeypatch):
    created = []

    def experiment_factory(**kw):
        exp = _StubExperiment(**kw)
        created.append(exp)
        return exp

    mod = types.ModuleType("comet_ml")
    mod.Experiment = experiment_factory
    mod.config = types.SimpleNamespace(get_global_experiment=lambda: None)
    monkeypatch.setitem(sys.modules, "comet_ml", mod)
    return created


def test_comet_logger_metrics_and_tags(comet_stub, tmp_path):
    from vit_cifar_tpu.utils.logging import CometLogger

    lg = CometLogger(str(tmp_path), "exp1", api_key="k", project="p",
                     tags=["vit", "no-query"])
    lg.log(step=10, epoch=0, loss=1.5, val_acc=0.5)
    lg.finalize()

    (exp,) = comet_stub
    assert exp.kw["api_key"] == "k" and exp.kw["project_name"] == "p"
    assert exp.name == "exp1"
    assert exp.tags == ["vit", "no-query"]
    assert exp.metrics == [({"loss": 1.5, "val_acc": 0.5}, 10, 0)]
    assert exp.ended
    # CSV fallback still written alongside (main.py:201-211 selects one OR the
    # other; we keep both so artifacts survive a Comet outage)
    assert (tmp_path / "exp1" / "metrics.csv").exists()


def test_log_histograms_comet_path(comet_stub, tmp_path):
    import numpy as np

    from vit_cifar_tpu.utils.logging import CometLogger
    from vit_cifar_tpu.utils.observability import log_histograms

    lg = CometLogger(str(tmp_path), "exp2", api_key="k", project="p")
    tree = {"enc0": {"kernel": np.ones((4, 3), np.float32)},
            "bias": np.zeros(7, np.float32)}
    log_histograms(lg, tree, "weights", step=3, epoch=1)

    (exp,) = comet_stub
    names = sorted(n for n, _, _ in exp.histograms)
    assert names == ["weights/bias", "weights/enc0/kernel"]
    sizes = {n: c for n, c, _ in exp.histograms}
    assert sizes["weights/enc0/kernel"] == 12 and sizes["weights/bias"] == 7
    # comet path replaces the .npz fallback, not duplicates it
    assert not (tmp_path / "exp2" / "histograms").exists()


def test_train_end_to_end_with_comet(comet_stub, tmp_path):
    """A 2-epoch dry-ish run with comet_api_key set drives every Comet call
    site in the loop: per-epoch metrics, weight/layer-output histograms,
    gradient histograms (log_gradients), and the final model upload."""
    from vit_cifar_tpu.train.loop import train

    cfg = Config(model_name="vit", num_layers=1, hidden=32, mlp_hidden=32,
                 head=4, batch_size=2000, eval_batch_size=5000, precision="32",
                 synthetic_data=True, warmup_epoch=0, max_epochs=2,
                 comet_api_key="fake-key", log_gradients=True,
                 log_gradients_interval=1,
                 log_dir=str(tmp_path / "l"), ckpt_dir=str(tmp_path / "m"))
    res = train(cfg, verbose=False)

    (exp,) = comet_stub
    assert exp.name == res["experiment"]
    assert "vit" in exp.tags
    # per-epoch metric rows with val stats (network.py:206-208, 388-395)
    epoch_rows = [m for m, _, _ in exp.metrics if "val_acc" in m]
    assert len(epoch_rows) == 2
    pfx = {n.split("/")[0] for n, _, _ in exp.histograms}
    assert {"weights", "layer_outputs", "grads"} <= pfx
    # final model upload (main.py:239-242)
    assert exp.models == [(res["experiment"], res["ckpt_dir"])]
    assert exp.ended
