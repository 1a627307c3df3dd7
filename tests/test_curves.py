import os

from vit_cifar_tpu.analysis.curves import plot_curves, read_metrics
from vit_cifar_tpu.utils.logging import CSVLogger


def test_curves_from_logger_output(tmp_path):
    logger = CSVLogger(str(tmp_path), "exp")
    for e in range(3):
        logger.log(e * 10, e, loss=1.0 / (e + 1), acc=0.3 * e,
                   val_loss=1.2 / (e + 1), val_acc=0.25 * e)
    logger.flush()
    cols = read_metrics(logger.dir)
    assert len(cols["loss"]) == 3
    out = plot_curves([logger.dir], out_dir=str(tmp_path / "imgs"))
    assert all(os.path.exists(p) for p in out)
    assert {os.path.basename(p) for p in out} == {"acc.png", "loss.png"}
