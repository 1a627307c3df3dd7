"""Mesh construction, multi-host init wrapper, and semi-supervised epoch
pacing (CombinedLoader parity)."""

import jax
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.parallel.mesh import (
    batch_sharding,
    initialize_multihost,
    make_mesh,
    replicated_sharding,
)


def test_make_mesh_default_covers_all_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("data",)


def test_make_mesh_2d_layout():
    mesh = make_mesh((4, 2), ("data", "model"))
    assert mesh.devices.shape == (4, 2)
    assert mesh.axis_names == ("data", "model")


def test_shardings():
    mesh = make_mesh((8,), ("data",))
    bs = batch_sharding(mesh, ndim=2)
    rs = replicated_sharding(mesh)
    assert bs.spec[0] == "data" and bs.spec[1] is None
    assert all(s is None for s in rs.spec)


def test_initialize_multihost_single_process_noop():
    """Without a coordinator, the wrapper degrades to single-process info —
    validating the code path the real pod launch goes through."""
    info = initialize_multihost()
    assert info["process_count"] == 1
    assert info["process_index"] == 0
    assert info["global_device_count"] == len(jax.devices())


def test_ss_combined_epoch_pacing(tmp_path):
    """CombinedLoader parity (utils.py:419-436): the labeled split repeats
    ~|unlabeled|/|labeled| times per epoch."""
    from vit_cifar_tpu.train.checkpoint import load_checkpoint
    from vit_cifar_tpu.train.loop import train

    cfg = Config(model_name="vit", num_layers=1, hidden=32, mlp_hidden=32,
                 head=4, batch_size=2000, eval_batch_size=5000, precision="32",
                 semi_supervised=True, synthetic_data=True, warmup_epoch=0,
                 max_epochs=1, log_dir=str(tmp_path / "l"),
                 ckpt_dir=str(tmp_path / "m"))
    res = train(cfg, verbose=False)
    payload, _ = load_checkpoint(res["ckpt_dir"], prefer="last")
    # labeled = 4000 -> 2 steps/pass; unlabeled = 50000-9000 = 41000 -> 10 passes
    assert int(payload["step"]) == 2 * 10

    cfg2 = cfg.replace(ss_combined_epoch=False,
                       log_dir=str(tmp_path / "l2"), ckpt_dir=str(tmp_path / "m2"))
    res2 = train(cfg2, verbose=False)
    payload2, _ = load_checkpoint(res2["ckpt_dir"], prefer="last")
    assert int(payload2["step"]) == 2
