"""Serving export (deploy.py): checkpoint -> self-contained jax.export
artifact with the exact eval preprocessing baked in.

No reference equivalent (run_model.py re-runs the training stack; SURVEY §2.8)
— the contract is self-parity: served logits must equal the in-framework
eval forward, from a deserialized artifact, at ANY batch size (symbolic
batch dim)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np

from vit_cifar_tpu.config import Config
from vit_cifar_tpu.data.augment import normalize
from vit_cifar_tpu.deploy import export_inference, load_inference
from vit_cifar_tpu.models import get_model
from vit_cifar_tpu.train.checkpoint import save_checkpoint
from vit_cifar_tpu.train.loop import init_state
from vit_cifar_tpu.train.optim import make_optimizer


def _make_ckpt(tmp_path, **cfg_kw):
    base = dict(model_name="vit", num_layers=2, hidden=32, mlp_hidden=32,
                head=4, patch=8, precision="32", synthetic_data=True)
    base.update(cfg_kw)
    cfg = Config(**base)
    model, _ = get_model(cfg)
    state = init_state(cfg, model, make_optimizer(cfg, 4),
                       jnp.zeros((2, 32, 32, 3), jnp.float32))
    ckpt = os.path.join(tmp_path, "ckpt")
    save_checkpoint(ckpt, {"params": jax.device_get(state.params),
                           "model_state": jax.device_get(state.model_state)},
                    cfg)
    return cfg, model, state, ckpt


def test_export_serves_eval_logits_at_any_batch_size(tmp_path):
    cfg, model, state, ckpt = _make_ckpt(tmp_path)
    out = export_inference(ckpt, os.path.join(tmp_path, "art"))

    served = load_inference(out)
    rng = np.random.default_rng(0)
    for B in (3, 8):  # symbolic batch: one artifact, several sizes
        imgs = rng.integers(0, 256, (B, 32, 32, 3), dtype=np.uint8)
        got = served.predict(imgs)
        x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(
            cfg.compute_dtype)
        want = model.apply({"params": state.params, **state.model_state},
                           x, deterministic=True)
        np.testing.assert_allclose(got, np.asarray(want, np.float32),
                                   rtol=1e-6, atol=1e-6)
        assert got.shape == (B, 10) and got.dtype == np.float32

    meta = served.meta
    assert meta["model_name"] == "vit"
    assert meta["input"] == "uint8[b,32,32,3]"
    assert meta["output"] == "float32[b,10]"
    assert meta["bytes"] == os.path.getsize(
        os.path.join(out, "serving.jaxexport"))


def test_export_artifact_is_standalone(tmp_path):
    """The serving process needs only jax + the two files: deserialization
    must not read the checkpoint or rebuild the model."""
    _, _, _, ckpt = _make_ckpt(tmp_path)
    out = export_inference(ckpt, os.path.join(tmp_path, "art"))
    # remove the checkpoint entirely; the artifact must still serve
    import shutil

    shutil.rmtree(ckpt)
    served = load_inference(out)
    logits = served.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert np.isfinite(logits).all()
    with open(os.path.join(out, "serving.json")) as f:
        assert json.load(f)["platforms"]


def _zoo_export_cases():
    """One export case per zoo family (round-4 verdict next-step #5: the
    custom-VJP NNMF and EMA-bases hamburger paths under jax.export are
    exactly where export breaks silently).  Tiny shapes; every model name
    from config.MODEL_NAMES plus the EMA-bases hamburger variant."""
    from vit_cifar_tpu.config import MODEL_NAMES

    cases = []
    for name in MODEL_NAMES:
        kw = {"model_name": name}
        if name.startswith(("hamburger", "gnnmf")) or name == "ae":
            kw.update(head=1, ffn_features=16, md_iter=2)
        if name.startswith("aft"):
            kw.update(head=1)
        if name in ("gmlp", "wgmlp", "linear", "ae_baseline"):
            kw.update(ffn_features=16)
        if name == "lgcnn":
            kw.update(ffn_features=16, kernel_size=3)
        if name == "wlgcnn":
            # the weight-gated mixer requires hidden_features == 2*channels
            # (models/cnn.py WeightLocalGlobalConvolution, layers.py:690)
            kw.update(ffn_features=64, kernel_size=3)
        cases.append((name, kw))
    # persistent EMA bases: inference reads the 'state' collection baked
    # into the artifact
    cases.append(("hamburger_ema", {"model_name": "hamburger", "head": 1,
                                    "ffn_features": 16, "md_iter": 2,
                                    "train_md_bases": True}))
    return cases


import pytest


@pytest.mark.parametrize("label,kw", _zoo_export_cases(),
                         ids=[c[0] for c in _zoo_export_cases()])
def test_export_covers_full_zoo(tmp_path, label, kw):
    """Every zoo family exports, deserializes, and serves logits equal to
    the in-framework eval forward."""
    cfg, model, state, ckpt = _make_ckpt(tmp_path, **kw)
    out = export_inference(ckpt, os.path.join(tmp_path, "art"))
    served = load_inference(out)
    imgs = np.random.default_rng(2).integers(
        0, 256, (3, 32, 32, 3), dtype=np.uint8)
    got = served.predict(imgs)
    x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(
        cfg.compute_dtype)
    want = model.apply({"params": state.params, **state.model_state},
                       x, deterministic=True)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=1e-5, atol=1e-5, err_msg=label)
    assert got.shape == (3, cfg.num_classes)


def test_http_serving_endpoint(tmp_path):
    """The stdlib serving endpoint (deploy.make_http_server): raw-.npy and
    JSON bodies both predict; logits equal the in-framework eval forward;
    meta and health respond."""
    import io
    import threading
    import urllib.request

    from vit_cifar_tpu.deploy import make_http_server

    cfg, model, state, ckpt = _make_ckpt(tmp_path)
    out = export_inference(ckpt, os.path.join(tmp_path, "art"))
    srv = make_http_server(out, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert json.loads(urllib.request.urlopen(
            f"{base}/healthz", timeout=60).read())["ok"]
        meta = json.loads(urllib.request.urlopen(
            f"{base}/meta", timeout=60).read())
        assert meta["model_name"] == "vit"

        imgs = np.random.default_rng(3).integers(
            0, 256, (4, 32, 32, 3), dtype=np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        req = urllib.request.Request(
            f"{base}/predict", data=buf.getvalue(), method="POST",
            headers={"Content-Type": "application/octet-stream"})
        got = json.loads(urllib.request.urlopen(req, timeout=300).read())
        x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(
            cfg.compute_dtype)
        want = model.apply({"params": state.params, **state.model_state},
                           x, deterministic=True)
        np.testing.assert_allclose(np.asarray(got["logits"], np.float32),
                                   np.asarray(want, np.float32),
                                   rtol=1e-5, atol=1e-5)
        assert got["pred"] == list(np.argmax(np.asarray(want), -1))

        # JSON body, different batch size (symbolic batch)
        req = urllib.request.Request(
            f"{base}/predict",
            data=json.dumps({"images": imgs[:2].tolist()}).encode(),
            method="POST", headers={"Content-Type": "application/json"})
        got2 = json.loads(urllib.request.urlopen(req, timeout=300).read())
        np.testing.assert_allclose(np.asarray(got2["logits"], np.float32),
                                   np.asarray(want[:2], np.float32),
                                   rtol=1e-5, atol=1e-5)

        # malformed body -> 400 with an error payload, server stays up
        req = urllib.request.Request(
            f"{base}/predict", data=b"garbage", method="POST",
            headers={"Content-Type": "application/json"})
        try:
            urllib.request.urlopen(req, timeout=60)
            assert False, "expected HTTP 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        srv.shutdown()


def test_export_quantized_int8(tmp_path):
    """--quantize int8: weight-only per-channel symmetric quantization of
    the exported kernels.  Contract: artifact meaningfully smaller (the
    kernels ship as int8 + f32 scales instead of f32), logits within the
    quantization noise of the float artifact, predictions preserved."""
    cfg, model, state, ckpt = _make_ckpt(tmp_path, hidden=128, mlp_hidden=128)
    out_f = export_inference(ckpt, os.path.join(tmp_path, "art_f32"))
    out_q = export_inference(ckpt, os.path.join(tmp_path, "art_int8"),
                             quantize="int8")

    f32 = load_inference(out_f)
    q = load_inference(out_q)
    assert q.meta["quantize"] == "int8"
    # weight bytes are 4x smaller; the fixed StableHLO program overhead
    # keeps the whole-file ratio above 1/4
    assert q.meta["bytes"] < 0.6 * f32.meta["bytes"], (
        q.meta["bytes"], f32.meta["bytes"])

    imgs = np.random.default_rng(4).integers(
        0, 256, (16, 32, 32, 3), dtype=np.uint8)
    got_f, got_q = f32.predict(imgs), q.predict(imgs)
    err = np.abs(got_q - got_f)
    scale = np.abs(got_f).max()
    assert err.max() <= 0.05 * scale + 0.05, (err.max(), scale)
    # top-1 must survive weight-only int8 on all 16 images
    np.testing.assert_array_equal(got_q.argmax(-1), got_f.argmax(-1))


def test_quantize_rejects_unknown_mode(tmp_path):
    _, _, _, ckpt = _make_ckpt(tmp_path)
    with pytest.raises(ValueError, match="unknown quantize mode"):
        export_inference(ckpt, os.path.join(tmp_path, "art"), quantize="fp4")


def test_export_covers_moe_model(tmp_path):
    """The Switch-MoE dispatch einsums must trace under a symbolic batch."""
    cfg, model, state, ckpt = _make_ckpt(tmp_path, moe_experts=4)
    out = export_inference(ckpt, os.path.join(tmp_path, "art"))
    served = load_inference(out)
    imgs = np.random.default_rng(1).integers(
        0, 256, (5, 32, 32, 3), dtype=np.uint8)
    got = served.predict(imgs)
    x = normalize(jnp.asarray(imgs), cfg.mean, cfg.std).astype(cfg.compute_dtype)
    want = model.apply({"params": state.params, **state.model_state},
                       x, deterministic=True)
    np.testing.assert_allclose(got, np.asarray(want, np.float32),
                               rtol=1e-6, atol=1e-6)
