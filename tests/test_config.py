import dataclasses

from vit_cifar_tpu.config import Config, config_from_args


def test_defaults_match_reference():
    cfg = Config()
    # reference defaults: main.py:22 (model "ae"), main.py:89 (1 layer),
    # main.py:54 (100 epochs), main.py:150 (seed 2045)
    assert cfg.model_name == "ae"
    assert cfg.num_layers == 1
    assert cfg.max_epochs == 100
    assert cfg.seed == 2045
    assert cfg.batch_size == 128
    assert cfg.eval_batch_size == 256


def test_derived_fields():
    cfg = Config(dataset="c10", patch=8)
    assert cfg.num_classes == 10
    assert cfg.seq_len == 65  # main.py:184
    assert cfg.patch_size == 4
    cfg = cfg.replace(is_cls_token=False)
    assert cfg.seq_len == 64
    assert Config(dataset="c100").num_classes == 100
    assert Config(dataset="svhn").num_classes == 10


def test_json_roundtrip():
    cfg = Config(model_name="vit", num_layers=7, label_smoothing=True, mesh_shape=(4, 2))
    cfg2 = Config.from_json(cfg.to_json())
    assert cfg == cfg2


def test_cli_parsing():
    cfg = config_from_args(
        ["--dataset", "c100", "--model-name", "vit", "--label-smoothing",
         "--autoaugment", "--num-layers", "7", "--off-cls-token"]
    )
    assert cfg.dataset == "c100"
    assert cfg.model_name == "vit"
    assert cfg.label_smoothing and cfg.autoaugment
    assert cfg.num_layers == 7
    assert not cfg.is_cls_token


def test_cli_defaults_equal_dataclass_defaults():
    cfg = config_from_args([])
    assert cfg == Config()


def test_config_hashable():
    # Config must be hashable so it can be a static jit argument
    d = {Config(): 1}
    assert d[Config()] == 1


def test_bench_retry_emits_error_json_when_backend_unavailable(monkeypatch, capsys):
    """bench.py's relay-outage path: after the retry budget it must still
    print ONE well-formed JSON line (the driver parses stdout) and exit 1."""
    import importlib.util
    import json as _json

    spec = importlib.util.spec_from_file_location("bench", "/root/repo/bench.py")
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    monkeypatch.setenv("BENCH_RETRY", "5")
    monkeypatch.setattr(bench, "_backend_ready", lambda: False)
    import pytest

    with pytest.raises(SystemExit) as ei:
        bench.main_with_retries()
    assert ei.value.code == 1
    line = capsys.readouterr().out.strip().splitlines()[-1]
    payload = _json.loads(line)
    assert payload["metric"] == "train_images_per_sec"
    assert payload["value"] == 0.0
    assert "error" in payload


def test_flag_plumbing_reaches_model_factory():
    """Regression fence for flag->mechanism wiring: every numerics-affecting
    config flag whose ONLY job is plumbing into the model factory must
    actually arrive there (the mechanisms themselves are tested at ops level
    under their own names; this pins the cfg.<flag> -> module-kwarg hop)."""
    from vit_cifar_tpu.models import get_model, nnmf_params_from_cfg

    # NNMF learning-rule flags (network.py:19-33 _nnmf_params)
    p = nnmf_params_from_cfg(Config(nnmf_local_learning=True, nnmf_scale_grade=True))
    assert p.local_learning and p.keep_last_grad_scale and not p.disable_scale_grade
    p = nnmf_params_from_cfg(Config(nnmf_scale_grade=False))
    assert not p.keep_last_grad_scale and p.disable_scale_grade

    # AEAttentionHeads mask chunking (layers.py:987-1005 chunked mask matmul)
    m, _ = get_model(Config(model_name="ae", ae_type="heads", ae_mask_chunk=7))
    assert m.mixer.keywords["mask_chunk"] == 7

    # AE_transpose is parsed but consumed NOWHERE in the reference
    # (main.py:129 is its only occurrence) — dead-flag parity: we parse it
    # identically and deliberately never plumb it.
    assert config_from_args(["--ae-transpose"]).AE_transpose is True
    m, _ = get_model(Config(model_name="ae", AE_transpose=True))
    assert "AE_transpose" not in getattr(m.mixer, "keywords", {})

    # Switch-MoE capacity factor (ops/moe.py expert buffer sizing)
    m, _ = get_model(Config(model_name="vit", moe_experts=4, moe_capacity_factor=2.5))
    assert m.mlp_factory.keywords["capacity_factor"] == 2.5
