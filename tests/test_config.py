"""Config system: dict/JSON round trips, type coercion, interactive
override, report formatting."""

import json

import pytest

from genome_minimizer_2_tpu.utils.config import (
    ExperimentConfig,
    config_report,
    get_preset_config,
)


def test_update_from_dict_coercion(capsys):
    cfg = ExperimentConfig()
    cfg.update_from_dict({
        "hidden_dim": "64", "learning_rate": "0.01", "save_model": "false",
        "bogus_param": 1,
    })
    assert cfg.hidden_dim == 64
    assert cfg.learning_rate == 0.01
    assert cfg.save_model is False
    out = capsys.readouterr().out
    assert "bogus_param" in out  # reported as invalid


def test_json_roundtrip(tmp_path, capsys):
    cfg = get_preset_config("v3")
    path = tmp_path / "c.json"
    cfg.save_to_json(str(path))
    loaded = ExperimentConfig()
    loaded.load_from_json(str(path))
    assert loaded.to_dict() == cfg.to_dict()
    # missing file is a no-op with a message
    loaded.load_from_json(str(tmp_path / "missing.json"))


def test_interactive_override(monkeypatch):
    cfg = ExperimentConfig()
    answers = iter(["128", "", "skip"])
    monkeypatch.setattr("builtins.input", lambda prompt="": next(answers))
    cfg.interactive_override()
    assert cfg.hidden_dim == 128  # first field updated
    assert cfg.latent_dim == 32   # second kept (empty input), then skipped


def test_config_report_contains_all_sections():
    text = config_report(get_preset_config("v1"))
    for section in ["Model Parameters", "Training Parameters", "Loss Scheduling",
                    "Trainer", "Scheduler", "Data Split", "Output", "TPU"]:
        assert section in text
    assert "trainer_version" in text and "v1" in text


def test_presets_match_reference_values():
    """Preset fields mirror experiments.py:42-114 exactly."""
    v0 = get_preset_config("v0")
    assert (v0.hidden_dim, v0.latent_dim, v0.lambda_l1) == (1024, 64, 0.0)
    assert (v0.min_beta, v0.max_beta) == (0.1, 1.0)
    v2 = get_preset_config("v2")
    assert v2.min_beta == 0.0 and v2.lambda_l1 == 0.01
    v3 = get_preset_config("v3")
    assert v3.gamma_start == 2.0 and v3.weight == 1.0 and v3.patience == 20
    for v in ("v0", "v1", "v2", "v3"):
        cfg = get_preset_config(v)
        assert cfg.n_epochs == 10000
        assert cfg.batch_size == 32
        assert cfg.learning_rate == 1e-3
        assert cfg.scheduler_step_size == 20 and cfg.scheduler_gamma == 0.5
    with pytest.raises(ValueError):
        get_preset_config("v9")
