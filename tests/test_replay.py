"""Replaying sweep artifacts (hpo/replay.py): the reference's hand-rolled
non-JSON optuna_*.json format, our JSON artifacts, and the train CLI's
--from-hpo flow."""

import json
import os

import pytest

from skin_image_analysis_tpu.hpo.replay import (
    parse_reference_artifact,
    reference_params_to_ours,
    replay_artifact,
)
from skin_image_analysis_tpu.hpo.space import create_best_model_config


def _write_reference_artifact(path, params):
    """Byte-for-byte the reference's writer (tone_bias_optuna.py:327-341):
    single-quoted keys, bare str() values, trailing comma, writelines
    without newlines."""
    lines = ["{"]
    for key, value in params.items():
        lines.append("    '{}': {},".format(key, value))
    lines.append("}")
    with open(path, "w") as f:
        f.writelines(lines)


_REFERENCE_WINNER = {
    # the TRIALS=100 winning params in the REFERENCE's naming
    # (tone_bias_optuna.py:96-110), plus the run constants it appends
    "n_conv_layers": 3,
    "n_units_l0": 192,
    "n_units_conv_l0": 172,
    "n_units_conv_l1": 22,
    "n_units_conv_l2": 86,
    "n_linear_layers": 3,
    "n_units_linear_l0": 227,
    "n_units_linear_l1": 80,
    "n_units_linear_l2": 86,
    "dropout_l0": 0.4750108276372097,
    "dropout_l1": 0.33605861431570366,
    "dropout_l2": 0.26780264501531464,
    "optimizer": "Adam",
    "lr": 0.03627331743927454,
    "TRIALS": 100,
    "EPOCHS": 10,
    "DEVICE": "mps",
    "BATCHSIZE": 32,
    "SAMPLE_SIZE": 300,
}


def test_parse_reference_format(tmp_path):
    path = str(tmp_path / "optuna_100_10_mps_32_300.json")
    _write_reference_artifact(path, _REFERENCE_WINNER)
    # the file is NOT valid JSON (that's the point)
    with open(path) as f:
        with pytest.raises(json.JSONDecodeError):
            json.loads(f.read())
    params = parse_reference_artifact(path)
    assert params["n_units_l0"] == 192
    assert params["dropout_l1"] == pytest.approx(0.33605861431570366)
    assert params["optimizer"] == "Adam"  # bare word, unquoted by writer
    assert params["DEVICE"] == "mps"
    assert params["lr"] == pytest.approx(0.03627331743927454)


def test_reference_winner_replays_to_known_best(tmp_path):
    path = str(tmp_path / "optuna_100_10_mps_32_300.json")
    _write_reference_artifact(path, _REFERENCE_WINNER)
    model_cfg, optim_cfg = replay_artifact(path)
    want_model, want_optim = create_best_model_config()
    assert model_cfg == want_model
    assert optim_cfg.optimizer == want_optim.optimizer == "adam"
    assert optim_cfg.learning_rate == pytest.approx(
        want_optim.learning_rate
    )


def test_rename_is_idempotent():
    ours = reference_params_to_ours(_REFERENCE_WINNER)
    assert reference_params_to_ours(ours) == ours
    assert ours["first_conv_out"] == 192
    assert ours["conv_out_1"] == 22
    assert ours["linear_out_2"] == 86
    assert "TRIALS" not in ours


def test_our_json_artifact_replays(tmp_path):
    path = str(tmp_path / "optuna_16_10_tpu_32_300.json")
    best = {
        "first_conv_out": 8, "n_conv_layers": 1, "conv_out_0": 6,
        "n_linear_layers": 2, "linear_out_0": 12, "linear_out_1": 6,
        "dropout_0": 0.25, "dropout_1": 0.3,
        "optimizer": "sgd", "lr": 0.01,
    }
    with open(path, "w") as f:
        json.dump({"best_value": 0.9, "best_params": best}, f)
    model_cfg, optim_cfg = replay_artifact(path, image_size=32)
    assert model_cfg.conv_features == (8, 6)
    assert model_cfg.linear_features == (12, 6)
    assert model_cfg.image_size == 32
    assert optim_cfg.optimizer == "sgd"
    assert optim_cfg.learning_rate == pytest.approx(0.01)


def test_parse_garbage_raises(tmp_path):
    path = tmp_path / "junk.json"
    path.write_text("no braces no pairs")
    with pytest.raises(ValueError, match="artifact format"):
        parse_reference_artifact(str(path))


def test_train_cli_from_hpo(tmp_path, synth_root):
    """`tone_bias_train.py <root> 1 balance --from-hpo <reference
    artifact>` trains the artifact's architecture end to end."""
    artifact = str(tmp_path / "optuna_5_2_mps_32_300.json")
    _write_reference_artifact(
        artifact,
        {
            "n_conv_layers": 1, "n_units_l0": 8, "n_units_conv_l0": 6,
            "n_linear_layers": 2, "n_units_linear_l0": 12,
            "n_units_linear_l1": 6, "dropout_l0": 0.3, "dropout_l1": 0.25,
            "optimizer": "SGD", "lr": 0.01, "DEVICE": "mps",
        },
    )
    # replay exactly as the CLI's --from-hpo branch does, then run
    # through run_training directly to control results_dir (the CLI
    # hard-codes ./results)
    import dataclasses

    results = str(tmp_path / "results")

    from skin_image_analysis_tpu.config import (
        DataConfig, ModelConfig, OptimConfig, TrainConfig,
    )
    from skin_image_analysis_tpu.train.loop import run_training

    model_cfg, optim_cfg = replay_artifact(
        artifact, image_size=16, compute_dtype="float32"
    )
    assert model_cfg.conv_features == (8, 6)
    assert optim_cfg.optimizer == "sgd"
    cfg = TrainConfig(
        epochs=1,
        results_dir=results,
        seed=0,
        data=DataConfig(
            root_dir=synth_root, image_size=16, canonical_size=24,
            batch_size=8, balance=True, decode_workers=2, seed=0,
        ),
        model=model_cfg,
        optim=dataclasses.replace(optim_cfg),
    )
    folder = run_training(cfg, verbose=False)
    assert os.path.exists(os.path.join(folder, "session_model.msgpack"))
