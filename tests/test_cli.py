"""CLI surface tests: shared arg parsing, usage paths, predict CLI e2e."""

import os
import sys

import pytest

sys.path.insert(0, "/root/repo")

from cli._common import parse  # noqa: E402


def test_parse_positional_and_flags():
    pos, opts = parse(
        ["tone", "20", "balance", "--batch-size", "8", "--lr=0.001"],
        {"batch-size": 16, "lr": 1e-5},
        bool_flags={"augment"},
    )
    assert pos == ["tone", "20", "balance"]
    assert opts["batch-size"] == 8
    assert opts["lr"] == 0.001
    assert opts["augment"] is False


def test_parse_bool_flags():
    pos, opts = parse(["x", "--augment"], {}, bool_flags={"augment"})
    assert pos == ["x"] and opts["augment"] is True


def test_parse_unknown_flag_exits():
    with pytest.raises(SystemExit, match="unknown flag"):
        parse(["--bogus"], {})


def test_parse_missing_value_exits():
    with pytest.raises(SystemExit, match="requires a value"):
        parse(["--lr"], {"lr": 1e-5})


def test_train_cli_usage():
    from cli import tone_bias_train

    assert tone_bias_train.main([]) == 1


def test_test_cli_usage():
    from cli import tone_bias_test

    assert tone_bias_test.main([]) == 1


def test_analysis_cli_no_experiments(tmp_path):
    from cli import tone_bias_analysis

    rc = tone_bias_analysis.main(
        ["balanced", "0", "--experiments-dir", str(tmp_path)]
    )
    assert rc == 1


def test_predict_cli_e2e(synth_root, tmp_path, capsys):

    from cli import tone_bias_predict
    from tests.test_e2e_train import _tiny_cfg
    from skin_image_analysis_tpu.train.loop import run_training

    folder = run_training(_tiny_cfg(synth_root, tmp_path), verbose=False)
    out_csv = str(tmp_path / "preds.csv")
    rc = tone_bias_predict.main([synth_root, folder, out_csv])
    assert rc == 0

    import pandas as pd

    df = pd.read_csv(out_csv)
    assert set(df.columns) == {
        "isic_id", "prediction", "p_malignant", "benign_malignant",
        "skin_tone", "sex",
    }
    assert len(df) > 0
    assert df["p_malignant"].between(0, 1).all()
    assert set(df["prediction"]) <= {"benign", "malignant"}


def test_predict_cli_images_mode(synth_root, tmp_path):
    """--images scores every image file in the root with no metadata —
    the bulk-scoring mode for unlabeled cohorts."""
    import glob

    import pandas as pd

    from cli import tone_bias_predict
    from skin_image_analysis_tpu.train.loop import run_training
    from tests.test_e2e_train import _tiny_cfg

    folder = run_training(_tiny_cfg(synth_root, tmp_path), verbose=False)
    out_csv = str(tmp_path / "img_preds.csv")
    rc = tone_bias_predict.main([synth_root, folder, out_csv, "--images"])
    assert rc == 0
    df = pd.read_csv(out_csv)
    assert set(df.columns) == {"isic_id", "prediction", "p_malignant"}
    assert len(df) == len(glob.glob(synth_root + "/*.jpg"))
    assert df["p_malignant"].between(0, 1).all()

    import pytest as _pytest

    with _pytest.raises(SystemExit, match="no image files"):
        tone_bias_predict.main(
            [str(tmp_path), folder, out_csv, "--images"])


def test_predict_cli_images_case_and_dedup(synth_root, tmp_path):
    """--images matches extensions case-insensitively (.JPG camera
    exports on case-sensitive filesystems) and dedupes stems present
    under two extensions into ONE row."""
    import glob
    import shutil

    import pandas as pd

    from cli import tone_bias_predict
    from skin_image_analysis_tpu.train.loop import run_training
    from tests.test_e2e_train import _tiny_cfg

    folder = run_training(_tiny_cfg(synth_root, tmp_path), verbose=False)
    jpgs = sorted(glob.glob(synth_root + "/*.jpg"))[:2]
    root = tmp_path / "camera"
    root.mkdir()
    shutil.copy(jpgs[0], root / "shot_a.JPG")  # uppercase extension
    shutil.copy(jpgs[1], root / "shot_b.jpg")
    shutil.copy(jpgs[1], root / "shot_b.png")  # duplicate stem
    out_csv = str(tmp_path / "camera.csv")
    rc = tone_bias_predict.main([str(root), folder, out_csv, "--images"])
    assert rc == 0
    df = pd.read_csv(out_csv)
    assert sorted(df["isic_id"]) == ["shot_a", "shot_b"]
    assert df["p_malignant"].between(0, 1).all()


def test_predict_cli_honors_input_convention(synth_root, tmp_path):
    """An experiment folder whose train_config.json carries an input
    convention (ImageNet normalization or a generic affine) must be
    scored through it — the regression here is auditing/predicting an
    imported or transfer checkpoint on plain [0,1] floats."""
    import json

    import numpy as np
    import pandas as pd

    from cli import tone_bias_predict
    from skin_image_analysis_tpu.train.loop import run_training
    from tests.test_e2e_train import _tiny_cfg

    folder = run_training(_tiny_cfg(synth_root, tmp_path), verbose=False)
    base_csv = str(tmp_path / "base.csv")
    assert tone_bias_predict.main([synth_root, folder, base_csv]) == 0

    # rewrite the config with a strong affine: predictions must move
    cfg_path = f"{folder}/train_config.json"
    with open(cfg_path) as f:
        cfg = json.load(f)
    cfg.setdefault("data", {})["input_affine"] = [[4.0] * 3, [-2.0] * 3]
    with open(cfg_path, "w") as f:
        json.dump(cfg, f)
    affine_csv = str(tmp_path / "affine.csv")
    assert tone_bias_predict.main([synth_root, folder, affine_csv]) == 0

    base = pd.read_csv(base_csv)["p_malignant"].to_numpy()
    moved = pd.read_csv(affine_csv)["p_malignant"].to_numpy()
    assert not np.allclose(base, moved)


def test_train_cli_optimizer_flag():
    """--optimizer threads through _optim_config to OptimConfig (added
    for the 1024²-canonical single-chip config, docs/PERF.md §Full
    resolution); empty default leaves the OptimConfig default."""
    from skin_image_analysis_tpu.cli.tone_bias_train import _optim_config

    cfg = _optim_config(1e-3, "", {
        "optimizer": "sgd", "lr-schedule": "", "lr-step-size": 0,
        "lr-gamma": 0.1, "lr-decay-steps": 0, "lr-warmup-steps": 0,
        "moment-dtype": "", "nu-dtype": "",
    })
    assert cfg.optimizer == "sgd" and cfg.learning_rate == 1e-3

    default = _optim_config(1e-3, "", {
        "optimizer": "", "lr-schedule": "", "lr-step-size": 0,
        "lr-gamma": 0.1, "lr-decay-steps": 0, "lr-warmup-steps": 0,
        "moment-dtype": "", "nu-dtype": "",
    })
    assert default.optimizer == type(default)().optimizer
