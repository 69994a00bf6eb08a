"""Analysis layer: flattening, global-epoch renumbering, CI math, plots
(reference: tone_bias_analysis.py)."""

import json
import math
import os

import pytest

from skin_image_analysis_tpu.analysis import (
    compute_ci,
    flatten_record,
    read_experiment,
    read_experiments,
    transpose_dict,
)
from skin_image_analysis_tpu.analysis.plots import plot_accuracy_figure, plot_di_figure
from skin_image_analysis_tpu.metrics.fairness import di_from_counts


def _record(epoch, di=1.0, loss=0.5):
    tone = di_from_counts(2, 3, 1, 1, 4, 4, 2, 0)
    tone["di"] = di
    return {
        "correct": 10, "total": 20, "accuracy": 0.5,
        "dark": 10, "light": 10, "male": 10, "female": 10,
        "tone_di_results": tone,
        "gender_di_results": di_from_counts(1, 1, 1, 1, 1, 1, 1, 1),
        "control_di_results": di_from_counts(1, 1, 1, 1, 1, 1, 1, 1),
        "avg_batch_loss": loss, "train_accuracy": 0.6, "epoch": epoch,
    }


def _write_experiment(folder, n_files=2, epochs_per_file=3):
    os.makedirs(folder, exist_ok=True)
    for i in range(n_files):
        path = os.path.join(folder, f"2026-01-0{i + 1}_00-00-00.json")
        with open(path, "w") as f:
            for e in range(epochs_per_file):
                f.write(json.dumps(_record(e, di=0.9 + 0.01 * i)) + "\n")


def test_flatten_record():
    flat = flatten_record(_record(3))
    assert flat["tone_di"] == 1.0
    assert flat["tone_di_selection_rate_min"] == pytest.approx(3 / 7)
    assert flat["gender_di"] == pytest.approx(1.0)
    assert flat["control_di"] == pytest.approx(1.0)
    assert flat["f1"] == di_from_counts(2, 3, 1, 1, 4, 4, 2, 0)["f1"]
    assert flat["epoch"] == 3
    assert "tone_di_results" not in flat


def test_read_experiment_global_epoch(tmp_path):
    """Resumed runs (multiple timestamped files) concatenate into one
    monotonically increasing global_epoch (tone_bias_analysis.py:379-396)."""
    folder = str(tmp_path / "balanced_x")
    _write_experiment(folder, n_files=2, epochs_per_file=3)
    records = read_experiment(folder)
    assert len(records) == 6
    assert [r["global_epoch"] for r in records] == list(range(6))
    # files sorted by timestamp: first file's records come first
    assert records[0]["tone_di"] == pytest.approx(0.90)
    assert records[5]["tone_di"] == pytest.approx(0.91)


def test_read_experiments_averaging(tmp_path):
    root = str(tmp_path)
    _write_experiment(os.path.join(root, "balanced_a"), 1, 4)
    _write_experiment(os.path.join(root, "balanced_b"), 1, 4)
    _write_experiment(os.path.join(root, "imbalanced_c"), 1, 4)
    agg = read_experiments(root, "balanced")
    assert agg["n_runs"] == 2
    assert len(agg["epochs"]) == 4
    assert agg["mean"]["tone_di"][0] == pytest.approx((0.90 + 0.90) / 2)
    lo, hi = agg["ci"]["tone_di"][0]
    assert lo <= agg["mean"]["tone_di"][0] <= hi


def test_compute_ci():
    lo, hi = compute_ci([1.0, 2.0, 3.0, 4.0, 5.0], 0.90)
    mean = 3.0
    assert lo < mean < hi
    # t-dist(4 df, 90%) = 2.132; sem = sqrt(2.5/5)
    moe = 2.132 * math.sqrt(2.5 / 5)
    assert lo == pytest.approx(mean - moe, abs=1e-3)
    # singleton: degenerate interval
    assert compute_ci([2.0]) == (2.0, 2.0)


def test_transpose_dict():
    out = transpose_dict([{"a": 1, "b": 2}, {"a": 3, "b": 4}])
    assert out == {"a": [1, 3], "b": [2, 4]}


def test_plots_write_files(tmp_path):
    root = str(tmp_path)
    _write_experiment(os.path.join(root, "balanced_a"), 1, 4)
    agg = read_experiments(root, "balanced")
    p1 = plot_di_figure(agg, "balanced", save_dir=root)
    p2 = plot_accuracy_figure(agg, "balanced", save_dir=root)
    assert os.path.exists(p1) and p1.endswith("figure_balanced.png")
    assert os.path.exists(p2)
