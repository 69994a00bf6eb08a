"""Elastic crash recovery: fault injection + automated folder-resume
(run_training_elastic — SURVEY §5's failure-detection/elastic row; the
reference's recovery is manual resume-by-rerun, tone_bias_train.py
:240-249)."""

import dataclasses
import os

import pytest

from skin_image_analysis_tpu.train.loop import (
    completed_epochs,
    run_training_elastic,
)
from tests.test_e2e_train import _tiny_cfg


def test_elastic_resumes_after_injected_fault(
    synth_root, tmp_path, monkeypatch
):
    """A run that crashes after its first epoch must be found, resumed
    for the remaining epochs, and finish with the full epoch count."""
    fault = tmp_path / "fault"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=3), checkpoint_every=1
    )
    folder = run_training_elastic(cfg, retries=2, verbose=False)
    assert not fault.exists()  # the injected fault actually fired
    assert completed_epochs(folder) == 3
    names = os.listdir(folder)
    assert "session_model.msgpack" in names
    assert "session_train.csv" in names


def test_elastic_counts_epochs_without_fairness_records(
    synth_root, tmp_path, monkeypatch
):
    """The epoch counter must come from the progress markers, not the
    fairness records — with eval_every=2 only half the epochs have
    records, and counting those would over-train after a resume."""
    fault = tmp_path / "fault_ee"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=4),
        checkpoint_every=1, eval_every=2,
    )
    folder = run_training_elastic(cfg, retries=2, verbose=False)
    assert completed_epochs(folder) == 4
    with open(os.path.join(folder, "epochs_completed.log")) as f:
        values = [int(ln) for ln in f if ln.strip()]
    assert values[-1] == 4
    assert values == sorted(values)  # totals, monotone across resumes


def test_elastic_gives_up_when_retries_exhausted(
    synth_root, tmp_path, monkeypatch
):
    fault = tmp_path / "fault2"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=2), checkpoint_every=1
    )
    with pytest.raises(RuntimeError, match="injected fault"):
        run_training_elastic(cfg, retries=0, verbose=False)


def test_elastic_without_snapshots_retrains_in_full(
    synth_root, tmp_path, monkeypatch
):
    """checkpoint_every=0: a crashed run's epochs were never persisted,
    so they must not count as complete — the retry re-trains in full."""
    fault = tmp_path / "fault_ns"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    cfg = _tiny_cfg(synth_root, tmp_path, epochs=2)  # no checkpoints
    folder = run_training_elastic(cfg, retries=1, verbose=False)
    assert completed_epochs(folder) == 2
    with open(os.path.join(folder, "epochs_completed.log")) as f:
        values = [int(ln) for ln in f if ln.strip()]
    # only the final save marks progress: the crashed attempt left none
    assert values == [2]


def test_elastic_abandons_broken_experiment_dir(synth_root, tmp_path):
    """A target folder without split CSVs can never resume; the
    supervisor must fall back to a fresh run instead of burning every
    retry on it."""
    broken = tmp_path / "results" / "imbalanced_broken"
    broken.mkdir(parents=True)
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=1),
        experiment_dir=str(broken),
    )
    folder = run_training_elastic(cfg, retries=1, verbose=False)
    assert folder != str(broken)
    assert completed_epochs(folder) == 1


def test_elastic_resume_counts_existing_epochs(synth_root, tmp_path):
    """Supervising an already-complete folder is a no-op (remaining
    epochs <= 0)."""
    cfg = _tiny_cfg(synth_root, tmp_path, epochs=2)
    folder = run_training_elastic(cfg, retries=0, verbose=False)
    assert completed_epochs(folder) == 2
    resumed = run_training_elastic(
        dataclasses.replace(cfg, experiment_dir=folder), retries=0,
        verbose=False,
    )
    assert resumed == folder
    assert completed_epochs(folder) == 2  # nothing retrained
