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


def test_elastic_finds_folder_when_name_overrides_balance(
    synth_root, tmp_path, monkeypatch
):
    """A nonexistent experiment_dir named 'imbalanced_*' overrides
    cfg.data.balance (resolve_experiment_folder name inference). The
    supervisor must glob the prefix run_training actually used —
    deriving it from cfg.data.balance would watch 'balanced_*' forever
    and restart from scratch on every retry."""
    fault = tmp_path / "fault_prefix"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=2, balance=True),
        checkpoint_every=1,
        experiment_dir=str(tmp_path / "results" / "imbalanced_target"),
    )
    folder = run_training_elastic(cfg, retries=1, verbose=False)
    assert not fault.exists()
    assert completed_epochs(folder) == 2
    assert os.path.basename(folder).startswith("imbalanced_")
    # the crashed run was RESUMED, not restarted: exactly one folder
    results = os.path.join(str(tmp_path), "results")
    made = [d for d in os.listdir(results) if d.startswith("imbalanced_")]
    assert len(made) == 1
    with open(os.path.join(folder, "epochs_completed.log")) as f:
        values = [int(ln) for ln in f if ln.strip()]
    assert values == [1, 2, 2]  # epoch-1 snapshot, resumed epoch 2, final


def test_elastic_resume_matches_plain_semantics(synth_root, tmp_path):
    """Pointing the supervisor at an existing folder trains cfg.epochs
    ADDITIONAL epochs — identical to plain run_training on the same
    folder (same CLI, same semantics with or without --auto-resume).
    The remaining-epochs subtraction only applies to crashes the
    supervisor itself saw."""
    cfg = _tiny_cfg(synth_root, tmp_path, epochs=2)
    folder = run_training_elastic(cfg, retries=0, verbose=False)
    assert completed_epochs(folder) == 2
    resumed = run_training_elastic(
        dataclasses.replace(cfg, experiment_dir=folder), retries=0,
        verbose=False,
    )
    assert resumed == folder
    assert completed_epochs(folder) == 4  # 2 more, like plain resume


def test_elastic_crash_on_resumed_folder_trains_only_remainder(
    synth_root, tmp_path, monkeypatch
):
    """A crash while resuming an existing folder re-trains only the
    unsnapshotted remainder of THIS invocation's additional epochs:
    start_done + cfg.epochs total, never more."""
    cfg = dataclasses.replace(
        _tiny_cfg(synth_root, tmp_path, epochs=1), checkpoint_every=1
    )
    folder = run_training_elastic(cfg, retries=0, verbose=False)
    assert completed_epochs(folder) == 1
    fault = tmp_path / "fault_resume"
    fault.write_text("")
    monkeypatch.setenv("SIA_FAULT_ONCE", str(fault))
    resumed = run_training_elastic(
        dataclasses.replace(
            cfg, epochs=2, experiment_dir=folder, checkpoint_every=1
        ),
        retries=2,
        verbose=False,
    )
    assert resumed == folder
    assert not fault.exists()
    assert completed_epochs(folder) == 3  # 1 (before) + 2 (this run)
