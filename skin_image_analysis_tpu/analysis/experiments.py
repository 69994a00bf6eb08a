"""Experiment-results aggregation.

Parity with the reference analysis layer (src/tone_bias_analysis.py):

- :func:`read_experiment` reads every ``*.json`` record file in one
  experiment folder **sorted by timestamp filename** so resumed runs
  concatenate chronologically (:326-330), flattens each JSON line
  (:353-375) and renumbers a monotonically increasing ``global_epoch``
  across files (:379-396);
- :func:`read_experiments` aggregates runs sharing a folder prefix
  (``balanced``/``imbalanced``), averaging every numeric measure per epoch
  across runs and attaching 90% confidence intervals (:400-510);
- :func:`compute_ci` uses the t-distribution for n <= 30 else normal
  (:12-39).
"""

from __future__ import annotations

import glob
import math
import os
from collections import defaultdict
from typing import Any, Sequence

from skin_image_analysis_tpu.utils import jsonl

# two-sided critical values at the given confidence level
_Z = {0.90: 1.6448536269514722, 0.95: 1.959963984540054, 0.99: 2.5758293035489004}


def _t_critical(df: int, level: float) -> float:
    """Two-sided t critical value; scipy when present, else a table."""
    try:
        from scipy import stats

        return float(stats.t.ppf((1 + level) / 2, df))
    except ImportError:  # pragma: no cover
        table90 = {1: 6.314, 2: 2.920, 3: 2.353, 4: 2.132, 5: 2.015,
                   10: 1.812, 20: 1.725, 30: 1.697}
        keys = sorted(table90)
        for k in keys:
            if df <= k:
                return table90[k]
        return _Z[0.90]


def compute_ci(data: Sequence[float], level: float = 0.90) -> tuple[float, float]:
    """(mean - moe, mean + moe) confidence interval
    (reference: tone_bias_analysis.py:12-39)."""
    n = len(data)
    mean = sum(data) / n
    if n < 2:
        return (mean, mean)
    var = sum((x - mean) ** 2 for x in data) / (n - 1)
    sem = math.sqrt(var / n)
    crit = _t_critical(n - 1, level) if n <= 30 else _Z.get(level, 1.645)
    return (mean - crit * sem, mean + crit * sem)


def transpose_dict(records: Sequence[dict]) -> dict[str, list]:
    """List-of-dicts → dict-of-lists (reference: tone_bias_analysis.py:281)."""
    out: dict[str, list] = defaultdict(list)
    for rec in records:
        for k, v in rec.items():
            out[k].append(v)
    return dict(out)


def flatten_record(record: dict) -> dict[str, Any]:
    """One epoch JSON line → flat measure dict with the reference's derived
    keys (tone_bias_analysis.py:353-375)."""
    tone = record.get("tone_di_results", {})
    gender = record.get("gender_di_results", {})
    control = record.get("control_di_results", {})
    flat = {
        k: v
        for k, v in record.items()
        if not isinstance(v, dict)
    }
    flat.update(
        {
            "tone_di_selection_rate_min": tone.get("selection_rate_min"),
            "tone_di_selection_rate_maj": tone.get("selection_rate_maj"),
            "tone_di": tone.get("di"),
            "f1": tone.get("f1"),
            "gender_di": gender.get("di"),
            "control_di": control.get("di"),
        }
    )
    return flat


def read_experiment(exp_path: str) -> list[dict]:
    """All epoch records of one experiment, flattened, with global_epoch."""
    records: list[dict] = []
    for path in jsonl.read_experiment_files(exp_path):
        name = os.path.basename(path)
        if not name[0].isdigit():
            continue  # skip train_config.json etc.
        for rec in jsonl.read_records(path):
            records.append(flatten_record(rec))
    for global_epoch, rec in enumerate(records):
        rec["global_epoch"] = global_epoch
    return records


def read_experiments(
    folder: str, prefix: str, level: float = 0.90
) -> dict[str, Any]:
    """Aggregate all experiments under ``folder`` whose name starts with
    ``prefix``: per-epoch mean of every numeric measure across runs, plus
    per-epoch CI bands (reference: tone_bias_analysis.py:400-510)."""
    exp_paths = sorted(
        p
        for p in glob.glob(os.path.join(folder, f"{prefix}*"))
        if os.path.isdir(p)
    )
    runs = [read_experiment(p) for p in exp_paths]
    runs = [r for r in runs if r]
    if not runs:
        return {"experiments": exp_paths, "epochs": [], "mean": {}, "ci": {}}

    n_epochs = max(len(r) for r in runs)
    values: dict[str, list[list[float]]] = defaultdict(
        lambda: [[] for _ in range(n_epochs)]
    )
    for run in runs:
        for epoch, rec in enumerate(run):
            for k, v in rec.items():
                if isinstance(v, (int, float)) and v is not None:
                    if isinstance(v, float) and math.isnan(v):
                        continue
                    values[k][epoch].append(float(v))

    mean = {
        k: [sum(vs) / len(vs) if vs else float("nan") for vs in per_epoch]
        for k, per_epoch in values.items()
    }
    ci = {
        k: [compute_ci(vs, level) if vs else (float("nan"), float("nan"))
            for vs in per_epoch]
        for k, per_epoch in values.items()
    }
    return {
        "experiments": exp_paths,
        "epochs": list(range(n_epochs)),
        "mean": mean,
        "ci": ci,
        "n_runs": len(runs),
    }
