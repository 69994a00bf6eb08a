"""JSON-lines experiment records.

The compatibility surface of the reference's experiment store is one JSON
object per epoch appended to ``results/<exp>/<timestamp>.json``
(tone_bias_train.py:410-424); this module writes/reads that format with
numpy/JAX scalars coerced to plain Python numbers.
"""

from __future__ import annotations

import json
import os
from typing import Any, Iterator

import numpy as np


def _coerce(obj: Any) -> Any:
    if isinstance(obj, dict):
        return {k: _coerce(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_coerce(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if isinstance(obj, np.ndarray):
        return _coerce(obj.tolist())
    if hasattr(obj, "item") and not isinstance(obj, (str, bytes)):
        try:
            return obj.item()
        except Exception:
            return obj
    return obj


def append_record(path: str, record: dict) -> None:
    """Append one JSON line (creating the file if needed)."""
    with open(path, "a") as f:
        f.write(json.dumps(_coerce(record)))
        f.write("\n")


def read_records(path: str) -> Iterator[dict]:
    """Yield one dict per parseable JSON line. Unparseable lines are
    skipped: a run killed mid-append leaves a truncated final line, and
    every consumer of these records (resume, --keep-best seeding,
    analysis stitching) must keep working on exactly such a file."""
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            try:
                yield json.loads(line)
            except ValueError:
                continue


def read_experiment_files(folder: str) -> list[str]:
    """All ``*.json`` record files in an experiment folder, sorted by
    timestamp filename so resumed runs concatenate chronologically
    (reference: tone_bias_analysis.py:326-330)."""
    names = sorted(n for n in os.listdir(folder) if n.endswith(".json"))
    return [os.path.join(folder, n) for n in names]
