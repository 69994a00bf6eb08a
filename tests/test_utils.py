"""utils: JSON-lines coercion, Timer, metrics logger, rng discipline,
distributed no-op."""

import json
import os

import numpy as np
import pytest

import jax.numpy as jnp

from skin_image_analysis_tpu.utils import jsonl
from skin_image_analysis_tpu.utils.metrics_log import MetricsLogger, binary_metrics
from skin_image_analysis_tpu.utils.profiling import Timer
from skin_image_analysis_tpu.utils.rng import KeyChain


def test_jsonl_coerces_numpy_and_jax(tmp_path):
    path = str(tmp_path / "r.json")
    jsonl.append_record(
        path,
        {
            "a": np.float32(0.5),
            "b": np.int64(3),
            "c": jnp.asarray(1.5),
            "d": np.asarray([1, 2]),
            "nested": {"e": np.float64(2.0)},
        },
    )
    [rec] = list(jsonl.read_records(path))
    assert rec == {"a": 0.5, "b": 3, "c": 1.5, "d": [1, 2], "nested": {"e": 2.0}}
    # valid plain JSON
    with open(path) as f:
        json.loads(f.readline())


def test_experiment_files_sorted(tmp_path):
    for name in ("2026-01-02_00-00-00.json", "2026-01-01_00-00-00.json"):
        open(tmp_path / name, "w").close()
    files = jsonl.read_experiment_files(str(tmp_path))
    assert [os.path.basename(f) for f in files] == [
        "2026-01-01_00-00-00.json", "2026-01-02_00-00-00.json",
    ]


def test_timer():
    import time

    with Timer("x") as t:
        time.sleep(0.01)
    assert t.elapsed >= 0.01


def test_metrics_logger(tmp_path):
    with MetricsLogger(str(tmp_path), use_wandb=False) as logger:
        logger.log({"loss": 0.5})
        logger.log({"acc": 0.9}, step=10)
    records = list(jsonl.read_records(str(tmp_path / "metrics.jsonl")))
    assert records[0]["loss"] == 0.5 and records[0]["step"] == 0
    assert records[1]["step"] == 10


def test_binary_metrics():
    preds = np.array([1, 1, 0, 0, 1])
    labels = np.array([1, 0, 0, 1, 1])
    m = binary_metrics(preds, labels)
    assert m["accuracy"] == pytest.approx(3 / 5)
    assert m["precision"] == pytest.approx(2 / 3)
    assert m["recall"] == pytest.approx(2 / 3)


def test_keychain_named_folds_stable():
    import jax

    def data(k):
        return np.asarray(jax.random.key_data(k))

    a = KeyChain(seed=0)
    b = KeyChain(seed=0)
    assert (data(a.next("dropout")) == data(b.next("dropout"))).all()
    assert not (data(a.next("dropout")) == data(a.next("augment"))).all()


def test_distributed_noop_single_host():
    from skin_image_analysis_tpu.parallel.distributed import maybe_initialize

    assert maybe_initialize() is False


def test_distributed_partial_triple_is_a_clean_error(monkeypatch):
    """SIA_COORDINATOR without the rest of the triple must name the
    missing variables, not die with a raw KeyError deep in os.environ."""
    import pytest

    from skin_image_analysis_tpu.parallel.distributed import maybe_initialize

    monkeypatch.setenv("SIA_COORDINATOR", "127.0.0.1:9999")
    monkeypatch.delenv("SIA_NUM_PROCESSES", raising=False)
    monkeypatch.delenv("SIA_PROCESS_ID", raising=False)
    with pytest.raises(ValueError, match="SIA_NUM_PROCESSES, SIA_PROCESS_ID"):
        maybe_initialize()

    monkeypatch.setenv("SIA_NUM_PROCESSES", "2")
    with pytest.raises(ValueError, match="SIA_PROCESS_ID"):
        maybe_initialize()
