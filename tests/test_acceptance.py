"""Accuracy acceptance gate: the training recipe must LEARN.

The schema/resume/layout tests can all pass while the training math is
silently broken; this gate runs the real recipe (run_training: balance,
split, augment-free default transforms, per-epoch fairness eval) on the
synthetic cohort — whose brightness encodes the label — and asserts:

- final-epoch AUC clears a threshold (the model learned);
- the random `control` placebo attribute's disparate impact sits inside
  a band around 1.0 — the reference's own null-hypothesis check
  (tone_bias_dataset.py:218, tone_bias_analysis.py:590-597; the
  production band is [0.8, 1.2] on 3.7k images, widened here for the
  small-cohort sampling noise).

A regression in the loss, the optimizer wiring, the preprocess path, or
the fairness join fails this test.
"""

import json
import os

import pytest

from skin_image_analysis_tpu.config import (
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from skin_image_analysis_tpu.train.loop import run_training
from tests.fixtures import make_synthetic_dataset


@pytest.fixture(scope="module")
def cohort(tmp_path_factory):
    root = tmp_path_factory.mktemp("accept_tone")
    make_synthetic_dataset(str(root), n=240, seed=5, image_size=56)
    return str(root)


def _final_record(folder):
    json_files = sorted(
        n for n in os.listdir(folder)
        if n.endswith(".json") and n[0].isdigit()
    )
    records = []
    with open(os.path.join(folder, json_files[-1])) as f:
        records += [json.loads(line) for line in f if line.strip()]
    return records[-1]


def test_recipe_learns_and_control_stays_unbiased(cohort, tmp_path):
    cfg = TrainConfig(
        epochs=12,
        results_dir=str(tmp_path / "results"),
        log_every_batches=0,
        seed=0,
        data=DataConfig(
            root_dir=cohort, image_size=48, canonical_size=56,
            batch_size=16, balance=True, decode_workers=2,
            prefetch_depth=1, seed=0,
        ),
        model=ModelConfig(
            conv_features=(8, 16, 32), linear_features=(32,),
            dropout=(0.3,), image_size=48, compute_dtype="float32",
        ),
        optim=OptimConfig(learning_rate=3e-3),
    )
    folder = run_training(cfg, verbose=False)
    rec = _final_record(folder)

    # the model learned the (brightness -> diagnosis) signal
    assert rec["auc"] > 0.85, f"final AUC {rec['auc']} below gate"
    assert rec["accuracy"] > 0.75, rec["accuracy"]

    # placebo check: the random `control` attribute must not show bias
    # (production band 0.8-1.2; widened for the ~70-image test split)
    di = rec["control_di_results"]["di"]
    assert 0.55 < di < 1.8, f"control DI {di} outside the placebo band"

    # and the audit must have seen every test instance exactly once
    assert rec["total"] == rec["dark"] + rec["light"]
    assert rec["correct"] <= rec["total"]
