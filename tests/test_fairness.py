"""Fairness metrics vs hand-computed confusion math and the reference
formulas (tone_bias_test.py:292-445)."""

import pytest

from skin_image_analysis_tpu.metrics import (
    analyse_predictions,
    confusion_matrix,
    di_from_counts,
    disparate_impact_analysis,
)
from tests.fixtures import random_instances

DI_KEYS = [
    "accuracy", "precision", "recall", "f1",
    "selection_rate_min", "selection_rate_maj", "di",
    "min_prevalence", "maj_prevalence",
    "min_selected", "min_count", "maj_selected", "maj_count",
    "min_precision", "min_recall", "min_f1",
    "maj_precision", "maj_recall", "maj_f1",
    "tp_min", "tn_min", "fp_min", "fn_min",
    "tp_maj", "tn_maj", "fp_maj", "fn_maj",
]


def _inst(pred, label, **kw):
    return {"prediction": pred, "benign_malignant": label, **kw}


def test_confusion_matrix_partition():
    instances = {
        0: _inst("malignant", "malignant"),
        1: _inst("benign", "benign"),
        2: _inst("malignant", "benign"),
        3: _inst("benign", "malignant"),
        4: _inst("malignant", "malignant"),
    }
    tp, tn, fp, fn = confusion_matrix(instances)
    assert (len(tp), len(tn), len(fp), len(fn)) == (2, 1, 1, 1)


def test_di_hand_computed():
    # min group: tp=2 tn=3 fp=1 fn=1 (count 7, selected 3)
    # maj group: tp=4 tn=4 fp=2 fn=0 (count 10, selected 6)
    r = di_from_counts(2, 3, 1, 1, 4, 4, 2, 0)
    assert r["min_count"] == 7 and r["maj_count"] == 10
    assert r["selection_rate_min"] == 3 / 7
    assert r["selection_rate_maj"] == 6 / 10
    assert r["di"] == pytest.approx((3 / 7) / (6 / 10))
    assert r["accuracy"] == pytest.approx((2 + 3 + 4 + 4) / 17)
    assert r["min_precision"] == pytest.approx(2 / 3)
    assert r["min_recall"] == pytest.approx(2 / 3)
    assert r["maj_recall"] == pytest.approx(1.0)
    assert r["min_prevalence"] == pytest.approx(3 / 7)
    assert list(r.keys()) == DI_KEYS


def test_di_zero_guards():
    # No true positives at all → precision/recall/f1 all 0.0, no crash.
    r = di_from_counts(0, 5, 0, 2, 0, 5, 0, 1)
    assert r["precision"] == 0.0 and r["recall"] == 0.0 and r["f1"] == 0.0
    assert r["di"] == 0.0  # selection_rate_maj == 0 → di = 0.0


def test_disparate_impact_matches_counts(rng):
    instances = random_instances(rng, 300)
    dark = {i: v for i, v in instances.items() if v["skin_tone"] == "dark"}
    light = {i: v for i, v in instances.items() if v["skin_tone"] == "light"}
    r = disparate_impact_analysis(dark, light)
    tp, tn, fp, fn = confusion_matrix(dark)
    r2 = di_from_counts(
        len(tp), len(tn), len(fp), len(fn),
        *[len(d) for d in confusion_matrix(light)],
    )
    assert r == r2


def test_analyse_predictions_schema(rng):
    instances = random_instances(rng, 200)
    rec = analyse_predictions(instances)
    assert set(rec.keys()) == {
        "correct", "total", "accuracy", "dark", "light", "male", "female",
        "tone_di_results", "gender_di_results", "control_di_results",
    }
    assert rec["total"] == 200
    assert rec["dark"] + rec["light"] == 200
    for key in ("tone_di_results", "gender_di_results", "control_di_results"):
        assert list(rec[key].keys()) == DI_KEYS
    # placebo control DI should be near 1 for a tone/sex-independent model
    assert 0.5 < rec["control_di_results"]["di"] < 2.0


def test_confusion_matrix_unknown_prediction_raises():
    with pytest.raises(ValueError):
        confusion_matrix({0: _inst("other", "benign")})


def test_empty_group_does_not_crash():
    """A cohort lacking one group entirely (possible on small splits) must
    yield a well-formed record with zero rates, not a ZeroDivisionError."""
    r = di_from_counts(0, 0, 0, 0, 4, 4, 1, 1)
    assert r["min_count"] == 0
    assert r["selection_rate_min"] == 0.0
    assert r["min_prevalence"] == 0.0
    assert r["di"] == 0.0
    assert r["maj_count"] == 10

    instances = {
        i: {"prediction": "benign", "benign_malignant": "benign",
            "skin_tone": "light", "sex": "male", "control": "poor"}
        for i in range(5)
    }
    rec = analyse_predictions(instances)
    assert rec["dark"] == 0 and rec["light"] == 5
    assert rec["tone_di_results"]["di"] == 0.0
