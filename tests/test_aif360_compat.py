"""aif360-compatible metrics vs hand-computed values and the main DI
layer (legacy parity: tone_bias_torch.py:1591-1621)."""

import pytest

from skin_image_analysis_tpu.metrics.aif360_compat import (
    average_odds_difference,
    classification_metric_report,
    disparate_impact,
    equal_opportunity_difference,
    statistical_parity_difference,
)
from skin_image_analysis_tpu.metrics.fairness import di_from_counts

COUNTS = (2, 3, 1, 1, 4, 4, 2, 0)  # min: tp tn fp fn | maj: tp tn fp fn


def test_statistical_parity_difference():
    # selection rates: min 3/7, maj 6/10
    assert statistical_parity_difference(*COUNTS) == pytest.approx(3 / 7 - 0.6)


def test_disparate_impact_matches_main_layer():
    di = di_from_counts(*COUNTS)["di"]
    assert disparate_impact(*COUNTS) == pytest.approx(di)


def test_equal_opportunity_difference():
    # TPR: min 2/3, maj 4/4
    assert equal_opportunity_difference(*COUNTS) == pytest.approx(2 / 3 - 1.0)


def test_average_odds_difference():
    # FPR: min 1/4, maj 2/6
    expect = 0.5 * ((1 / 4 - 2 / 6) + (2 / 3 - 1.0))
    assert average_odds_difference(*COUNTS) == pytest.approx(expect)


def test_report_from_di_dict():
    report = classification_metric_report(di_from_counts(*COUNTS))
    assert set(report) == {
        "statistical_parity_difference", "disparate_impact",
        "equal_opportunity_difference", "average_odds_difference",
    }
    assert report["disparate_impact"] == pytest.approx(
        di_from_counts(*COUNTS)["di"]
    )


def test_zero_guards():
    assert disparate_impact(0, 5, 0, 0, 0, 5, 0, 0) == 0.0
    assert statistical_parity_difference(0, 1, 0, 0, 0, 1, 0, 0) == 0.0
