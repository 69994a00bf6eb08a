"""Stdlib metadata Table parity (tone_bias_metadata.py capabilities)."""

import os

import pytest

from skin_image_analysis_tpu.data.metadata import (
    Table,
    read_metadata_csv,
    report_skin_types,
    report_tone_diagnosis_grid,
)


def test_read_metadata_csv(synth_root):
    table = read_metadata_csv(os.path.join(synth_root, "metadata.csv"))
    assert len(table) == 48
    assert "isic_id" in table.columns


def test_key_uniqueness():
    rows = [{"isic_id": "a", "x": "1"}, {"isic_id": "a", "x": "2"}]
    with pytest.raises(ValueError, match="duplicate key"):
        Table(rows)


def test_partition(synth_root):
    table = read_metadata_csv(os.path.join(synth_root, "metadata.csv"))
    parts = table.partition("benign_malignant")
    assert sum(len(t) for t in parts.values()) == len(table)


def test_reports(synth_root):
    table = read_metadata_csv(os.path.join(synth_root, "metadata.csv"))
    types = report_skin_types(table)
    assert sum(types.values()) == len(table)
    grid = report_tone_diagnosis_grid(table)
    assert sum(grid.values()) == len(table)
