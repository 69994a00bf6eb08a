"""LesionTable: group codes and the reference instance-dict contract
(tone_bias_dataset.py:364-393)."""

import numpy as np

from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata

EXPECTED_INSTANCE_KEYS = {
    "file_path", "image_name", "patient_id", "diagnosis",
    "benign_malignant", "age", "sex", "location", "skin_type",
    "skin_tone", "control",
}


def test_instance_keys(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    inst = table.instance(0)
    assert set(inst.keys()) == EXPECTED_INSTANCE_KEYS
    assert inst["file_path"].endswith(".jpg")
    assert inst["benign_malignant"] in ("benign", "malignant")


def test_labels_and_codes(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    assert table.labels.dtype == np.int32
    assert set(np.unique(table.labels)) <= {0, 1}
    # label 1 == malignant (the positive class)
    for i in range(len(table)):
        expect = 1 if df.iloc[i]["benign_malignant"] == "malignant" else 0
        assert table.labels[i] == expect
    tone = table.group_codes["skin_tone"]
    for i in range(len(table)):
        expect = 1 if df.iloc[i]["skin_tone"] == "dark" else 0
        assert tone[i] == expect
    assert (table.row_ids == np.arange(len(table))).all()


def test_file_paths(synth_root):
    import os

    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    for p in table.file_paths():
        assert os.path.exists(p), p
