"""Data-ingest semantics vs the reference contracts
(tone_bias_dataset.py:114-254, tone_bias_train.py:264-278)."""


from skin_image_analysis_tpu.data import (
    balance_dataset,
    read_isic_metadata,
    sample_dataframe,
    shuffle_split,
)
from skin_image_analysis_tpu.data.ingest import convert_type2tone


def test_convert_type2tone():
    assert convert_type2tone("I") == "light"
    assert convert_type2tone("II") == "light"
    for t in ("III", "IV", "V", "VI"):
        assert convert_type2tone(t) == "dark"


def test_read_isic_metadata_filters(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    assert df["fitzpatrick_skin_type"].notna().all()
    assert set(df["benign_malignant"]) <= {"benign", "malignant"}
    assert set(df["skin_tone"]) <= {"light", "dark"}
    assert set(df["control"]) <= {"poor", "rich"}
    # 48 rows, every 12th has null skin type and every 12th-1 is
    # indeterminate → 8 dropped
    assert len(df) == 40


def test_read_isic_metadata_seeded(synth_root):
    a = read_isic_metadata(synth_root, seed=3)
    b = read_isic_metadata(synth_root, seed=3)
    c = read_isic_metadata(synth_root, seed=4)
    assert (a["control"] == b["control"]).all()
    assert (a["control"] != c["control"]).any()


def test_balance_dataset(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    out = balance_dataset(df, seed=0, verbose=False)
    counts = out["skin_tone"].value_counts()
    assert counts["light"] == counts["dark"]
    # diagnosis balanced first, then tone-undersampled → roughly balanced
    bm = out["benign_malignant"].value_counts()
    assert abs(bm.get("benign", 0) - bm.get("malignant", 0)) <= len(out) // 2


def test_balance_order_diagnosis_then_tone(synth_root):
    """Diagnosis is exactly balanced before tone undersampling, so the tone
    counts are equal afterwards but diagnosis may drift (the reference's
    deliberate ordering, tone_bias_dataset.py:236-248)."""
    df = read_isic_metadata(synth_root, seed=0)
    out = balance_dataset(df, seed=0, verbose=False)
    assert (out["skin_tone"] == "light").sum() == (out["skin_tone"] == "dark").sum()


def test_shuffle_split(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    train, test = shuffle_split(df, ratio=0.7, seed=0)
    assert len(train) == int(0.7 * len(df))
    assert len(train) + len(test) == len(df)
    assert set(train["isic_id"]).isdisjoint(set(test["isic_id"]))
    train2, test2 = shuffle_split(df, ratio=0.7, seed=0)
    assert list(train["isic_id"]) == list(train2["isic_id"])


def test_sample_dataframe(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    out = sample_dataframe(df, "benign_malignant", 10, seed=0)
    bm = out["benign_malignant"].value_counts()
    assert bm["benign"] == 10 and bm["malignant"] == 10
