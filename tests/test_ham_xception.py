"""HAM-10000 ingest + Xception model (jgi_ham_2018_* notebook parity)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.data.ham import (
    DX_CLASSES,
    attach_ita_tone,
    read_ham_metadata,
)


@pytest.fixture()
def ham_csv(tmp_path):
    import csv

    rows = [
        {"lesion_id": f"HAM_{i:07d}", "image_id": f"ISIC_{i:07d}",
         "dx": DX_CLASSES[i % 7], "dx_type": "histo", "age": 50,
         "sex": "male" if i % 2 else "female", "localization": "back"}
        for i in range(21)
    ]
    path = str(tmp_path / "HAM10000_metadata.csv")
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return path


def test_read_ham_metadata_binary(ham_csv):
    df = read_ham_metadata(ham_csv)
    assert len(df) == 21
    assert set(df["benign_malignant"]) == {"benign", "malignant"}
    # mel, bcc, akiec → malignant = 3 of 7 classes → 9 of 21 rows
    assert (df["benign_malignant"] == "malignant").sum() == 9
    assert "isic_id" in df.columns


def test_read_ham_metadata_multiclass(ham_csv):
    from skin_image_analysis_tpu.data.dataset import LesionTable

    df = read_ham_metadata(ham_csv, binary=False)
    table = LesionTable(
        df, "/nonexistent", class_names=DX_CLASSES, label_column="dx"
    )
    assert set(np.unique(table.labels)) == set(range(7))


def test_read_ham_rejects_wrong_csv(tmp_path):
    path = str(tmp_path / "other.csv")
    with open(path, "w") as f:
        f.write("a,b\n1,2\n")
    with pytest.raises(ValueError, match="HAM-10000"):
        read_ham_metadata(path)


def test_attach_ita_tone(ham_csv):
    df = read_ham_metadata(ham_csv)
    modal = {f"ISIC_{i:07d}": (50.0 if i % 2 else 5.0) for i in range(20)}
    out = attach_ita_tone(df, modal)
    assert out.iloc[1]["skin_tone"] == "light"
    assert out.iloc[0]["skin_tone"] == "dark"
    import pandas as pd

    assert pd.isna(out.iloc[20]["skin_tone"])  # missing estimate


def test_xception_small_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="xception_small", image_size=64,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0,
                               rtol=1e-5)
    assert "batch_stats" in variables


def test_xception_7_class():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    cfg = ModelConfig(name="xception_small", image_size=32, num_classes=7,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (1, 7)
