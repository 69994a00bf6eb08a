"""Generic classifier trainer: multiclass metrics + 7-class HAM e2e."""

import os

import numpy as np
import pytest

from skin_image_analysis_tpu.train.classify import (
    ClassifyConfig,
    multiclass_metrics,
    train_classifier,
)


def test_multiclass_metrics_hand():
    preds = np.array([0, 1, 2, 2, 1, 0])
    labels = np.array([0, 1, 2, 1, 1, 2])
    m = multiclass_metrics(preds, labels, 3)
    assert m["accuracy"] == pytest.approx(4 / 6)
    # class0: p=1/2 r=1; class1: p=2/2 r=2/3; class2: p=1/2 r=1/2
    assert m["precision"] == pytest.approx((0.5 + 1.0 + 0.5) / 3)
    assert m["recall"] == pytest.approx((1.0 + 2 / 3 + 0.5) / 3)


def test_multiclass_binary_equivalence():
    preds = np.array([1, 1, 0, 0, 1])
    labels = np.array([1, 0, 0, 1, 1])
    from skin_image_analysis_tpu.utils.metrics_log import binary_metrics

    assert multiclass_metrics(preds, labels, 2) == binary_metrics(preds, labels)


@pytest.fixture(scope="module")
def ham_style_root(tmp_path_factory):
    """Synthetic HAM-style folder: images + 7-class dx metadata."""
    import csv

    from PIL import Image

    from skin_image_analysis_tpu.data.ham import DX_CLASSES

    root = tmp_path_factory.mktemp("ham")
    rng = np.random.default_rng(0)
    rows = []
    for i in range(42):
        image_id = f"ISIC_{i:07d}"
        dx = DX_CLASSES[i % 7]
        rows.append({"lesion_id": f"HAM_{i}", "image_id": image_id,
                     "dx": dx, "dx_type": "histo", "age": 50,
                     "sex": "male", "localization": "back"})
        shade = 30 + 30 * (i % 7)
        img = (rng.integers(0, 40, (32, 32, 3)) + shade).astype(np.uint8)
        Image.fromarray(img).save(str(root / f"{image_id}.jpg"))
    with open(root / "HAM10000_metadata.csv", "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)
    return str(root)


def test_train_classifier_7_class(ham_style_root, tmp_path):
    from skin_image_analysis_tpu.data.dataset import LesionTable
    from skin_image_analysis_tpu.data.ham import DX_CLASSES, read_ham_metadata

    df = read_ham_metadata(
        os.path.join(ham_style_root, "HAM10000_metadata.csv")
    )
    train_df, test_df = df[:28], df[28:]
    tables = [
        LesionTable(d, ham_style_root, class_names=DX_CLASSES,
                    label_column="dx")
        for d in (train_df, test_df)
    ]
    cfg = ClassifyConfig(
        model_name="skin_cancer_list", num_classes=7, image_size=24,
        canonical_size=32, batch_size=7, epochs=2, learning_rate=1e-3,
        compute_dtype="float32", out_dir=str(tmp_path / "ham"),
        oversample=True,
    )
    out = train_classifier(*tables, cfg, verbose=False)
    assert len(out["history"]) == 2
    m = out["test_metrics"]
    assert {"accuracy", "precision", "recall", "f1"} <= set(m)
    assert 0.0 <= m["accuracy"] <= 1.0


def test_ham_cli_e2e(ham_style_root, tmp_path):
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import ham_train

    rc = ham_train.main(
        [ham_style_root, os.path.join(ham_style_root, "HAM10000_metadata.csv"),
         "1", "--classes", "dx", "--model", "skin_cancer_list",
         "--image-size", "24", "--canonical-size", "32", "--batch-size", "7",
         "--out", str(tmp_path / "hamrun")]
    )
    assert rc == 0


def test_train_classifier_multi_step_parity(ham_style_root, tmp_path):
    """steps_per_dispatch>1 (scanned multi-step + scanned eval over the
    device arenas) must reproduce the per-batch path exactly: same RNG
    stream, same batch order, inert padded tail steps (4 batches with
    k=3 → one full super-step + one with 2 inert lanes)."""
    import jax

    from skin_image_analysis_tpu.data.dataset import LesionTable
    from skin_image_analysis_tpu.data.ham import DX_CLASSES, read_ham_metadata

    df = read_ham_metadata(
        os.path.join(ham_style_root, "HAM10000_metadata.csv")
    )
    tables = [
        LesionTable(d, ham_style_root, class_names=DX_CLASSES,
                    label_column="dx")
        for d in (df[:28], df[28:])
    ]
    base = dict(
        model_name="skin_cancer_list", num_classes=7, image_size=24,
        canonical_size=32, batch_size=7, epochs=2, learning_rate=1e-3,
        compute_dtype="float32",
    )
    out1 = train_classifier(
        *tables, ClassifyConfig(out_dir=str(tmp_path / "a"), **base),
        verbose=False,
    )
    outk = train_classifier(
        *tables,
        ClassifyConfig(out_dir=str(tmp_path / "b"), steps_per_dispatch=3,
                       **base),
        verbose=False,
    )
    # parity is to float tolerance, not bit-exact: the scanned program
    # fuses differently from the separate per-batch programs (measured
    # ~1e-7/step of f32 reassociation noise, same as the flagship
    # multi-step equivalence tests)
    for a, b in zip(
        jax.tree.leaves(out1["state"].params),
        jax.tree.leaves(outk["state"].params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-5
        )
    m1, mk = out1["test_metrics"], outk["test_metrics"]
    assert m1["accuracy"] == pytest.approx(mk["accuracy"], abs=1e-9)
    assert m1["train_loss_mean"] == pytest.approx(
        mk["train_loss_mean"], abs=1e-4
    )


def test_train_classifier_multi_step_empty_train_split(ham_style_root,
                                                       tmp_path):
    """A train split smaller than one batch (drop_remainder) yields ZERO
    super-batches; the multi-step path must degrade like the per-batch
    path (train_loss_mean 0.0), not crash on an empty concatenate."""
    from skin_image_analysis_tpu.data.dataset import LesionTable
    from skin_image_analysis_tpu.data.ham import DX_CLASSES, read_ham_metadata

    df = read_ham_metadata(
        os.path.join(ham_style_root, "HAM10000_metadata.csv")
    )
    tables = [
        LesionTable(d, ham_style_root, class_names=DX_CLASSES,
                    label_column="dx")
        for d in (df[:5], df[5:12])  # 5 train rows < batch_size 7
    ]
    out = train_classifier(
        *tables,
        ClassifyConfig(
            model_name="skin_cancer_list", num_classes=7, image_size=24,
            canonical_size=32, batch_size=7, epochs=1,
            compute_dtype="float32", steps_per_dispatch=2,
            use_class_weights=False,  # 5 rows cannot cover 7 classes
            out_dir=str(tmp_path / "empty"),
        ),
        verbose=False,
    )
    assert out["test_metrics"]["train_loss_mean"] == 0.0


def test_classify_keep_best_and_early_stop(ham_style_root, tmp_path):
    """Transfer-trainer mirror of the flagship --keep-best/--early-stop:
    a diverging lr stops early and session_model_best.msgpack holds the
    best-accuracy epoch's weights."""
    import json

    from skin_image_analysis_tpu.data.dataset import LesionTable
    from skin_image_analysis_tpu.data.ham import read_ham_metadata

    df = read_ham_metadata(
        os.path.join(ham_style_root, "HAM10000_metadata.csv")
    )
    train_df, test_df = df[:28], df[28:]
    tables = [LesionTable(d, ham_style_root) for d in (train_df, test_df)]
    out_dir = str(tmp_path / "bestrun")
    cfg = ClassifyConfig(
        model_name="skin_cancer_list", num_classes=2, image_size=24,
        canonical_size=32, batch_size=7, epochs=8, learning_rate=8.0,
        compute_dtype="float32", out_dir=out_dir,
        checkpoint_best=True, best_metric="accuracy",
        early_stop_patience=2,
    )
    out = train_classifier(*tables, cfg, verbose=False)
    assert len(out["history"]) < 8  # early stop fired
    best_path = os.path.join(out_dir, "session_model_best.msgpack")
    assert os.path.exists(best_path)
    # metrics.jsonl's epoch records stop at the same point
    recs = [json.loads(line)
            for line in open(os.path.join(out_dir, "metrics.jsonl"))
            if "accuracy" in line]
    assert len(recs) == len(out["history"])
    # unknown metric refused loudly
    bad = ClassifyConfig(
        model_name="skin_cancer_list", num_classes=2, image_size=24,
        canonical_size=32, batch_size=7, epochs=1,
        compute_dtype="float32", out_dir=str(tmp_path / "badrun"),
        checkpoint_best=True, best_metric="nope",
    )
    with pytest.raises(ValueError, match="nope"):
        train_classifier(*tables, bad, verbose=False)
