"""ToneClassifier equivalents: class weights, split persistence, classical
modal-ITA classifier, ResNet forward/train, tone trainer smoke."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.toneclassifier import (
    ModalItaClassifier,
    balanced_class_weights,
    split_metadata_csv,
)


def test_balanced_class_weights_reference_values():
    """Reproduce the reference's hard-coded weights [2.96221865,
    0.60153444] from the 622 dark / 3063 light ToneClassifier counts
    (CNNTrial.py:95-96, colourmapclassifier cell 25)."""
    labels = np.array([0] * 622 + [1] * 3063)
    w = balanced_class_weights(labels)
    np.testing.assert_allclose(w, [2.96221865, 0.60153444], rtol=1e-6)


def test_balanced_class_weights_empty_class():
    with pytest.raises(ValueError):
        balanced_class_weights(np.zeros(10, np.int64))


def test_split_metadata_csv(synth_root, tmp_path):
    train_p, test_p = split_metadata_csv(
        os.path.join(synth_root, "metadata.csv"), out_dir=str(tmp_path),
        frac=0.7, seed=0,
    )
    import pandas as pd

    train = pd.read_csv(train_p)
    test = pd.read_csv(test_p)
    assert len(train) + len(test) == 48
    assert len(train) == int(0.7 * 48) or len(train) == round(0.7 * 48)
    assert set(train["isic_id"]).isdisjoint(set(test["isic_id"]))


def test_modal_ita_classifier_threshold():
    rng = np.random.default_rng(0)
    light = rng.normal(50, 4, 100)   # tone 0
    dark = rng.normal(5, 6, 100)     # tone 1
    x = np.concatenate([light, dark])
    y = np.concatenate([np.zeros(100, int), np.ones(100, int)])
    clf = ModalItaClassifier("threshold").fit(x, y)
    assert clf.score(x, y) > 0.95
    # NaN → predicted dark (majority policy)
    assert clf.predict(np.array([np.nan]))[0] == 1


def test_modal_ita_classifier_logistic():
    rng = np.random.default_rng(1)
    x = np.concatenate([rng.normal(48, 5, 80), rng.normal(8, 5, 80)])
    y = np.concatenate([np.zeros(80, int), np.ones(80, int)])
    clf = ModalItaClassifier("logistic").fit(x, y)
    assert clf.score(x, y) > 0.9


def test_modal_ita_classifier_svm():
    """LinearSVC-equivalent (hinge + L2) — the classifier family the
    notebook sweeps (colourmapclassifier.ipynb cells 19-24). On the
    notebook's imbalance profile (83.1% dark) the SVM must beat the
    majority-rate baseline 0.831, like LinearSVC does there."""
    rng = np.random.default_rng(2)
    # ~83/17 imbalance mirroring 3063/3685 (the 0.831 majority rate)
    dark = rng.normal(8, 6, 415)     # tone 1
    light = rng.normal(46, 6, 85)    # tone 0
    x = np.concatenate([light, dark])
    y = np.concatenate([np.zeros(85, int), np.ones(415, int)])
    clf = ModalItaClassifier("svm").fit(x, y)
    majority = y.mean()  # 0.83
    assert clf.score(x, y) > max(0.9, majority)
    # decision direction: very low ITA → dark, very high → light
    assert clf.predict(np.array([-20.0]))[0] == 1
    assert clf.predict(np.array([70.0]))[0] == 0
    assert clf.predict(np.array([np.nan]))[0] == 1


def test_resnet_forward_and_bn_state():
    from skin_image_analysis_tpu.models.resnet import resnet18

    model = resnet18(compute_dtype="float32")
    x = jnp.zeros((2, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    assert "batch_stats" in variables
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 2)
    np.testing.assert_allclose(np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5)


def test_resnet_train_step_updates_batch_stats():
    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.train import create_train_state, make_train_step

    cfg = ModelConfig(name="resnet18", image_size=32, compute_dtype="float32")
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="adamw", learning_rate=1e-3),
        jax.random.key(0), batch_size=4,
    )
    assert state.batch_stats is not None
    before = jax.tree.map(lambda x: np.asarray(x).copy(), state.batch_stats)
    step = make_train_step()
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(rng.random((4, 32, 32, 3)), jnp.float32),
        "label": jnp.asarray(rng.integers(0, 2, 4), jnp.int32),
        "row_id": jnp.arange(4, dtype=jnp.int32),
        "valid": jnp.ones(4, bool),
    }
    state, metrics = step(state, batch)
    after = state.batch_stats
    changed = any(
        not np.allclose(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(before), jax.tree.leaves(after))
    )
    assert changed
    assert np.isfinite(float(metrics["loss"]))


def test_tone_trainer_smoke(synth_root, tmp_path):
    import pandas as pd

    from skin_image_analysis_tpu.toneclassifier.trainer import (
        ToneTrainConfig,
        train_tone_classifier,
    )

    df = pd.read_csv(os.path.join(synth_root, "metadata.csv"))
    df = df[df["fitzpatrick_skin_type"].notna()]
    train_df, test_df = df[:30], df[30:]
    cfg = ToneTrainConfig(
        model_name="skin_cancer_list", image_size=32, canonical_size=40,
        batch_size=8, epochs=1, compute_dtype="float32",
        out_dir=str(tmp_path / "tone"), oversample=True,
    )
    out = train_tone_classifier(train_df, test_df, synth_root, cfg,
                                verbose=False)
    assert len(out["history"]) == 1
    m = out["test_metrics"]
    assert {"accuracy", "precision", "recall", "f1"} <= set(m)
    # binary runs also report per-epoch AUC (the BASELINE metric)
    assert 0.0 <= m["auc"] <= 1.0
    assert os.path.exists(os.path.join(cfg.out_dir, "metrics.jsonl"))

    # the trained model persists in the flagship artifact format: the
    # out_dir serves directly through InferenceSession / export, with
    # the tone label space read from train_config.json
    assert os.path.exists(out["model_path"])
    from skin_image_analysis_tpu.serve.server import InferenceSession

    sess = InferenceSession.from_experiment(cfg.out_dir, max_batch=4)
    assert sess.class_names == ["light", "dark"]
    got = sess.predict(np.zeros((2, 32, 32, 3), np.uint8))
    assert got["pred"].shape == (2,)
    assert got["log_probs"].shape == (2, 2)
