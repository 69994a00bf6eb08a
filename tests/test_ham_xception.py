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


def test_keras_xception_weight_conversion_numerical_parity(tmp_path):
    """Full-oracle transfer fidelity for the HAM config's backbone: a
    LIVE keras.applications.Xception (random weights + randomized BN
    stats — no downloads) writes its weights in the legacy .h5 layout
    every downloadable xception_weights_*.h5 uses; the h5py-only
    converter maps them into the Flax model, whose forward must match
    the Keras forward numerically. Covers every layer-name mapping,
    depthwise transpose, residual-conv ordering, VALID/SAME padding and
    the BN epsilon. (jgi_ham_2018_tf.ipynb cell 70.)"""
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.xception import (
        Xception,
        load_keras_xception_weights,
    )

    rng = np.random.default_rng(0)
    kmodel = keras.applications.Xception(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    # randomize BN stats/scales so any gamma/beta/mean/var mix-up or
    # epsilon mismatch changes the output
    for layer in kmodel.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            c = layer.get_weights()[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.05, c).astype(np.float32),
                rng.uniform(0.5, 1.5, c).astype(np.float32),
            ])

    def weight_names(layer):
        if isinstance(layer, keras.layers.SeparableConv2D):
            return ["depthwise_kernel", "pointwise_kernel"]
        if isinstance(layer, keras.layers.BatchNormalization):
            return ["gamma", "beta", "moving_mean", "moving_variance"]
        if isinstance(layer, keras.layers.Conv2D):
            return ["kernel", "bias"][: 1 + int(layer.use_bias)]
        if isinstance(layer, keras.layers.Dense):
            return ["kernel", "bias"]
        raise TypeError(layer)

    path = str(tmp_path / "xception_legacy.h5")
    with h5py.File(path, "w") as f:
        layer_names = []
        for layer in kmodel.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            layer_names.append(layer.name)
            g = f.create_group(layer.name)
            names = weight_names(layer)
            assert len(names) == len(ws), layer.name
            g.attrs["weight_names"] = [
                f"{layer.name}/{n}:0".encode() for n in names
            ]
            for n, w in zip(names, ws):
                g.create_dataset(f"{layer.name}/{n}:0", data=w)
        f.attrs["layer_names"] = [n.encode() for n in layer_names]

    model = Xception(num_classes=2, middle_blocks=8,
                     compute_dtype="float32")
    x_np = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    variables = model.init(
        jax.random.key(0), jnp.asarray(x_np), train=False
    )
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_xception_weights(path, variables)

    # head: GAP -> Dense on the converted features, same W on both sides
    w_head = rng.normal(0, 0.05, (2048, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_np), train=False)
    )

    feats = np.asarray(kmodel(x_np, training=False))  # [2, 3, 3, 2048]
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)
