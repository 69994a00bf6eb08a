"""VGG16/19 and MobileNetV2 transfer families.

Cell 70 of jgi_ham_2018_tf.ipynb lists
``keras.applications.mobilenet_v2.MobileNetV2`` and
``keras.applications.vgg19.VGG19`` as the transfer-backbone
alternatives to Xception; these tests pin our Flax builds against LIVE
Keras oracles (random weights — no downloads) through both weight
paths: the legacy ``.h5`` converters and the ``.keras`` artifact
importer."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _randomize_bn(keras, model, rng):
    for layer in model.layers:
        if isinstance(layer, keras.layers.BatchNormalization):
            c = layer.get_weights()[0].shape[0]
            layer.set_weights([
                rng.uniform(0.5, 1.5, c).astype(np.float32),
                rng.normal(0, 0.1, c).astype(np.float32),
                rng.normal(0, 0.05, c).astype(np.float32),
                rng.uniform(0.5, 1.5, c).astype(np.float32),
            ])


def _transfer_model(keras, base, num_classes=2):
    avg = keras.layers.GlobalAveragePooling2D()(base.output)
    out = keras.layers.Dense(num_classes, activation="softmax",
                             name="predictions")(avg)
    return keras.Model(base.input, out)


def test_vgg_registry_and_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model

    for name, n_params in (("vgg16", 13), ("vgg19", 16)):
        cfg = ModelConfig(name=name, image_size=32, num_classes=3,
                          compute_dtype="float32")
        model = build_model(cfg)
        x = jnp.zeros((2, 32, 32, 3), jnp.float32)
        variables = model.init(jax.random.key(0), x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape == (2, 3)
        np.testing.assert_allclose(
            np.exp(np.asarray(out)).sum(-1), 1.0, rtol=1e-5
        )
        convs = [k for k in variables["params"] if "_conv" in k]
        assert len(convs) == n_params
        assert "batch_stats" not in variables


def test_mobilenet_registry_and_forward():
    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.models.mobilenet import make_divisible

    cfg = ModelConfig(name="mobilenet_v2", image_size=64, num_classes=7,
                      compute_dtype="float32")
    model = build_model(cfg)
    x = jnp.zeros((2, 64, 64, 3), jnp.float32)
    variables = model.init(jax.random.key(0), x, train=False)
    out = model.apply(variables, x, train=False)
    assert out.shape == (2, 7)
    assert "batch_stats" in variables
    # 16 inverted-residual blocks + stem + tail
    assert "expanded_conv_depthwise" in variables["params"]
    assert "block_16_project" in variables["params"]
    assert variables["params"]["Conv_1"]["kernel"].shape[-1] == 1280
    # keras' channel rounding
    assert make_divisible(32 * 1.0) == 32
    assert make_divisible(24 * 0.75) == 24  # 18 -> 16 drops >10% -> 24
    assert make_divisible(96 * 1.4) == 136


def test_vgg19_keras_artifact_parity(tmp_path):
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.migrate import import_keras_experiment
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    base = keras.applications.VGG19(weights=None, include_top=False,
                                    input_shape=(64, 64, 3))
    kmodel = _transfer_model(keras, base, num_classes=3)
    path = str(tmp_path / "vgg.keras")
    kmodel.save(path)

    out = str(tmp_path / "imported")
    summary = import_keras_experiment(path, out)
    assert summary["backbone"] == "vgg19"
    assert summary["num_classes"] == 3
    assert summary["input_scale_folded"] == 255.0

    cfg, loaded = ckpt_lib.load_model(
        str(tmp_path / "imported" / ckpt_lib.MODEL_FILENAME)
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    assert batch_stats is None  # VGG is BN-free
    rng = np.random.default_rng(2)
    x_255 = rng.uniform(0, 255, (2, 64, 64, 3)).astype(np.float32)
    theirs = np.asarray(kmodel(x_255, training=False))
    ours_log = np.asarray(
        build_model(cfg).apply({"params": params},
                               jnp.asarray(x_255 / 255.0), train=False)
    )
    np.testing.assert_allclose(np.exp(ours_log), theirs,
                               rtol=1e-3, atol=1e-5)


def test_mobilenet_v2_keras_artifact_parity(tmp_path):
    keras = pytest.importorskip("keras")

    from skin_image_analysis_tpu.migrate import import_keras_experiment
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    rng = np.random.default_rng(3)
    base = keras.applications.MobileNetV2(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    kmodel = _transfer_model(keras, base, num_classes=2)
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "mbv2.keras")
    kmodel.save(path)

    out = str(tmp_path / "imported")
    summary = import_keras_experiment(path, out)
    assert summary["backbone"] == "mobilenet_v2"
    assert summary["input_scale_folded"] == 255.0

    cfg, variables = ckpt_lib.load_model(
        str(tmp_path / "imported" / ckpt_lib.MODEL_FILENAME)
    )
    assert "batch_stats" in variables
    x_255 = rng.uniform(0, 255, (2, 96, 96, 3)).astype(np.float32)
    theirs = np.asarray(kmodel(x_255, training=False))
    ours_log = np.asarray(
        build_model(cfg).apply(variables, jnp.asarray(x_255 / 255.0),
                               train=False)
    )
    np.testing.assert_allclose(np.exp(ours_log), theirs,
                               rtol=1e-3, atol=1e-5)


def _legacy_h5(keras, kmodel, path, h5py):
    """Write kmodel's weights in the legacy layer_names/weight_names
    layout the downloadable *_notop.h5 files use."""
    from skin_image_analysis_tpu.models.keras_io import WEIGHT_NAMES

    with h5py.File(path, "w") as f:
        layer_names = []
        for layer in kmodel.layers:
            ws = layer.get_weights()
            if not ws:
                continue
            layer_names.append(layer.name)
            g = f.create_group(layer.name)
            names = WEIGHT_NAMES[layer.__class__.__name__][: len(ws)]
            assert len(names) == len(ws), layer.name
            g.attrs["weight_names"] = [
                f"{layer.name}/{n}:0".encode() for n in names
            ]
            for n, w in zip(names, ws):
                g.create_dataset(f"{layer.name}/{n}:0", data=w)
        f.attrs["layer_names"] = [n.encode() for n in layer_names]


def test_vgg_legacy_h5_converter(tmp_path):
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.vgg import (
        VGG,
        _BLOCKS,
        load_keras_vgg_weights,
    )

    kmodel = keras.applications.VGG16(weights=None, include_top=False,
                                      input_shape=(64, 64, 3))
    path = str(tmp_path / "vgg16_notop.h5")
    _legacy_h5(keras, kmodel, path, h5py)

    rng = np.random.default_rng(4)
    model = VGG(num_classes=2, block_convs=_BLOCKS["vgg16"],
                compute_dtype="float32")
    x_np = rng.normal(0, 1, (2, 64, 64, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_vgg_weights(path, variables)

    w_head = rng.normal(0, 0.05, (512, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_np), train=False)
    )
    feats = np.asarray(kmodel(x_np, training=False))
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)


def test_mobilenet_legacy_h5_converter(tmp_path):
    keras = pytest.importorskip("keras")
    import h5py

    from skin_image_analysis_tpu.models.mobilenet import (
        MobileNetV2,
        load_keras_mobilenet_v2_weights,
    )

    rng = np.random.default_rng(5)
    kmodel = keras.applications.MobileNetV2(
        weights=None, include_top=False, input_shape=(96, 96, 3)
    )
    _randomize_bn(keras, kmodel, rng)
    path = str(tmp_path / "mbv2_notop.h5")
    _legacy_h5(keras, kmodel, path, h5py)

    model = MobileNetV2(num_classes=2, compute_dtype="float32")
    x_np = rng.normal(0, 1, (2, 96, 96, 3)).astype(np.float32)
    variables = model.init(jax.random.key(0), jnp.asarray(x_np),
                           train=False)
    variables = {k: dict(v) for k, v in variables.items()}
    converted = load_keras_mobilenet_v2_weights(path, variables)

    w_head = rng.normal(0, 0.05, (1280, 2)).astype(np.float32)
    b_head = rng.normal(0, 0.05, 2).astype(np.float32)
    converted["params"]["Dense_0"] = {
        "kernel": jnp.asarray(w_head), "bias": jnp.asarray(b_head),
    }
    ours = np.asarray(
        model.apply(converted, jnp.asarray(x_np), train=False)
    )
    feats = np.asarray(kmodel(x_np, training=False))
    logits = feats.mean(axis=(1, 2)) @ w_head + b_head
    theirs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    np.testing.assert_allclose(ours, theirs, rtol=1e-4, atol=5e-4)
