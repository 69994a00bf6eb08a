"""AOT serving export (jax.export/StableHLO): round-trip + symbolic
batch + CLI. The TPU-native replacement for the reference's
pickle-the-module deployment (tone_bias_model.py:305-338)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train.state import create_train_state


@pytest.fixture(scope="module")
def exp_folder(tmp_path_factory):
    """A minimal experiment folder: just the saved model artifact."""
    folder = tmp_path_factory.mktemp("exp")
    cfg = ModelConfig(
        conv_features=(4, 8), linear_features=(8,), dropout=(0.0,),
        image_size=16, compute_dtype="float32",
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(0),
        batch_size=2,
    )
    ckpt_lib.save_model(
        str(folder / ckpt_lib.MODEL_FILENAME), cfg, state.params,
        state.batch_stats,
    )
    return str(folder)


def test_export_roundtrip_symbolic_batch(exp_folder, tmp_path):
    from skin_image_analysis_tpu.serve import (
        export_model,
        load_exported,
    )

    out = str(tmp_path / "model.stablehlo")
    manifest = export_model(exp_folder, out, canonical_size=20)
    assert os.path.exists(out) and os.path.exists(out + ".json")
    assert manifest["input"]["dtype"] == "uint8"
    assert manifest["input"]["shape"][0] == "symbolic"
    assert manifest["outputs"] == ["log_probs", "pred", "p_malignant"]
    with open(out + ".json") as f:
        assert json.load(f)["class_names"] == ["benign", "malignant"]

    exported = load_exported(out)
    rng = np.random.default_rng(0)
    # the SAME artifact serves two different batch sizes
    for b in (3, 7):
        pixels = rng.integers(0, 255, (b, 20, 20, 3), np.uint8)
        got = exported.call(jnp.asarray(pixels))
        assert got["log_probs"].shape == (b, 2)
        assert got["pred"].shape == (b,)
        # log-softmax head: probabilities sum to 1
        np.testing.assert_allclose(
            np.exp(np.asarray(got["log_probs"])).sum(-1),
            np.ones(b), atol=1e-5,
        )
        # matches the in-process model bit-for-bit (same program)
        from skin_image_analysis_tpu.serve import build_infer_fn

        model_cfg, loaded = ckpt_lib.load_model(
            os.path.join(exp_folder, ckpt_lib.MODEL_FILENAME)
        )
        params, batch_stats = ckpt_lib.split_variables(loaded)
        ref = build_infer_fn(model_cfg, params, batch_stats)(
            jnp.asarray(pixels)
        )
        np.testing.assert_allclose(
            np.asarray(got["log_probs"]), np.asarray(ref["log_probs"]),
            atol=1e-6,
        )
        np.testing.assert_array_equal(
            np.asarray(got["pred"]), np.asarray(ref["pred"])
        )


def test_export_cli(exp_folder, tmp_path, capsys):
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_export

    out = str(tmp_path / "cli_model.stablehlo")
    rc = tone_bias_export.main([exp_folder, out])
    assert rc == 0
    assert os.path.exists(out)
    assert "exported" in capsys.readouterr().out

    # bad args -> usage, not a traceback
    assert tone_bias_export.main([]) == 1


def test_export_reads_normalization_from_train_config(exp_folder, tmp_path):
    """Exports must reproduce the training run's eval preprocess: when
    the folder's train_config.json says normalize_imagenet=true, the
    exported program scores normalized inputs (review finding: a
    hardcoded False silently diverged from training-time eval)."""
    import shutil

    from skin_image_analysis_tpu.serve import export_model, load_exported

    folder = str(tmp_path / "exp_norm")
    shutil.copytree(exp_folder, folder)
    with open(os.path.join(folder, "train_config.json"), "w") as f:
        json.dump({"data": {"normalize_imagenet": True}}, f)
    out = str(tmp_path / "norm.stablehlo")
    manifest = export_model(folder, out)
    assert manifest["normalize_imagenet"] is True

    # and it matches an infer fn built WITH normalization
    from skin_image_analysis_tpu.serve import build_infer_fn

    model_cfg, loaded = ckpt_lib.load_model(
        os.path.join(folder, ckpt_lib.MODEL_FILENAME)
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    rng = np.random.default_rng(1)
    pixels = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    ref = build_infer_fn(model_cfg, params, batch_stats,
                         normalize_imagenet=True)(jnp.asarray(pixels))
    got = load_exported(out).call(jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(got["log_probs"]), np.asarray(ref["log_probs"]),
        atol=1e-6,
    )


def test_predict_exported_pads_fixed_batch_artifacts(exp_folder, tmp_path):
    """Fixed-batch artifacts (the symbolic-lowering fallback) must still
    serve smaller batches: predict_exported pads to the manifest batch
    and slices outputs back; larger batches error with guidance."""
    from jax import export as jexport

    from skin_image_analysis_tpu.serve import (
        build_infer_fn,
        predict_exported,
    )

    model_cfg, loaded = ckpt_lib.load_model(
        os.path.join(exp_folder, ckpt_lib.MODEL_FILENAME)
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    infer = build_infer_fn(model_cfg, params, batch_stats)
    exported = jexport.export(jax.jit(infer))(
        jax.ShapeDtypeStruct((4, 16, 16, 3), jnp.uint8)
    )
    out = str(tmp_path / "fixed.stablehlo")
    with open(out, "wb") as f:
        f.write(exported.serialize())
    with open(out + ".json", "w") as f:
        json.dump({"input": {"shape": [4, 16, 16, 3]}}, f)

    rng = np.random.default_rng(2)
    pixels = rng.integers(0, 255, (2, 16, 16, 3), np.uint8)
    got = predict_exported(out, pixels)
    assert got["pred"].shape == (2,)
    ref = infer(jnp.asarray(pixels))
    np.testing.assert_allclose(
        got["log_probs"], np.asarray(ref["log_probs"]), atol=1e-6
    )

    with pytest.raises(ValueError, match="fixed batch"):
        predict_exported(
            out, rng.integers(0, 255, (6, 16, 16, 3), np.uint8)
        )


def test_export_ita_input_model(tmp_path):
    """ITA-input (in_channels=2) models export as RGB-in programs: the
    [ITA/90, skin-mask] channel computation lowers INSIDE the artifact,
    so the serving site still posts plain pixels (ToneClassifier stage 3,
    readme.md's ITA-matrix CNN)."""
    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.data.ita import ita_input
    from skin_image_analysis_tpu.models.cnn import build_model
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn
    from skin_image_analysis_tpu.serve import export_model, load_exported
    from skin_image_analysis_tpu.train.state import create_train_state

    folder = str(tmp_path / "ita_exp")
    os.makedirs(folder)
    cfg = ModelConfig(
        conv_features=(4,), linear_features=(8,), dropout=(0.0,),
        image_size=16, compute_dtype="float32", in_channels=2,
    )
    state, _ = create_train_state(
        cfg, OptimConfig(learning_rate=1e-3), jax.random.key(3),
        batch_size=2,
    )
    ckpt_lib.save_model(
        os.path.join(folder, ckpt_lib.MODEL_FILENAME), cfg, state.params,
        state.batch_stats,
    )
    with open(os.path.join(folder, "train_config.json"), "w") as f:
        json.dump({"data": {"normalize_imagenet": False},
                   "class_names": ["light", "dark"]}, f)

    out = str(tmp_path / "ita.stablehlo")
    manifest = export_model(folder, out)
    # program input is RGB even though the model consumes 2 channels
    assert manifest["input"]["shape"][3] == 3
    assert manifest["class_names"] == ["light", "dark"]

    rng = np.random.default_rng(4)
    pixels = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    got = load_exported(out).call(jnp.asarray(pixels))

    # manual pipeline: eval preprocess (no ImageNet norm) -> ita_input
    # -> model forward
    pre = make_preprocess_fn(16, train=False, normalize_imagenet=False)
    x = ita_input(pre(jnp.asarray(pixels), None))
    model = build_model(cfg)
    variables = {"params": state.params}
    if state.batch_stats is not None:
        variables["batch_stats"] = state.batch_stats
    ref = model.apply(variables, x, train=False)
    np.testing.assert_allclose(
        np.asarray(got["log_probs"]), np.asarray(ref), atol=1e-6
    )


def test_export_quantized_int8(exp_folder, tmp_path):
    """quantize='int8' lowers the PTQ program (serve/quantize.py):
    symbolic batch still works, the artifact is substantially smaller
    than the float export (int8 weight constants), the manifest carries
    the fidelity report, and predictions agree with the in-process
    quantized forward."""
    from skin_image_analysis_tpu.serve import export_model, load_exported
    from skin_image_analysis_tpu.serve.quantize import (
        build_infer_fn_quantized,
        quantize_model,
    )

    rng = np.random.default_rng(2)
    calib = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)
    held = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)

    out_f32 = str(tmp_path / "model_f32.stablehlo")
    export_model(exp_folder, out_f32)
    out_q = str(tmp_path / "model_int8.stablehlo")
    manifest = export_model(
        exp_folder, out_q, quantize="int8", calib_pixels=calib,
        report_pixels=held,
    )
    q = manifest["quantization"]
    assert q["scheme"] == "int8"
    assert q["agreement_confident"] == 1.0
    # at toy scale the StableHLO program text dominates; the weight
    # constants still shrink 4x (the real flagship artifact: ~206 MB
    # f32 → ~52 MB, measured in docs/PERF.md)
    assert os.path.getsize(out_q) < 0.75 * os.path.getsize(out_f32)

    exported = load_exported(out_q)
    pixels = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    got = exported.call(jnp.asarray(pixels))
    model_cfg, loaded = ckpt_lib.load_model(
        os.path.join(exp_folder, ckpt_lib.MODEL_FILENAME)
    )
    params, _ = ckpt_lib.split_variables(loaded)
    qtree = quantize_model(model_cfg, params, calib)
    want = build_infer_fn_quantized(qtree)(jnp.asarray(pixels))
    np.testing.assert_allclose(
        np.asarray(got["log_probs"]), np.asarray(want["log_probs"]),
        atol=1e-5,
    )

    with pytest.raises(ValueError, match="calib_pixels"):
        export_model(exp_folder, str(tmp_path / "x.stablehlo"),
                     quantize="int8")


def test_export_quantized_int8_weights(exp_folder, tmp_path):
    """quantize='int8-weights' (weight-only, any family): no
    calibration needed, artifact shrinks like the full int8 one,
    compute matches the float program to weight-rounding precision."""
    from skin_image_analysis_tpu.serve import (
        export_model,
        load_exported,
        predict_exported,
    )

    rng = np.random.default_rng(5)
    held = rng.integers(0, 255, (8, 16, 16, 3), np.uint8)

    out_f32 = str(tmp_path / "m_f32.stablehlo")
    export_model(exp_folder, out_f32)
    out_w8 = str(tmp_path / "m_w8.stablehlo")
    manifest = export_model(exp_folder, out_w8, quantize="int8-weights",
                            report_pixels=held)
    q = manifest["quantization"]
    assert q["scheme"] == "int8-weights"
    assert q["agreement_confident"] == 1.0
    assert q["mean_abs_dlogp"] < 0.05
    assert os.path.getsize(out_w8) < 0.75 * os.path.getsize(out_f32)

    pixels = rng.integers(0, 255, (3, 16, 16, 3), np.uint8)
    got = predict_exported(out_w8, pixels)
    ref = predict_exported(out_f32, pixels)
    assert (got["pred"] == ref["pred"]).all()
    np.testing.assert_allclose(got["log_probs"], ref["log_probs"],
                               atol=0.05)

    with pytest.raises(ValueError, match="unknown quantize"):
        export_model(exp_folder, str(tmp_path / "y.stablehlo"),
                     quantize="int4")


def test_weights_only_any_family():
    """int8-weights works on a family full int8 refuses (SE/swish):
    efficientnet-style is too slow to compile on the one-core CPU here,
    so pin the mechanism on a BN model (resnet geometry) — the
    quantize_weights_only/dequantize_weights pair is family-agnostic
    (pure tree transform + model.apply)."""
    from skin_image_analysis_tpu.models.resnet import resnet18
    from skin_image_analysis_tpu.serve.quantize import (
        dequantize_weights,
        quantize_weights_only,
    )

    model = resnet18(num_classes=2, compute_dtype="float32")
    x = jnp.zeros((1, 32, 32, 3), jnp.float32)
    variables = model.init(jax.random.key(3), x, train=False)
    params, batch_stats = variables["params"], variables["batch_stats"]

    qparams = quantize_weights_only(params)
    # kernel leaves became int8 payloads; vector leaves stayed f32
    flat_kernels = []

    def walk(node):
        if isinstance(node, dict):
            if "_w8" in node:
                flat_kernels.append(node)
                assert node["_w8"].dtype == np.int8
                assert node["_scale"].dtype == np.float32
                return
            for v in node.values():
                walk(v)

    walk(qparams)
    assert len(flat_kernels) > 10

    deq = dequantize_weights(qparams)
    xr = jnp.asarray(
        np.random.default_rng(4).uniform(0, 1, (2, 32, 32, 3)),
        jnp.float32)
    want = model.apply({"params": params, "batch_stats": batch_stats},
                       xr, train=False)
    got = model.apply({"params": deq, "batch_stats": batch_stats},
                      xr, train=False)
    # weight rounding only: per-channel int8 keeps ~0.4% relative error
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=0.1, rtol=0.05)


def test_export_cli_best_flag(exp_folder, tmp_path):
    """--best without a --keep-best checkpoint is refused loudly; with
    one present it exports those weights."""
    import shutil
    import sys

    sys.path.insert(0, "/root/repo")
    from cli import tone_bias_export

    with pytest.raises(SystemExit, match="keep-best"):
        tone_bias_export.main(
            [exp_folder, str(tmp_path / "b.stablehlo"), "--best"])

    best_folder = str(tmp_path / "bexp")
    os.makedirs(best_folder)
    shutil.copy(os.path.join(exp_folder, ckpt_lib.MODEL_FILENAME),
                os.path.join(best_folder, ckpt_lib.MODEL_FILENAME))
    shutil.copy(os.path.join(exp_folder, ckpt_lib.MODEL_FILENAME),
                os.path.join(best_folder, ckpt_lib.BEST_MODEL_FILENAME))
    out = str(tmp_path / "best.stablehlo")
    assert tone_bias_export.main([best_folder, out, "--best"]) == 0
    assert os.path.exists(out)
