"""Post-training int8 quantization of the inference program.

A serving-side capability beyond the reference (whose deployment story
is unpickling the torch module, tone_bias_model.py:305-338): quantize a
trained ``skin_cancer_list``/``skin_cancer`` checkpoint to int8 weights
AND int8 activations, so every conv/dense contraction runs as
``s8 x s8 -> s32`` — on TPU the MXU executes int8 matmuls at ~2x the
bf16 rate, and the weight set shrinks 4x (the flagship's 51.4M params:
206 MB f32 → ~52 MB), which also quarters an exported artifact.

Scheme (standard symmetric PTQ):

- **Weights**: per-output-channel symmetric int8 —
  ``w_q[..., o] = round(w[..., o] / s_w[o])``, ``s_w[o] =
  max|w[..., o]| / 127``. Exact zero maps to zero; no zero-point, so
  SAME-padding zeros stay exact.
- **Activations**: per-tensor symmetric int8 with max calibration:
  ``s_x = max|x| / 127`` observed over a calibration batch at every
  quantization point (the preprocessed input and each post-ReLU
  activation). Post-ReLU tensors are non-negative, so symmetric int8
  spends one bit on a sign that never occurs — the standard cost of
  keeping the conv in the s8xs8 form XLA lowers natively.
- **Compute**: ``conv/dot(x_q, w_q, preferred_element_type=int32)`` →
  dequantize ``* (s_x * s_w[o])`` → ``+ bias`` (f32) → ReLU →
  requantize to the next layer's scale. The 2x2 max-pool runs directly
  on int8 (max commutes with the monotone quantizer), halving its HBM
  traffic too. The log-softmax head stays f32.

Fidelity is checked, not assumed: :func:`quantization_report` compares
quantized vs float predictions on held-out pixels (argmax agreement,
overall and on confident rows) — tests pin it, and the serve/export
CLIs print it next to the artifact.

Supported models: the ``skin_cancer_list`` family (plain conv stack +
MLP, no BatchNorm — transfer backbones keep the bf16 path). Cites:
tone_bias_model.py:56-152 for the architecture being quantized.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp


def _require_supported(model_cfg) -> None:
    if model_cfg.name not in ("skin_cancer_list", "skin_cancer"):
        raise ValueError(
            f"int8 quantization supports the skin_cancer CNN family; "
            f"got {model_cfg.name!r} (transfer backbones carry BatchNorm "
            "and keep the bf16 path)"
        )
    if getattr(model_cfg, "in_channels", 3) != 3:
        raise ValueError("int8 quantization expects RGB-input models")


def _conv_features(model_cfg) -> tuple[int, ...]:
    if model_cfg.name == "skin_cancer":
        return (32, 64, 128, 256)
    return tuple(model_cfg.conv_features)


def _linear_features(model_cfg) -> tuple[int, ...]:
    if model_cfg.name == "skin_cancer":
        return (512, 256)
    return tuple(model_cfg.linear_features)


def _layers(model_cfg, params) -> list[dict]:
    """Flatten the checkpoint into an ordered [conv..., dense..., head]
    list of {kind, kernel, bias} float arrays (the model's param tree:
    ConvBlock_i/Conv_0, MlpBlock_j/Dense_0, head Dense_0)."""
    layers: list[dict] = []
    for i in range(len(_conv_features(model_cfg))):
        p = params[f"ConvBlock_{i}"]["Conv_0"]
        layers.append({"kind": "conv", "kernel": np.asarray(p["kernel"]),
                       "bias": np.asarray(p["bias"])})
    for j in range(len(_linear_features(model_cfg))):
        p = params[f"MlpBlock_{j}"]["Dense_0"]
        layers.append({"kind": "dense", "kernel": np.asarray(p["kernel"]),
                       "bias": np.asarray(p["bias"])})
    head = params["Dense_0"]
    layers.append({"kind": "head", "kernel": np.asarray(head["kernel"]),
                   "bias": np.asarray(head["bias"])})
    return layers


def _float_forward(layers: list[dict], x: jnp.ndarray, taps: bool):
    """The eval forward in plain f32 XLA ops (== the model's lowering
    bit-for-bit up to dtype: SAME stride-1 conv, ReLU, 2x2 max-pool,
    flatten, dense+ReLU, head+log-softmax; dropout is eval-off). Used
    for calibration (``taps=True`` returns every quantization-point
    tensor) and as the fidelity oracle."""
    acts = [x]
    for layer in layers:
        w = jnp.asarray(layer["kernel"], jnp.float32)
        b = jnp.asarray(layer["bias"], jnp.float32)
        if layer["kind"] == "conv":
            x = jax.lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ) + b
            x = jax.nn.relu(x)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1),
                "VALID",
            )
            acts.append(x)
        elif layer["kind"] == "dense":
            if x.ndim == 4:
                x = x.reshape((x.shape[0], -1))
            x = jax.nn.relu(x @ w + b)
            acts.append(x)
        else:
            if x.ndim == 4:
                x = x.reshape((x.shape[0], -1))
            x = x @ w + b
            x = jax.nn.log_softmax(x.astype(jnp.float32), axis=-1)
    return (x, acts) if taps else x


def _eval_preprocess(model_cfg, normalize_imagenet: bool,
                     input_affine):
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    return make_preprocess_fn(
        model_cfg.image_size, train=False,
        normalize_imagenet=normalize_imagenet, input_affine=input_affine,
    )


def quantize_model(model_cfg, params, calib_pixels,
                   normalize_imagenet: bool = False,
                   input_affine=None) -> dict[str, Any]:
    """Build the int8 model from a float checkpoint.

    ``calib_pixels``: uint8 ``[n, H, W, 3]`` calibration images (a few
    hundred training rows is plenty for max calibration); they run
    through the SAME eval preprocess the serving program will use
    (resize + [0,1] + the experiment's input convention), so the
    activation scales match deployment exactly. Returns the quantized
    tree: per-layer int8 kernels, f32 dequant scales (s_act[i] * s_w[o]
    folded into one vector), f32 biases, and the activation scales."""
    _require_supported(model_cfg)
    layers = _layers(model_cfg, params)
    pre = _eval_preprocess(model_cfg, normalize_imagenet, input_affine)
    x = pre(jnp.asarray(calib_pixels), None).astype(jnp.float32)
    _, acts = _float_forward(layers, x, taps=True)
    # per-tensor activation scales at every quantization point (the
    # input + each pooled/ReLU'd activation feeding the next layer)
    s_act = [max(float(jnp.max(jnp.abs(a))), 1e-12) / 127.0 for a in acts]

    qlayers = []
    for idx, layer in enumerate(layers):
        w = layer["kernel"].astype(np.float64)
        axes = tuple(range(w.ndim - 1))  # per-output-channel
        s_w = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
        w_q = np.clip(np.rint(w / s_w), -127, 127).astype(np.int8)
        qlayers.append({
            "kind": layer["kind"],
            "kernel_q": w_q,
            # dequant folds the input and weight scales into one
            # per-output-channel vector: y = conv_s32 * dequant + bias
            "dequant": (s_act[min(idx, len(s_act) - 1)]
                        * s_w).astype(np.float32),
            "bias": layer["bias"].astype(np.float32),
        })
    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    return {
        "layers": qlayers,
        "s_act": [float(s) for s in s_act],
        "model": model_cfg.name,
        "image_size": int(model_cfg.image_size),
        "num_classes": int(model_cfg.num_classes),
        "normalize_imagenet": bool(normalize_imagenet),
        "input_affine": normalize_affine(input_affine),
    }


def quantized_forward(qtree: dict, x01: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] floats in [0, 1] → f32 log-probs, every contraction
    s8 x s8 → s32 on the MXU."""
    s_act = qtree["s_act"]

    def quant(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    x_q = quant(x01, s_act[0])
    i = 0
    for layer in qtree["layers"]:
        w_q = jnp.asarray(layer["kernel_q"])
        dq = jnp.asarray(layer["dequant"])
        b = jnp.asarray(layer["bias"])
        if layer["kind"] == "conv":
            y = jax.lax.conv_general_dilated(
                x_q, w_q, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.int32,
            )
            y = jax.nn.relu(y.astype(jnp.float32) * dq + b)
            i += 1
            x_q = quant(y, s_act[i])
            # max-pool directly on int8: max commutes with the monotone
            # quantizer, and the pool moves 4x fewer bytes than at f32
            x_q = jax.lax.reduce_window(
                x_q, jnp.int8(-128), jax.lax.max, (1, 2, 2, 1),
                (1, 2, 2, 1), "VALID",
            )
        elif layer["kind"] == "dense":
            if x_q.ndim == 4:
                x_q = x_q.reshape((x_q.shape[0], -1))
            y = jax.lax.dot(x_q, w_q, preferred_element_type=jnp.int32)
            y = jax.nn.relu(y.astype(jnp.float32) * dq + b)
            i += 1
            x_q = quant(y, s_act[i])
        else:
            if x_q.ndim == 4:
                x_q = x_q.reshape((x_q.shape[0], -1))
            y = jax.lax.dot(x_q, w_q, preferred_element_type=jnp.int32)
            y = y.astype(jnp.float32) * dq + b
            return jax.nn.log_softmax(y, axis=-1)
    raise AssertionError("quantized tree has no head layer")


def build_infer_fn_quantized(qtree: dict, malignant_index: int = 1):
    """The quantized serving program: uint8 pixels → eval preprocess
    (including the input convention the tree was calibrated with) →
    int8 forward → {log_probs, pred, p_malignant} (the exact output
    contract of serve.export.build_infer_fn)."""
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    pre = make_preprocess_fn(
        qtree["image_size"], train=False,
        normalize_imagenet=qtree.get("normalize_imagenet", False),
        input_affine=qtree.get("input_affine"),
    )

    def infer(pixels):
        x = pre(pixels, None)
        log_probs = quantized_forward(qtree, x)
        return {
            "log_probs": log_probs,
            "pred": jnp.argmax(log_probs, axis=-1),
            "p_malignant": jnp.exp(log_probs[:, malignant_index]),
        }

    return infer


def calibration_rows(folder: str, root: str, n_rows: int = 256):
    """Calibration pixels from an experiment's frozen train split
    (falling back to the test split) and held-out report pixels from the
    test split, decoded at the model's canonical geometry — the standard
    way to feed :func:`quantize_model` from a checkpoint folder.

    Returns ``(calib, report)`` uint8 arrays; ``report`` is None when the
    folder has no ``session_test.csv``."""
    import os

    import pandas as pd

    from skin_image_analysis_tpu.data import LesionTable
    from skin_image_analysis_tpu.data.loader import HostImageStore
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    model_cfg, _ = ckpt_lib.load_model(
        os.path.join(folder, ckpt_lib.MODEL_FILENAME))

    def rows(csv_name: str):
        path = os.path.join(folder, csv_name)
        if not os.path.exists(path):
            return None
        df = pd.read_csv(path, index_col=0).head(n_rows)
        table = LesionTable(df, root)
        store = HostImageStore(table, canonical_size=model_cfg.image_size)
        return store.images

    calib = rows("session_train.csv")
    report = rows("session_test.csv")
    if calib is None:
        calib = report
    if calib is None:
        raise ValueError(
            f"{folder} has no session_train.csv/session_test.csv to "
            "calibrate from")
    return calib, report


def quantization_report(model_cfg, params, qtree,
                        eval_pixels) -> dict[str, float]:
    """Fidelity of the int8 program vs the float reference on held-out
    pixels: argmax agreement (overall, and on rows where the float model
    is confident — |top margin| > 0.5 nat), plus the mean |Δlog p|."""
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    layers = _layers(model_cfg, params)
    pre = make_preprocess_fn(
        qtree["image_size"], train=False,
        normalize_imagenet=qtree.get("normalize_imagenet", False),
        input_affine=qtree.get("input_affine"),
    )
    x = pre(jnp.asarray(eval_pixels), None).astype(jnp.float32)
    ref = np.asarray(_float_forward(layers, x, taps=False))
    got = np.asarray(quantized_forward(qtree, x))
    pred_ref, pred_q = ref.argmax(-1), got.argmax(-1)
    sorted_ref = np.sort(ref, axis=-1)
    margin = sorted_ref[:, -1] - sorted_ref[:, -2]
    confident = margin > 0.5
    agree = float((pred_ref == pred_q).mean())
    agree_conf = (
        float((pred_ref[confident] == pred_q[confident]).mean())
        if confident.any() else 1.0
    )
    return {
        "agreement": agree,
        "agreement_confident": agree_conf,
        "confident_fraction": float(confident.mean()),
        "mean_abs_dlogp": float(np.abs(ref - got).mean()),
        "n": int(len(pred_ref)),
    }
