"""Post-training int8 quantization of the inference program.

A serving-side capability beyond the reference (whose deployment story
is unpickling the torch module, tone_bias_model.py:305-338): quantize a
trained checkpoint to int8 weights AND int8 activations, so every
conv/dense contraction runs as ``s8 x s8 -> s32`` — on TPU the MXU
executes int8 matmuls at up to ~2x the bf16 rate, the int8 activations
quarter inter-layer HBM traffic (the measured dominant win, docs/PERF.md
§int8: the FULL program is 1.41x faster even where isolated conv probes
lose), and the weight set shrinks 4x (the flagship's 51.4M params:
206 MB f32 → ~52 MB exported).

Scheme (standard symmetric PTQ):

- **Weights**: per-output-channel symmetric int8 —
  ``w_q[..., o] = round(w[..., o] / s_w[o])``, ``s_w[o] =
  max|w[..., o]| / 127``. Exact zero maps to zero; no zero-point, so
  SAME-padding zeros stay exact. BatchNorm layers fold into the
  preceding conv before quantization (eval-mode BN is affine:
  ``W' = W·γ/√(σ²+eps)``, ``b' = β − μ·γ/√(σ²+eps)``).
- **Activations**: per-tensor symmetric int8 with max calibration:
  ``s_x = max|x| / 127`` observed over a calibration batch at every
  tensor in the graph. Post-ReLU tensors are non-negative, so symmetric
  int8 spends one bit on a sign that never occurs — the standard cost
  of keeping the conv in the s8xs8 form XLA lowers natively.
- **Compute**: ``conv/dot(x_q, w_q, preferred_element_type=int32)`` →
  dequantize ``* (s_x * s_w[o])`` → ``+ bias`` (f32) → residual add
  (f32, both sides dequantized) → activation → requantize to the
  tensor's own scale. Max-pools whose input is int8 (the flagship/
  VGG/ResNet pools) run directly on int8 — max commutes with the
  monotone quantizer and the pool moves 4x fewer bytes; Xception's
  pools consume f32 pre-add tensors and stay f32. Global-average-pool
  dequantizes EXACTLY (int32 sum × s_x / HW). The log-softmax head
  stays f32.

Models quantize through a tiny graph IR (``_build_graph``): a flat op
list (conv / maxpool / gap / dense) extracted per family from the
checkpoint — the float executor over that IR is pinned equal to the
real model's eval forward (tests/test_quantize.py), so calibration and
the fidelity oracle describe exactly the program being served.

Fidelity is checked, not assumed: :func:`quantization_report` compares
quantized vs float predictions on held-out pixels (argmax agreement,
overall and on confident rows) — tests pin it, and the serve/export
CLIs print it next to the artifact.

Supported families: ``skin_cancer_list``/``skin_cancer`` (the flagship,
tone_bias_model.py:56-152), ``vgg16``/``vgg19`` (biased convs, no BN),
``resnet18/34/50`` (BN-folded, residual adds in f32 — the reference's
actual transfer backbone, CNNTrial.py:80), ``xception``/
``xception_small`` (the TF notebook's transfer backbone,
jgi_ham_2018_tf.ipynb cell 70 — depthwise+pointwise separable convs,
both int8 with a quantization point between them, the standard
TFLite decomposition), and ``mobilenet_v2`` (inverted residuals,
ReLU6 in f32 between the int8 contractions, linear projections +
residual adds in f32). The SE/swish families (efficientnet*) keep the
bf16 path.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

_BN_EPS = 1e-5  # flax nn.BatchNorm default (matches torch)


# --------------------------------------------------------------------------
# Graph IR
#
# Each op consumes previously produced tensor indices and appends exactly
# ONE tensor (tensor 0 is the preprocessed model input):
#
#   conv:    {"op","in","kernel" HWIO,"bias","strides","padding","groups",
#             "act": relu|relu6|None, "add": tensor idx|None (residual,
#             f32 add)}
#   maxpool: {"op","in","window","strides","padding"}
#   relu:    {"op","in"}   (standalone pre-activation — Xception blocks;
#             exact on int8: relu commutes with the symmetric quantizer)
#   add:     {"op","in","in2"}                (standalone residual, f32)
#   gap:     {"op","in"}                      (global average pool, f32 out)
#   dense:   {"op","in","kernel" IO,"bias","act","log_softmax"}
# --------------------------------------------------------------------------


def _fold_bn(kernel: np.ndarray, bn_params, bn_stats,
             eps: float = _BN_EPS) -> tuple[np.ndarray, np.ndarray]:
    """Fold an eval-mode BatchNorm into the preceding (bias-free) conv."""
    scale = np.asarray(bn_params["scale"], np.float64) / np.sqrt(
        np.asarray(bn_stats["var"], np.float64) + eps)
    kernel = np.asarray(kernel, np.float64) * scale  # broadcast on O axis
    bias = (np.asarray(bn_params["bias"], np.float64)
            - np.asarray(bn_stats["mean"], np.float64) * scale)
    return kernel.astype(np.float32), bias.astype(np.float32)


def _conv(in_idx: int, kernel, bias, strides=(1, 1), padding="SAME",
          act="relu", add=None, groups: int = 1) -> dict:
    return {"op": "conv", "in": in_idx,
            "kernel": np.asarray(kernel, np.float32),
            "bias": np.asarray(bias, np.float32), "strides": tuple(strides),
            "padding": padding, "act": act, "add": add, "groups": groups}


def _dense(in_idx: int, kernel, bias, act=None,
           log_softmax: bool = False) -> dict:
    return {"op": "dense", "in": in_idx,
            "kernel": np.asarray(kernel, np.float32),
            "bias": np.asarray(bias, np.float32), "act": act,
            "log_softmax": log_softmax}


# -- per-family graph builders ---------------------------------------------


def _conv_features(model_cfg) -> tuple[int, ...]:
    if model_cfg.name == "skin_cancer":
        return (32, 64, 128, 256)
    return tuple(model_cfg.conv_features)


def _linear_features(model_cfg) -> tuple[int, ...]:
    if model_cfg.name == "skin_cancer":
        return (512, 256)
    return tuple(model_cfg.linear_features)


def _graph_cnn(model_cfg, params) -> list[dict]:
    """The flagship conv stack (SAME stride-1 convs + ReLU + 2x2
    max-pool, flatten, MLP, log-softmax head — tone_bias_model.py:
    56-152)."""
    ops: list[dict] = []
    idx = 0
    for i in range(len(_conv_features(model_cfg))):
        p = params[f"ConvBlock_{i}"]["Conv_0"]
        ops.append(_conv(idx, p["kernel"], p["bias"]))
        idx += 1
        ops.append({"op": "maxpool", "in": idx, "window": (2, 2),
                    "strides": (2, 2), "padding": "VALID"})
        idx += 1
    for j in range(len(_linear_features(model_cfg))):
        p = params[f"MlpBlock_{j}"]["Dense_0"]
        ops.append(_dense(idx, p["kernel"], p["bias"], act="relu"))
        idx += 1
    head = params["Dense_0"]
    ops.append(_dense(idx, head["kernel"], head["bias"], log_softmax=True))
    return ops


def _graph_vgg(model_cfg, params) -> list[dict]:
    """VGG-16/19 (models/vgg.py): biased 3x3 SAME convs, 2x2 pools,
    GAP → Dense head."""
    from skin_image_analysis_tpu.models.vgg import _BLOCKS

    ops: list[dict] = []
    idx = 0
    for bi, n in enumerate(_BLOCKS[model_cfg.name], start=1):
        for ci in range(1, n + 1):
            p = params[f"block{bi}_conv{ci}"]
            ops.append(_conv(idx, p["kernel"], p["bias"]))
            idx += 1
        ops.append({"op": "maxpool", "in": idx, "window": (2, 2),
                    "strides": (2, 2), "padding": "VALID"})
        idx += 1
    ops.append({"op": "gap", "in": idx})
    idx += 1
    head = params["Dense_0"]
    ops.append(_dense(idx, head["kernel"], head["bias"], log_softmax=True))
    return ops


_RESNET_STAGES = {"resnet18": ((2, 2, 2, 2), "basic"),
                  "resnet34": ((3, 4, 6, 3), "basic"),
                  "resnet50": ((3, 4, 6, 3), "bottleneck")}


def _graph_resnet(model_cfg, params, batch_stats) -> list[dict]:
    """ResNet-18/34/50 (models/resnet.py): BN-folded convs, residual
    adds in f32, strided 3x3s with torch-parity (1,1) padding."""
    stage_sizes, block_kind = _RESNET_STAGES[model_cfg.name]
    ops: list[dict] = []
    idx = 0

    def conv_bn(block: str | None, conv: str, bn: str, in_idx: int,
                strides=(1, 1), padding="SAME", act="relu", add=None):
        nonlocal idx
        if block is None:
            p, s = params, batch_stats
        else:
            p, s = params[block], batch_stats[block]
        k, b = _fold_bn(p[conv]["kernel"], p[bn], s[bn])
        ops.append(_conv(in_idx, k, b, strides, padding, act, add))
        idx += 1
        return idx

    # stem: 7x7/s2 pad (3,3) + BN + ReLU + 3x3/s2 max-pool pad (1,1)
    conv_bn(None, "stem_conv", "stem_bn", 0, strides=(2, 2),
            padding=((3, 3), (3, 3)))
    ops.append({"op": "maxpool", "in": idx, "window": (3, 3),
                "strides": (2, 2), "padding": ((1, 1), (1, 1))})
    idx += 1

    prefix = "BasicBlock_" if block_kind == "basic" else "Bottleneck_"
    n = 0
    for stage, n_blocks in enumerate(stage_sizes):
        for b in range(n_blocks):
            block = f"{prefix}{n}"
            n += 1
            strides = (2, 2) if stage > 0 and b == 0 else (1, 1)
            block_in = idx
            if "downsample_conv" in params[block]:
                residual = conv_bn(block, "downsample_conv",
                                   "downsample_bn", block_in,
                                   strides=strides, padding="VALID",
                                   act=None)
            else:
                residual = block_in
            if block_kind == "basic":
                y = conv_bn(block, "Conv_0", "BatchNorm_0", block_in,
                            strides=strides, padding=((1, 1), (1, 1)))
                conv_bn(block, "Conv_1", "BatchNorm_1", y,
                        padding=((1, 1), (1, 1)), act="relu", add=residual)
            else:
                y = conv_bn(block, "Conv_0", "BatchNorm_0", block_in,
                            padding="VALID")
                y = conv_bn(block, "Conv_1", "BatchNorm_1", y,
                            strides=strides, padding=((1, 1), (1, 1)))
                conv_bn(block, "Conv_2", "BatchNorm_2", y,
                        padding="VALID", act="relu", add=residual)

    ops.append({"op": "gap", "in": idx})
    idx += 1
    head = params["Dense_0"]
    ops.append(_dense(idx, head["kernel"], head["bias"], log_softmax=True))
    return ops


_KERAS_BN_EPS = 1e-3  # keras BatchNormalization default (xception/mbv2)


def _graph_xception(model_cfg, params, batch_stats) -> list[dict]:
    """Xception (models/xception.py, keras geometry): separable convs as
    depthwise(int8) → quantization point → pointwise(int8, BN folded);
    pre-activation relus as standalone ops (exact on int8); entry/exit
    residuals as standalone f32 adds after the SAME max-pools."""
    middle = 8 if model_cfg.name == "xception" else 2
    ops: list[dict] = []
    idx = 0

    def conv_bn(conv: str, bn: str, in_idx: int, strides=(1, 1),
                padding="VALID", act=None):
        nonlocal idx
        k, b = _fold_bn(params[conv]["kernel"], params[bn],
                        batch_stats[bn], eps=_KERAS_BN_EPS)
        ops.append(_conv(in_idx, k, b, strides, padding, act))
        idx += 1
        return idx

    def sepconv_bn(name: str, in_idx: int) -> int:
        """depthwise (no BN, no bias) → pointwise with the block BN
        folded; both contractions int8."""
        nonlocal idx
        dw = np.asarray(params[name]["depthwise"]["kernel"], np.float32)
        cin = dw.shape[-1]
        ops.append(_conv(in_idx, dw, np.zeros(cin, np.float32),
                         act=None, groups=cin))
        idx += 1
        k, b = _fold_bn(params[name]["pointwise"]["kernel"],
                        params[f"{name}_bn"], batch_stats[f"{name}_bn"],
                        eps=_KERAS_BN_EPS)
        ops.append(_conv(idx, k, b, act=None))
        idx += 1
        return idx

    def relu(in_idx: int) -> int:
        nonlocal idx
        ops.append({"op": "relu", "in": in_idx})
        idx += 1
        return idx

    def add(a: int, b: int) -> int:
        nonlocal idx
        ops.append({"op": "add", "in": a, "in2": b})
        idx += 1
        return idx

    def maxpool(in_idx: int) -> int:
        nonlocal idx
        ops.append({"op": "maxpool", "in": in_idx, "window": (3, 3),
                    "strides": (2, 2), "padding": "SAME"})
        idx += 1
        return idx

    # entry stem: two VALID conv+BN+relu
    x = conv_bn("block1_conv1", "block1_conv1_bn", 0, strides=(2, 2),
                act="relu")
    x = conv_bn("block1_conv2", "block1_conv2_bn", x, act="relu")

    # entry blocks 2-4: [relu →] sepconv ×2 → maxpool, 1x1/s2 skip
    for bi in (2, 3, 4):
        residual = conv_bn(f"block{bi}_res_conv", f"block{bi}_res_bn",
                           x, strides=(2, 2))
        y = x
        for si in (1, 2):
            if not (bi == 2 and si == 1):
                y = relu(y)
            y = sepconv_bn(f"block{bi}_sepconv{si}", y)
        y = maxpool(y)
        x = add(y, residual)

    # middle flow: 3× (relu → sepconv) + residual
    for mi in range(middle):
        bi = 5 + mi
        y = x
        for si in (1, 2, 3):
            y = relu(y)
            y = sepconv_bn(f"block{bi}_sepconv{si}", y)
        x = add(x, y)

    # exit block + tail
    bi = 5 + middle
    residual = conv_bn(f"block{bi}_res_conv", f"block{bi}_res_bn", x,
                       strides=(2, 2))
    y = relu(x)
    y = sepconv_bn(f"block{bi}_sepconv1", y)
    y = relu(y)
    y = sepconv_bn(f"block{bi}_sepconv2", y)
    y = maxpool(y)
    x = add(y, residual)
    bi += 1
    x = sepconv_bn(f"block{bi}_sepconv1", x)
    x = relu(x)
    x = sepconv_bn(f"block{bi}_sepconv2", x)
    x = relu(x)

    ops.append({"op": "gap", "in": x})
    idx += 1
    head = params["Dense_0"]
    ops.append(_dense(idx, head["kernel"], head["bias"], log_softmax=True))
    return ops


def _graph_mobilenet_v2(model_cfg, params, batch_stats) -> list[dict]:
    """MobileNetV2 (models/mobilenet.py, keras alpha=1.0 geometry):
    expand/depthwise convs int8 with ReLU6 applied in f32 after the
    dequant, linear projections + residual adds in f32, stride-2
    depthwise with keras correct_pad explicit padding (tracked through
    the spatial sizes)."""
    from skin_image_analysis_tpu.models.mobilenet import (
        _STAGES,
        make_divisible,
    )

    ops: list[dict] = []
    idx = 0
    size = int(model_cfg.image_size)

    def conv_bn(name: str, in_idx: int, strides=(1, 1), padding="SAME",
                act="relu6", groups: int = 1, bn: str | None = None,
                add=None):
        nonlocal idx
        bn = bn or f"{name}_BN"
        k, b = _fold_bn(params[name]["kernel"], params[bn],
                        batch_stats[bn], eps=_KERAS_BN_EPS)
        ops.append(_conv(in_idx, k, b, strides, padding, act, add,
                         groups=groups))
        idx += 1
        return idx

    x = conv_bn("Conv1", 0, strides=(2, 2), bn="bn_Conv1")
    size = -(-size // 2)  # SAME stride-2

    filters_in = make_divisible(32)
    block_id = 0
    for t, c, n, s in _STAGES:
        c_out = make_divisible(c)
        for i in range(n):
            stride = s if i == 0 else 1
            prefix = ("expanded_conv" if block_id == 0
                      else f"block_{block_id}")
            block_in = x
            filters = filters_in * t
            y = x
            if t != 1:
                y = conv_bn(f"{prefix}_expand", y)
            if stride == 2:
                # keras correct_pad for k=3 (models/efficientnet.py)
                adjust = 1 - size % 2
                pad = ((1 - adjust, 1), (1 - adjust, 1))
                size = (size - 1 - adjust) // 2 + 1
            else:
                pad = "SAME"
            y = conv_bn(f"{prefix}_depthwise", y, strides=(stride, stride),
                        padding=pad, groups=filters)
            resid = (block_in if stride == 1 and filters_in == c_out
                     else None)
            y = conv_bn(f"{prefix}_project", y, act=None, add=resid)
            x = y
            filters_in = c_out
            block_id += 1

    x = conv_bn("Conv_1", x, bn="Conv_1_bn")
    ops.append({"op": "gap", "in": x})
    idx += 1
    head = params["Dense_0"]
    ops.append(_dense(idx, head["kernel"], head["bias"], log_softmax=True))
    return ops


_BN_FAMILIES = ("resnet18", "resnet34", "resnet50", "xception",
                "xception_small", "mobilenet_v2")


def _build_graph(model_cfg, params, batch_stats=None) -> list[dict]:
    name = model_cfg.name
    if getattr(model_cfg, "in_channels", 3) != 3:
        raise ValueError("int8 quantization expects RGB-input models")
    if name in ("skin_cancer_list", "skin_cancer"):
        return _graph_cnn(model_cfg, params)
    if name in ("vgg16", "vgg19"):
        return _graph_vgg(model_cfg, params)
    if name in _BN_FAMILIES:
        if batch_stats is None:
            raise ValueError(
                f"{name} quantization needs batch_stats (BatchNorm "
                "folding) — pass the checkpoint's batch_stats collection")
        if name in _RESNET_STAGES:
            return _graph_resnet(model_cfg, params, batch_stats)
        if name == "mobilenet_v2":
            return _graph_mobilenet_v2(model_cfg, params, batch_stats)
        return _graph_xception(model_cfg, params, batch_stats)
    raise ValueError(
        f"int8 quantization supports skin_cancer_list/skin_cancer, "
        f"vgg16/19, resnet18/34/50, xception(+small) and mobilenet_v2; "
        f"got {name!r} (the SE/swish families keep the bf16 path)"
    )


# -- executors ---------------------------------------------------------------


def _apply_act(x, act):
    if act == "relu":
        return jax.nn.relu(x)
    if act == "relu6":
        return jax.nn.relu6(x)
    if act is None:
        return x
    raise ValueError(f"unknown activation {act!r}")


def _pool_pad(padding):
    """reduce_window padding: strings pass through; explicit spatial
    pairs get the batch/channel zero pairs."""
    if isinstance(padding, str):
        return padding
    return ((0, 0), *padding, (0, 0))


def _float_forward(ops: list[dict], x: jnp.ndarray, taps: bool):
    """The eval forward over the graph IR in plain f32 XLA ops — pinned
    equal to the real model's eval ``apply`` (tests/test_quantize.py).
    Used for calibration (``taps=True`` additionally returns the
    per-tensor max|·| stacked as ONE device array — jit-compatible, so
    the whole calibration pass is a single XLA program instead of
    hundreds of eager dispatches) and as the fidelity oracle."""
    ts = [x.astype(jnp.float32)]
    out = None
    for op in ops:
        a = ts[op["in"]]
        if op["op"] == "conv":
            y = jax.lax.conv_general_dilated(
                a, jnp.asarray(op["kernel"]), op["strides"], op["padding"],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=op["groups"],
            ) + jnp.asarray(op["bias"])
            if op["add"] is not None:
                y = y + ts[op["add"]]
            y = _apply_act(y, op["act"])
        elif op["op"] == "maxpool":
            y = jax.lax.reduce_window(
                a, -jnp.inf, jax.lax.max, (1, *op["window"], 1),
                (1, *op["strides"], 1), _pool_pad(op["padding"]),
            )
        elif op["op"] == "relu":
            y = jax.nn.relu(a)
        elif op["op"] == "add":
            y = a + ts[op["in2"]]
        elif op["op"] == "gap":
            y = jnp.mean(a, axis=(1, 2))
        elif op["op"] == "dense":
            if a.ndim == 4:
                a = a.reshape((a.shape[0], -1))
            y = a @ jnp.asarray(op["kernel"]) + jnp.asarray(op["bias"])
            y = _apply_act(y, op["act"])
            if op["log_softmax"]:
                out = jax.nn.log_softmax(y, axis=-1)
        else:  # pragma: no cover - builder owns the op set
            raise ValueError(f"unknown op {op['op']!r}")
        ts.append(y)
    if out is None:  # pragma: no cover - builder always emits a head
        raise AssertionError("graph has no log-softmax head")
    if not taps:
        return out
    maxima = jnp.stack([jnp.max(jnp.abs(t)) for t in ts])
    return out, maxima


def _quantize_ops(ops: list[dict], scales: list[float]) -> list[dict]:
    """Float graph + per-tensor activation scales → the int8 op list
    (int8 kernels, folded dequant vectors).

    Dequant vectors use the tensor scale the EXECUTOR actually carries
    (a max-pool passes its input's int8 values through unchanged, so
    its output rides the input's scale, not the pool output's own
    calibrated one; f32 tensors — gap outputs, pre-add conv results —
    requantize at their consumer with their calibrated scale)."""
    eff: list = [scales[0]]  # scale carried per tensor (None = f32)
    qops: list[dict] = []
    for i, op in enumerate(ops):
        out_idx = i + 1  # tensor this op produces
        q = {k: op[k] for k in op if k not in ("kernel", "bias")}
        if op["op"] in ("conv", "dense"):
            w = op["kernel"].astype(np.float64)
            axes = tuple(range(w.ndim - 1))  # per-output-channel
            s_w = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
            q["kernel_q"] = np.clip(
                np.rint(w / s_w), -127, 127).astype(np.int8)
            s_in = eff[op["in"]]
            if s_in is None:  # f32 input requantizes at this op
                s_in = scales[op["in"]]
            q["dequant"] = (s_in * s_w).astype(np.float32)
            q["bias"] = op["bias"].astype(np.float32)
            q["out_scale"] = scales[out_idx]
            q["in_scale"] = s_in
        if op["op"] == "conv":
            eff.append(scales[out_idx] if op["act"] is not None else None)
        elif op["op"] == "dense":
            eff.append(None if op["log_softmax"] else scales[out_idx])
        elif op["op"] in ("maxpool", "relu"):
            # both pass int8 values through exactly (max / clamp-at-zero
            # commute with the symmetric quantizer) — same scale; f32
            # inputs stay f32
            eff.append(eff[op["in"]])
        else:  # gap / add → f32
            eff.append(None)
        qops.append(q)
    return qops


def quantized_forward(qtree: dict, x01: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] preprocessed floats → f32 log-probs, every
    contraction s8 x s8 → s32 on the MXU, activations stored int8."""
    scales = qtree["scales"]

    def quant(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    # tensors: (array, scale) — scale None marks an f32 tensor
    ts: list[tuple] = [(quant(x01, scales[0]), scales[0])]
    for op in qtree["ops"]:
        a, s_a = ts[op["in"]]
        if op["op"] == "conv":
            if s_a is None:  # f32 input (add/gap/linear-proj output)
                a = quant(a, op["in_scale"])
            y = jax.lax.conv_general_dilated(
                a, jnp.asarray(op["kernel_q"]), op["strides"],
                op["padding"],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                feature_group_count=op["groups"],
                preferred_element_type=jnp.int32,
            )
            y = (y.astype(jnp.float32) * jnp.asarray(op["dequant"])
                 + jnp.asarray(op["bias"]))
            if op["add"] is not None:
                r, s_r = ts[op["add"]]
                y = y + (r.astype(jnp.float32) * s_r
                         if s_r is not None else r)
            y = _apply_act(y, op["act"])
            ts.append((quant(y, op["out_scale"]), op["out_scale"])
                      if op["act"] is not None
                      else (y, None))  # pre-add tensors stay f32
        elif op["op"] == "maxpool":
            init = -jnp.inf if s_a is None else jnp.int8(-128)
            y = jax.lax.reduce_window(
                a, init, jax.lax.max, (1, *op["window"], 1),
                (1, *op["strides"], 1), _pool_pad(op["padding"]),
            )
            ts.append((y, s_a))
        elif op["op"] == "relu":
            # int8: clamp at zero is exact under the symmetric quantizer
            zero = jnp.float32(0) if s_a is None else jnp.int8(0)
            ts.append((jnp.maximum(a, zero), s_a))
        elif op["op"] == "add":
            r, s_r = ts[op["in2"]]
            lhs = a.astype(jnp.float32) * s_a if s_a is not None else a
            rhs = r.astype(jnp.float32) * s_r if s_r is not None else r
            ts.append((lhs + rhs, None))
        elif op["op"] == "gap":
            if s_a is None:
                y = jnp.mean(a, axis=(1, 2))
            else:
                # exact dequantized mean: int32 sum × s / HW
                hw = a.shape[1] * a.shape[2]
                y = (jnp.sum(a.astype(jnp.int32), axis=(1, 2))
                     .astype(jnp.float32) * (s_a / hw))
            ts.append((y, None))
        elif op["op"] == "dense":
            if s_a is None:
                a = quant(a, op["in_scale"])
            if a.ndim == 4:
                a = a.reshape((a.shape[0], -1))
            y = jax.lax.dot(a, jnp.asarray(op["kernel_q"]),
                            preferred_element_type=jnp.int32)
            y = (y.astype(jnp.float32) * jnp.asarray(op["dequant"])
                 + jnp.asarray(op["bias"]))
            y = _apply_act(y, op["act"])
            if op["log_softmax"]:
                return jax.nn.log_softmax(y, axis=-1)
            ts.append((quant(y, op["out_scale"]), op["out_scale"]))
        else:  # pragma: no cover
            raise ValueError(f"unknown op {op['op']!r}")
    raise AssertionError("quantized graph has no head")


# -- public API ---------------------------------------------------------------


def _eval_preprocess(image_size: int, normalize_imagenet: bool,
                     input_affine):
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    return make_preprocess_fn(
        image_size, train=False,
        normalize_imagenet=normalize_imagenet, input_affine=input_affine,
    )


def quantize_model(model_cfg, params, calib_pixels,
                   normalize_imagenet: bool = False,
                   input_affine=None, batch_stats=None) -> dict[str, Any]:
    """Build the int8 model from a float checkpoint.

    ``calib_pixels``: uint8 ``[n, H, W, 3]`` calibration images (a few
    hundred training rows is plenty for max calibration); they run
    through the SAME eval preprocess the serving program will use
    (resize + [0,1] + the experiment's input convention), so the
    activation scales match deployment exactly. ``batch_stats`` is
    required for BatchNorm families (resnet*) — BN folds into the convs
    before quantization. Returns the quantized tree: the int8 op graph
    plus per-tensor activation scales."""
    ops = _build_graph(model_cfg, params, batch_stats)
    pre = _eval_preprocess(model_cfg.image_size, normalize_imagenet,
                           input_affine)

    # one jitted program for the whole calibration pass (eager per-op
    # dispatch costs minutes through a remote-dispatch relay)
    def calibrate(pixels):
        x = pre(pixels, None).astype(jnp.float32)
        return _float_forward(ops, x, taps=True)[1]

    maxima = np.asarray(jax.jit(calibrate)(jnp.asarray(calib_pixels)))
    scales = [max(float(m), 1e-12) / 127.0 for m in maxima]

    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    return {
        "ops": _quantize_ops(ops, scales),
        "scales": scales,
        "model": model_cfg.name,
        "image_size": int(model_cfg.image_size),
        "num_classes": int(model_cfg.num_classes),
        "normalize_imagenet": bool(normalize_imagenet),
        "input_affine": normalize_affine(input_affine),
    }


def build_infer_fn_quantized(qtree: dict, malignant_index: int = 1):
    """The quantized serving program: uint8 pixels → eval preprocess
    (including the input convention the tree was calibrated with) →
    int8 forward → {log_probs, pred, p_malignant} (the exact output
    contract of serve.export.build_infer_fn)."""
    pre = _eval_preprocess(
        qtree["image_size"],
        qtree.get("normalize_imagenet", False),
        qtree.get("input_affine"),
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


def quantization_report(model_cfg, params, qtree, eval_pixels,
                        batch_stats=None) -> dict[str, float]:
    """Fidelity of the int8 program vs the float reference on held-out
    pixels: argmax agreement (overall, and on rows where the float model
    is confident — |top margin| > 0.5 nat), plus the mean |Δlog p|."""
    ops = _build_graph(model_cfg, params, batch_stats)
    pre = _eval_preprocess(
        qtree["image_size"],
        qtree.get("normalize_imagenet", False),
        qtree.get("input_affine"),
    )
    x = pre(jnp.asarray(eval_pixels), None).astype(jnp.float32)
    ref = np.asarray(jax.jit(
        lambda v: _float_forward(ops, v, taps=False))(x))
    got = np.asarray(jax.jit(
        lambda v: quantized_forward(qtree, v))(x))
    return _fidelity(ref, got)


# -- weight-only int8 (any family) -------------------------------------------


def quantize_weights_only(params) -> Any:
    """Per-output-channel symmetric int8 on every kernel leaf (ndim ≥ 2),
    leaving biases/BN vectors f32 — the generic 4x artifact shrink for
    ANY model family (including the SE/swish ones full int8 skips).
    Compute is unchanged: the serving program dequantizes the int8
    constants back to the model's own dtype in its prologue, so the only
    divergence from the float program is the weight rounding (~0.4%
    relative, reported, not assumed). Returns a tree shaped like
    ``params`` with kernel leaves replaced by ``{"_w8": int8 array,
    "_scale": f32 per-output-channel}``."""

    def q(leaf):
        arr = np.asarray(leaf)
        if arr.ndim < 2:
            return arr.astype(np.float32)
        w = arr.astype(np.float64)
        axes = tuple(range(w.ndim - 1))  # per-output-channel (last axis)
        s = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
        return {"_w8": np.clip(np.rint(w / s), -127, 127).astype(np.int8),
                "_scale": s.astype(np.float32)}

    def walk(node):
        if isinstance(node, dict):
            return {k: walk(v) for k, v in node.items()}
        return q(node)

    return walk(params)


def dequantize_weights(qparams) -> Any:
    """The in-program inverse of :func:`quantize_weights_only` — jnp ops,
    so under jit/export the constants stay int8 and the dequant runs in
    the program prologue (XLA folds it once per compilation)."""

    def walk(node):
        if isinstance(node, dict):
            if "_w8" in node:
                return (jnp.asarray(node["_w8"]).astype(jnp.float32)
                        * jnp.asarray(node["_scale"]))
            return {k: walk(v) for k, v in node.items()}
        return jnp.asarray(node)

    return walk(qparams)


def build_infer_fn_w8(model_cfg, qparams, batch_stats=None,
                      malignant_index: int = 1,
                      normalize_imagenet: bool = False,
                      input_affine=None):
    """The weight-only-quantized serving program: identical to
    serve.export.build_infer_fn except the weights embed as int8
    constants and dequantize in the prologue."""
    from skin_image_analysis_tpu.serve.export import (
        build_infer_fn_weights_arg,
    )

    inner = build_infer_fn_weights_arg(
        model_cfg, malignant_index=malignant_index,
        normalize_imagenet=normalize_imagenet, input_affine=input_affine)

    def infer(pixels):
        variables: dict[str, Any] = {"params": dequantize_weights(qparams)}
        if batch_stats is not None:
            variables["batch_stats"] = batch_stats
        return inner(variables, pixels)

    return infer


def weights_only_report(model_cfg, params, qparams, eval_pixels,
                        batch_stats=None,
                        normalize_imagenet: bool = False,
                        input_affine=None) -> dict[str, float]:
    """Fidelity of the weight-only program vs the float one on held-out
    pixels (same keys as :func:`quantization_report`)."""
    from skin_image_analysis_tpu.serve.export import build_infer_fn

    ref_fn = build_infer_fn(model_cfg, params, batch_stats,
                            normalize_imagenet=normalize_imagenet,
                            input_affine=input_affine)
    got_fn = build_infer_fn_w8(model_cfg, qparams, batch_stats,
                               normalize_imagenet=normalize_imagenet,
                               input_affine=input_affine)
    px = jnp.asarray(eval_pixels)
    ref = np.asarray(jax.jit(ref_fn)(px)["log_probs"])
    got = np.asarray(jax.jit(got_fn)(px)["log_probs"])
    return _fidelity(ref, got)


def _fidelity(ref: np.ndarray, got: np.ndarray) -> dict[str, float]:
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


def calibration_rows(folder: str, root: str, n_rows: int = 256,
                     report_only: bool = False):
    """Calibration pixels from an experiment's frozen train split
    (falling back to the test split) and held-out report pixels from the
    test split, decoded at the model's canonical geometry — the standard
    way to feed :func:`quantize_model` from a checkpoint folder.

    Returns ``(calib, report)`` uint8 arrays; ``report`` is None when the
    folder has no ``session_test.csv``. ``report_only`` skips the
    train-split decode (weight-only quantization needs no calibration —
    only the fidelity report's held-out rows)."""
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
        # only the PIXELS matter here — fabricate the label column so
        # transfer-trainer folders (tone_label / HAM dx splits) calibrate
        # through the same decode path as flagship folders
        df = df.assign(benign_malignant="benign")
        table = LesionTable(df, root)
        store = HostImageStore(table, canonical_size=model_cfg.image_size)
        return store.images

    report = rows("session_test.csv")
    if report_only:
        return None, report
    calib = rows("session_train.csv")
    if calib is None:
        calib = report
    if calib is None:
        raise ValueError(
            f"{folder} has no session_train.csv/session_test.csv to "
            "calibrate from")
    return calib, report
