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
  SAME-padding zeros stay exact. BatchNorm needs no folding: per-channel
  symmetric quantization is scale-invariant per output channel, so BN
  riding as f32 epilogue ops (which XLA fuses into the conv) is
  bit-identical to quantizing the folded kernel.
- **Activations**: per-tensor symmetric int8 with max calibration:
  ``s_x = max|x| / 127`` observed over a calibration batch at every
  tensor in the graph. Post-ReLU tensors are non-negative, so symmetric
  int8 spends one bit on a sign that never occurs — the standard cost
  of keeping the conv in the s8xs8 form XLA lowers natively.
- **Compute**: ``conv/dot(x_q, w_q, preferred_element_type=int32)`` →
  dequantize ``* (s_x * s_w[o])`` → bias/BN/residual epilogues in f32 →
  activation → requantize to the activation tensor's own scale when it
  feeds another quantized contraction. Max-pools and reshapes on int8
  tensors pass the values through exactly (max and reshape commute with
  the monotone quantizer) and move 4x fewer bytes. The log-softmax head
  stays f32.

The graph comes from AUTOMATIC capture (serve/trace.py): the registered
model's eval forward is traced with ``jax.make_jaxpr`` and partially
evaluated against the checkpoint weights, so ANY registry family
quantizes — including the SE/swish families (EfficientNet v1/v2), whose
squeeze-excite internals ride f32 (spatially-1x1 convs feeding a sigmoid
gate: negligible FLOPs, outlier-sensitive consumer). The float executor
over the captured graph is pinned equal to the real model's eval forward
per family (tests/test_quantize.py), so calibration and the fidelity
oracle describe exactly the program being served.

Fidelity is checked, not assumed: :func:`quantization_report` compares
quantized vs float predictions on held-out pixels (argmax agreement,
overall and on confident rows) — tests pin it, and the serve/export
CLIs print it next to the artifact.
"""

from __future__ import annotations

from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.serve.trace import (
    Graph,
    graph_forward,
    run_op_float,
    trace_graph,
)

#: captured ops that pass int8 values through exactly (max-pool: max
#: commutes with the monotone quantizer; reshape: values unchanged)
_PASSTHROUGH = ("maxpool", "reshape")


def _build_graph(model_cfg, params, batch_stats=None) -> Graph:
    """Capture the model's eval forward as the quantization graph IR
    (serve/trace.py — replaces the round-3 per-family hand builders)."""
    return trace_graph(model_cfg, params, batch_stats)


def _float_forward(graph: Graph, x, taps: bool = False,
                   tap_quantile: float | None = None):
    """The f32 oracle over the captured graph (see trace.graph_forward);
    kept under its round-3 name for the tests that pin it equal to the
    live model forward."""
    return graph_forward(graph, x, taps, tap_quantile)


def _quantize_ops(graph: Graph, scales: list[float]) -> list[dict]:
    """Captured float graph + per-tensor activation scales → the int8 op
    list (int8 kernels, static dequant vectors, activation requantize
    points).

    Tensor representation is decided statically:

    - a quantized conv/dense consumes int8 — either the scale its input
      already carries, or (f32 input) a fresh quantization at the
      input's calibrated scale;
    - an activation (relu/relu6/swish) emits int8 at its OWN calibrated
      scale iff it feeds a quantized contraction through
      value-preserving ops — this places int8 exactly where the bytes
      matter (inter-layer tensors) and keeps f32 where precision does
      (pre-residual tensors, SE gates, the log-softmax head);
    - max-pool/reshape carry their input's representation through.
    """
    ops = graph.ops
    n_t = len(ops) + 1
    # backward: does tensor t feed a quantized contraction through
    # passthrough ops only?
    feeds_q = [False] * n_t
    for i in reversed(range(len(ops))):
        op = ops[i]
        if op["op"] in ("conv", "dense") and op.get("quantize"):
            feeds_q[op["in"]] = True
        elif op["op"] in _PASSTHROUGH and feeds_q[i + 1]:
            feeds_q[op["in"]] = True

    # forward: eff[t] = the int8 scale tensor t carries (None = f32)
    eff: list = [None] * n_t
    qops: list[dict] = []
    for i, op in enumerate(ops):
        out = i + 1
        kind = op["op"]
        q = {k: v for k, v in op.items() if k != "kernel"}
        if kind in ("conv", "dense"):
            if op.get("quantize"):
                w = op["kernel"].astype(np.float64)
                axes = tuple(range(w.ndim - 1))  # per-output-channel
                s_w = np.maximum(np.abs(w).max(axis=axes), 1e-12) / 127.0
                q["kernel_q"] = np.clip(
                    np.rint(w / s_w), -127, 127).astype(np.int8)
                s_in = eff[op["in"]]
                if s_in is None:  # f32 input requantizes at this op
                    s_in = scales[op["in"]]
                q["in_scale"] = float(s_in)
                q["dequant"] = (s_in * s_w).astype(np.float32)
            else:
                q["kernel"] = op["kernel"]  # SE internals: f32 replay
            eff[out] = None
        elif kind == "act":
            q["out_scale"] = scales[out] if feeds_q[out] else None
            eff[out] = q["out_scale"]
        elif kind in _PASSTHROUGH:
            eff[out] = eff[op["in"]]
        else:
            eff[out] = None
        qops.append(q)
    return qops


def quantized_forward(qtree: dict, x01: jnp.ndarray) -> jnp.ndarray:
    """[B, S, S, 3] preprocessed floats → f32 log-probs, every sizeable
    contraction s8 x s8 → s32 on the MXU, inter-layer activations
    stored int8."""

    def quant(v, s):
        return jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8)

    def deq(a, s):
        return a if s is None else a.astype(jnp.float32) * s

    # tensors: (array, scale) — scale None marks an f32 tensor
    ts: list[tuple] = [(x01.astype(jnp.float32), None)]

    def get_f32(t: int):
        return deq(*ts[t])

    for op in qtree["ops"]:
        kind = op["op"]
        if kind in ("conv", "dense") and op.get("quantize"):
            a, s = ts[op["in"]]
            if s is None:
                a = quant(a, op["in_scale"])
            if kind == "conv":
                y = jax.lax.conv_general_dilated(
                    a, jnp.asarray(op["kernel_q"]), op["strides"],
                    op["padding"],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=op["groups"],
                    preferred_element_type=jnp.int32,
                )
            else:
                y = jax.lax.dot(a, jnp.asarray(op["kernel_q"]),
                                preferred_element_type=jnp.int32)
            ts.append((y.astype(jnp.float32) * jnp.asarray(op["dequant"]),
                       None))
        elif kind == "act":
            y = {"relu": jax.nn.relu, "relu6": jax.nn.relu6,
                 "swish": jax.nn.silu}[op["kind"]](get_f32(op["in"]))
            if op["out_scale"] is not None:
                ts.append((quant(y, op["out_scale"]), op["out_scale"]))
            else:
                ts.append((y, None))
        elif kind == "maxpool":
            a, s = ts[op["in"]]
            init = -jnp.inf if s is None else jnp.int8(-128)
            y = jax.lax.reduce_window(
                a, init, jax.lax.max, (1, *op["window"], 1),
                (1, *op["strides"], 1), op["padding"],
            )
            ts.append((y, s))
        elif kind == "reshape":
            a, s = ts[op["in"]]
            ts.append((a.reshape((a.shape[0],) + tuple(op["tail"])), s))
        else:
            # everything else (bias/BN epilogues, residual adds, GAP,
            # SE gates, log-softmax) replays in f32 — XLA fuses these
            # elementwise chains into the surrounding contractions
            ts.append((run_op_float(op, get_f32), None))
    return get_f32(qtree["out"])


# -- public API ---------------------------------------------------------------


def _eval_preprocess(image_size: int, normalize_imagenet: bool,
                     input_affine):
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    return make_preprocess_fn(
        image_size, train=False,
        normalize_imagenet=normalize_imagenet, input_affine=input_affine,
    )


def parse_calib_mode(mode: str) -> float | None:
    """``"max"`` → None; ``"percentile"`` / ``"percentile:99.9"`` → the
    quantile in [0, 1]. Raises on anything else."""
    if mode == "max":
        return None
    if mode == "percentile" or mode.startswith("percentile:"):
        p = 99.9 if mode == "percentile" else float(mode.split(":", 1)[1])
        if not 50.0 < p <= 100.0:
            raise ValueError(f"percentile must be in (50, 100], got {p}")
        return p / 100.0
    raise ValueError(
        f"unknown calibration mode {mode!r} (max | percentile[:p])")


def quantize_model(model_cfg, params, calib_pixels,
                   normalize_imagenet: bool = False,
                   input_affine=None, batch_stats=None,
                   calib_mode: str = "max") -> dict[str, Any]:
    """Build the int8 model from a float checkpoint.

    ``calib_pixels``: uint8 ``[n, H, W, 3]`` calibration images (a few
    hundred training rows is plenty); they run through the SAME eval
    preprocess the serving program will use (resize + [0,1] + the
    experiment's input convention), so the activation scales match
    deployment exactly. ``batch_stats`` is required for BatchNorm
    families (the captured eval forward reads the running stats).

    ``calib_mode``: ``"max"`` (default) scales each activation tensor to
    its observed max|·| — exact coverage, but one hot value in real data
    stretches every downstream scale. ``"percentile[:p]"`` (default
    p=99.9) scales to the p-th percentile of |·| instead: outliers
    saturate at ±127 while everyone else keeps full resolution — the
    standard robust choice for real-world cohorts.

    Returns the quantized tree: the int8 op graph plus per-tensor
    activation scales."""
    tap_q = parse_calib_mode(calib_mode)
    graph = _build_graph(model_cfg, params, batch_stats)
    pre = _eval_preprocess(model_cfg.image_size, normalize_imagenet,
                           input_affine)

    # one jitted program for the whole calibration pass (eager per-op
    # dispatch costs minutes through a remote-dispatch relay)
    def calibrate(pixels):
        x = pre(pixels, None).astype(jnp.float32)
        return _float_forward(graph, x, taps=True, tap_quantile=tap_q)[1]

    maxima = np.asarray(jax.jit(calibrate)(jnp.asarray(calib_pixels)))
    scales = [max(float(m), 1e-12) / 127.0 for m in maxima]

    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    return {
        "ops": _quantize_ops(graph, scales),
        "out": graph.out,
        "scales": scales,
        "model": model_cfg.name,
        "image_size": int(model_cfg.image_size),
        "num_classes": int(model_cfg.num_classes),
        "normalize_imagenet": bool(normalize_imagenet),
        "input_affine": normalize_affine(input_affine),
        "calib_mode": calib_mode,
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
    graph = _build_graph(model_cfg, params, batch_stats)
    pre = _eval_preprocess(
        qtree["image_size"],
        qtree.get("normalize_imagenet", False),
        qtree.get("input_affine"),
    )
    x = pre(jnp.asarray(eval_pixels), None).astype(jnp.float32)
    ref = np.asarray(jax.jit(
        lambda v: _float_forward(graph, v, taps=False))(x))
    got = np.asarray(jax.jit(
        lambda v: quantized_forward(qtree, v))(x))
    return _fidelity(ref, got)


# -- weight-only int8 (any family) -------------------------------------------


def quantize_weights_only(params) -> Any:
    """Per-output-channel symmetric int8 on every kernel leaf (ndim ≥ 2),
    leaving biases/BN vectors f32 — the generic 4x artifact shrink for
    ANY model family. Compute is unchanged: the serving program
    dequantizes the int8 constants back to the model's own dtype in its
    prologue, so the only divergence from the float program is the
    weight rounding (~0.4% relative, reported, not assumed). Returns a
    tree shaped like ``params`` with kernel leaves replaced by
    ``{"_w8": int8 array, "_scale": f32 per-output-channel}``."""

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

    Returns ``(calib, report, report_is_calib)``: uint8 arrays plus a
    flag that is True when the train split was absent and calibration
    fell back to the TEST rows — the fidelity report then scores the
    very rows the activation scales were calibrated on, so its numbers
    are optimistic and the manifest must say so. ``report`` is None when
    the folder has no ``session_test.csv``. ``report_only`` skips the
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
        return None, report, False
    calib = rows("session_train.csv")
    report_is_calib = False
    if calib is None:
        calib = report
        report_is_calib = calib is not None
        if report_is_calib:
            import warnings

            warnings.warn(
                f"{folder} has no session_train.csv — calibrating on the "
                "TEST split; the fidelity report will score the "
                "calibration rows themselves (optimistic; manifest marks "
                "report_on_calibration_rows)",
                stacklevel=2,
            )
    if calib is None:
        raise ValueError(
            f"{folder} has no session_train.csv/session_test.csv to "
            "calibrate from")
    return calib, report, report_is_calib
