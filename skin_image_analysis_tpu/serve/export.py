"""AOT serving export: the inference program as a portable artifact.

The reference "deploys" by unpickling the whole torch module in-process
(tone_bias_model.py:305-338 — ``torch.load(session_model.pth,
weights_only=False)`` requires the model class importable at the
deployment site). The TPU-native serving story is the opposite: trace
the FULL inference program once — uint8 ``[b, S, S, C]`` pixels →
resize/normalize preprocess → bf16 forward → ``{log_probs, pred,
p_malignant}`` — lower it to StableHLO via :mod:`jax.export`, and
serialize it with a SYMBOLIC batch dimension. One self-contained
artifact (weights embedded as constants) then serves ANY batch size on
any JAX runtime — TPU serving container, CPU canary — with no model
code, no Python class, no pickle.

A tiny JSON manifest rides next to the artifact (class names, input
spec, lowering platforms) so downstream systems can validate inputs
without deserializing the program.
"""

from __future__ import annotations

import json
import os
from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

MANIFEST_SUFFIX = ".json"


def build_infer_fn_weights_arg(model_cfg, malignant_index: int = 1,
                               normalize_imagenet: bool = False,
                               mesh=None, data_axis: str = "data",
                               input_affine: tuple | None = None):
    """The production inference program with the weights as a CALL
    ARGUMENT: ``infer(variables, pixels)``. Because jit's cache keys on
    the variables' tree structure + leaf shapes (not their values), a
    serving process can hot-swap same-architecture weights under this
    form and every compiled batch bucket still hits the cache — vs the
    constants-embedded form below, where new weights mean recompiling
    every bucket (30-90 s each through a remote-compile relay,
    docs/PERF.md §Cold start). Used by
    ``InferenceSession.from_experiment`` / ``reload_weights``."""
    from skin_image_analysis_tpu.models.cnn import build_model
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn

    model = build_model(model_cfg)
    # ITA-input models (in_channels=2, the ToneClassifier stage-3
    # "ITA-matrix CNN") take fused [ITA/90, skin-mask] channels computed
    # from raw sRGB in [0,1] — pure jnp, so it lowers into the same
    # exported program; ImageNet normalization never applies there.
    ita_mode = getattr(model_cfg, "in_channels", 3) == 2
    pre = make_preprocess_fn(
        model_cfg.image_size, train=False,
        normalize_imagenet=normalize_imagenet and not ita_mode,
        input_affine=input_affine if not ita_mode else None)

    def infer(variables, pixels):
        if mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec

            pixels = jax.lax.with_sharding_constraint(
                pixels, NamedSharding(mesh, PartitionSpec(data_axis))
            )
        x = pre(pixels, None)
        if ita_mode:
            from skin_image_analysis_tpu.data.ita import ita_input

            x = ita_input(x)
        log_probs = model.apply(variables, x, train=False)
        return {
            "log_probs": log_probs,
            "pred": jnp.argmax(log_probs, axis=-1),
            "p_malignant": jnp.exp(log_probs[:, malignant_index]),
        }

    return infer


def build_infer_fn(model_cfg, params, batch_stats=None,
                   malignant_index: int = 1,
                   normalize_imagenet: bool = False,
                   mesh=None, data_axis: str = "data",
                   input_affine: tuple | None = None):
    """The production inference program: eval preprocess (reference
    Rescale semantics; ``normalize_imagenet`` must match the training
    run's DataConfig) + forward + argmax + malignant probability
    (softmax of the log-probs head, tone_bias_explain.py:103). Weights
    are closed over as compile-time constants — the form the AOT export
    lowers (a self-contained artifact).

    With ``mesh``, the batch is constrained to the data axis (DP
    serving: each chip forwards batch/N rows; params replicated by the
    caller) — batch sizes must divide by the data-axis extent."""
    infer_args = build_infer_fn_weights_arg(
        model_cfg, malignant_index=malignant_index,
        normalize_imagenet=normalize_imagenet, mesh=mesh,
        data_axis=data_axis, input_affine=input_affine)
    variables: dict[str, Any] = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats

    def infer(pixels):
        return infer_args(variables, pixels)

    return infer


def export_model(
    experiment_folder: str,
    out_path: str,
    canonical_size: int | None = None,
    platforms: Sequence[str] | None = None,
    class_names: Sequence[str] | None = None,
    normalize_imagenet: bool | None = None,
    quantize: str | None = None,
    calib_pixels=None,
    report_pixels=None,
    model_filename: str | None = None,
    report_on_calibration_rows: bool = False,
    calib_mode: str = "max",
) -> dict:
    """Export the experiment's trained model as a serialized StableHLO
    program at ``out_path`` (+ ``out_path + ".json"`` manifest).

    ``normalize_imagenet`` must match the training run's eval
    preprocess; when None it is read from the experiment folder's
    ``train_config.json`` (the flagship loop writes one), defaulting to
    False — exporting with the wrong normalization would silently score
    differently-scaled inputs.

    The batch dimension is exported symbolically when the lowering
    supports it (any batch size at serve time); if symbolic lowering
    fails for the model/preprocess combination, the export falls back
    to a concrete batch recorded in the manifest (predict_exported pads
    to it).

    ``quantize="int8"`` lowers the post-training-quantized program
    instead (serve/quantize.py: int8 weights + activations, s8xs8->s32
    contractions, 4x smaller artifact): requires ``calib_pixels``
    (uint8 calibration images, e.g. training rows); ``report_pixels``
    (held-out rows) adds a fidelity report to the manifest.
    ``quantize="int8-weights"`` embeds int8 WEIGHT constants that
    dequantize in the program prologue — compute unchanged, artifact
    ~4x smaller, works on ANY model family and needs no calibration
    (``report_pixels`` still adds the fidelity report).
    """
    from jax import export as jexport

    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    model_cfg, loaded = ckpt_lib.load_model(
        os.path.join(experiment_folder,
                     model_filename or ckpt_lib.MODEL_FILENAME)
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    train_cfg: dict = {}
    cfg_path = os.path.join(experiment_folder, "train_config.json")
    if os.path.exists(cfg_path):
        with open(cfg_path) as f:
            train_cfg = json.load(f)
    if normalize_imagenet is None:
        normalize_imagenet = bool(
            train_cfg.get("data", {}).get("normalize_imagenet", False)
        )
    input_affine = train_cfg.get("data", {}).get("input_affine")
    if class_names is None:
        # transfer trainers record their label space (light/dark, HAM dx
        # classes); the flagship default stays benign/malignant
        class_names = train_cfg.get("class_names",
                                    ("benign", "malignant"))
    s = canonical_size or model_cfg.image_size
    # the program input is always RGB pixels — ITA-input models compute
    # their 2 channels INSIDE the exported program (build_infer_fn)
    c = 3
    quant_report = None
    if quantize == "int8":
        if calib_pixels is None:
            raise ValueError(
                "quantize='int8' needs calib_pixels (uint8 images, e.g. "
                "a few hundred training rows)")
        from skin_image_analysis_tpu.serve.quantize import (
            build_infer_fn_quantized,
            quantization_report,
            quantize_model,
        )

        qtree = quantize_model(
            model_cfg, params, calib_pixels,
            normalize_imagenet=normalize_imagenet,
            input_affine=input_affine, batch_stats=batch_stats,
            calib_mode=calib_mode,
        )
        if report_pixels is not None:
            quant_report = quantization_report(
                model_cfg, params, qtree, report_pixels,
                batch_stats=batch_stats)
        infer = build_infer_fn_quantized(qtree)
    elif quantize == "int8-weights":
        # weight-only: ANY family (no calibration — compute unchanged,
        # int8 constants dequantize in the program prologue)
        from skin_image_analysis_tpu.serve.quantize import (
            build_infer_fn_w8,
            quantize_weights_only,
            weights_only_report,
        )

        qparams = quantize_weights_only(params)
        if report_pixels is not None:
            quant_report = weights_only_report(
                model_cfg, params, qparams, report_pixels,
                batch_stats=batch_stats,
                normalize_imagenet=normalize_imagenet,
                input_affine=input_affine)
        infer = build_infer_fn_w8(
            model_cfg, qparams, batch_stats,
            normalize_imagenet=normalize_imagenet,
            input_affine=input_affine)
    elif quantize is not None:
        raise ValueError(f"unknown quantize scheme {quantize!r}")
    else:
        infer = build_infer_fn(model_cfg, params, batch_stats,
                               normalize_imagenet=normalize_imagenet,
                               input_affine=input_affine)

    kwargs: dict[str, Any] = {}
    if platforms:
        kwargs["platforms"] = tuple(platforms)

    batch: int | str
    try:
        specs = jexport.symbolic_args_specs(
            (jnp.zeros((2, s, s, c), jnp.uint8),), "b, _, _, _"
        )
        exported = jexport.export(jax.jit(infer), **kwargs)(*specs)
        batch = "symbolic"
    except Exception as e:
        # some lowerings reject symbolic dims; a fixed-batch artifact
        # still serves (predict_exported pads to the manifest batch).
        # Loud, not silent: a real export bug should not be mistaken
        # for a symbolic-dim limitation.
        print(f"symbolic-batch export failed ({type(e).__name__}: {e}); "
              "falling back to a fixed batch of 64")
        exported = jexport.export(jax.jit(infer), **kwargs)(
            jax.ShapeDtypeStruct((64, s, s, c), jnp.uint8)
        )
        batch = 64

    blob = exported.serialize()
    with open(out_path, "wb") as f:
        f.write(blob)
    manifest = {
        "format": "jax.export/StableHLO",
        "input": {"shape": [batch, s, s, c], "dtype": "uint8",
                  "layout": "NHWC, [0,255] pixels"},
        "outputs": ["log_probs", "pred", "p_malignant"],
        "class_names": list(class_names),
        "image_size": model_cfg.image_size,
        "canonical_size": s,
        "normalize_imagenet": bool(normalize_imagenet),
        "input_affine": input_affine,
        "quantization": (
            {"scheme": quantize,
             **({"calib_mode": calib_mode} if quantize == "int8" else {}),
             **(quant_report or {}),
             # True = the fidelity report scored the very rows the
             # activation scales were calibrated on (train split was
             # absent) — its agreement numbers are optimistic
             **({"report_on_calibration_rows": True}
                if report_on_calibration_rows and quant_report else {})}
            if quantize else None
        ),
        "platforms": list(exported.platforms),
        "model": model_cfg.name,
        "bytes": len(blob),
        "experiment_folder": os.path.abspath(experiment_folder),
    }
    with open(out_path + MANIFEST_SUFFIX, "w") as f:
        json.dump(manifest, f, indent=2)
    return manifest


def load_exported(path: str):
    """Deserialize an exported artifact; returns the jax.export.Exported
    (call it via ``.call(pixels)`` — jit-compatible)."""
    from jax import export as jexport

    with open(path, "rb") as f:
        return jexport.deserialize(f.read())


def predict_exported(path: str, pixels: np.ndarray) -> dict[str, np.ndarray]:
    """Convenience serve call: deserialize + run one batch.

    Fixed-batch artifacts (the symbolic-lowering fallback) accept any
    smaller batch here: inputs pad with zero rows to the exported batch
    and outputs slice back."""
    exported = load_exported(path)
    pixels = np.asarray(pixels)
    n = pixels.shape[0]
    want = None
    manifest_path = path + MANIFEST_SUFFIX
    if os.path.exists(manifest_path):
        with open(manifest_path) as f:
            shape0 = json.load(f)["input"]["shape"][0]
        if isinstance(shape0, int):
            want = shape0
    if want is not None and n != want:
        if n > want:
            raise ValueError(
                f"{path} was exported with a fixed batch of {want}; "
                f"got {n} rows — split the batch"
            )
        pad = np.zeros((want - n,) + pixels.shape[1:], pixels.dtype)
        pixels = np.concatenate([pixels, pad])
    out = exported.call(jnp.asarray(pixels))
    return {k: np.asarray(v)[:n] for k, v in out.items()}
