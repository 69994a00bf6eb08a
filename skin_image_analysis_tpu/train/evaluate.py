"""Evaluation: predictions re-associated with metadata + fairness audit.

The reference's ``predict_with_instance`` walks every test batch, argmaxes
on device, then per-item looks up the metadata row by the dataframe index
carried through the loader (tone_bias_test.py:161-237). Here the device
does forward+argmax for the whole (padded) test set and returns three small
arrays — preds, row_ids, malignant-probabilities — and the join happens
either on host (instance dicts, for the parity API) or stays on device for
the segment-sum fairness reductions (metrics.device). Both yield the same
record; tests assert bit-equality.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import numpy as np

import jax.numpy as jnp

from skin_image_analysis_tpu.data.dataset import LesionTable
from skin_image_analysis_tpu.data.loader import BatchIterator
from skin_image_analysis_tpu.metrics import analyse_predictions, roc_auc
from skin_image_analysis_tpu.metrics.device import analyse_predictions_device
from skin_image_analysis_tpu.train.step import make_eval_step


def collect_predictions(
    params: Any,
    apply_fn: Callable,
    loader: BatchIterator,
    eval_step: Callable | None = None,
    preprocess_fn: Callable | None = None,
    batch_stats: Any = None,
    multi_eval: Callable | None = None,
    arena: Any = None,
    eval_k: int = 0,
) -> dict[str, np.ndarray]:
    """Run the model over the loader; returns flat arrays
    {pred, row_id, score_malignant} over valid rows only.
    ``batch_stats`` is required for BatchNorm models (ResNet/Xception).

    With ``multi_eval``/``arena``/``eval_k`` (the scanned eval program
    from make_multi_eval_step + the device-resident uint8 arena), k
    batches run per XLA dispatch — the relay's ~2 ms/dispatch tax is
    paid once per k batches instead of per batch."""
    if multi_eval is not None and arena is not None and eval_k > 1:
        outs = [
            multi_eval(
                params, apply_fn, arena,
                jnp.asarray(ib), jnp.asarray(rid), jnp.asarray(vd),
                batch_stats,
            )
            for ib, _, rid, vd in loader.super_batches(
                eval_k, with_row_ids=True
            )
        ]
        outs = jax.device_get(outs)  # one sync for the whole eval set
        preds, row_ids, scores = [], [], []
        for out in outs:
            valid = out["valid"].reshape(-1)
            preds.append(out["pred"].reshape(-1)[valid])
            row_ids.append(out["row_id"].reshape(-1)[valid])
            lp = out["log_probs"].reshape(-1, out["log_probs"].shape[-1])
            scores.append(np.exp(lp[valid][:, 1]))
        return {
            "pred": np.concatenate(preds),
            "row_id": np.concatenate(row_ids),
            "score_malignant": np.concatenate(scores),
        }
    if eval_step is None:
        eval_step = make_eval_step(preprocess_fn=preprocess_fn)
    # dispatch every batch asynchronously, then fetch the whole eval set
    # in ONE host round-trip (per-batch readbacks serialize the pipeline
    # and cost a link round-trip each)
    outs = [
        eval_step(params, apply_fn, batch, batch_stats) for batch in loader
    ]
    outs = jax.device_get(outs)
    preds, row_ids, scores = [], [], []
    for out in outs:
        valid = out.get("valid", np.ones(len(out["pred"]), bool))
        preds.append(out["pred"][valid])
        row_ids.append(out["row_id"][valid])
        scores.append(np.exp(out["log_probs"][valid][:, 1]))
    return {
        "pred": np.concatenate(preds),
        "row_id": np.concatenate(row_ids),
        "score_malignant": np.concatenate(scores),
    }


def predict_with_instance(
    params: Any,
    apply_fn: Callable,
    loader: BatchIterator,
    table: LesionTable,
    eval_step: Callable | None = None,
    preprocess_fn: Callable | None = None,
    batch_stats: Any = None,
) -> dict[int, dict]:
    """The reference API (tone_bias_test.py:161): index-keyed instance
    dicts with a ``'prediction'`` class-name attached."""
    out = collect_predictions(
        params, apply_fn, loader, eval_step, preprocess_fn, batch_stats
    )
    instances: dict[int, dict] = {}
    for pred, row_id in zip(out["pred"], out["row_id"]):
        inst = table.instance(int(row_id))
        inst["prediction"] = table.class_names[int(pred)]
        instances[int(row_id)] = inst
    return instances


def evaluate_fairness(
    params: Any,
    apply_fn: Callable,
    loader: BatchIterator,
    table: LesionTable,
    eval_step: Callable | None = None,
    preprocess_fn: Callable | None = None,
    on_device: bool = True,
    batch_stats: Any = None,
    multi_eval: Callable | None = None,
    arena: Any = None,
    eval_k: int = 0,
) -> dict:
    """Full per-epoch record: the reference ``analyse_predictions`` schema
    (tone_bias_test.py:546-561) plus an ``auc`` key (BASELINE.json metric,
    absent from the reference)."""
    out = collect_predictions(
        params, apply_fn, loader, eval_step, preprocess_fn, batch_stats,
        multi_eval=multi_eval, arena=arena, eval_k=eval_k,
    )
    order = np.argsort(out["row_id"])
    preds = out["pred"][order].astype(np.int32)
    row_ids = out["row_id"][order]
    scores = out["score_malignant"][order]
    labels = table.labels[row_ids]

    if on_device:
        groups = {
            attr: jnp.asarray(codes[row_ids])
            for attr, codes in table.group_codes.items()
        }
        valid = jnp.ones(len(preds), bool)
        record = analyse_predictions_device(
            jnp.asarray(preds), jnp.asarray(labels), groups, valid
        )
    else:
        instances = {}
        for pred, row_id in zip(preds, row_ids):
            inst = table.instance(int(row_id))
            inst["prediction"] = table.class_names[int(pred)]
            instances[int(row_id)] = inst
        record = analyse_predictions(instances)

    record["auc"] = roc_auc(labels, scores)

    # Per-tone gap metrics (the BASELINE.json headline: "AUC + per-tone
    # accuracy-gap"): group accuracies fall out of the integer confusion
    # counts; per-group AUC is computed over each tone's score slice.
    tone = record["tone_di_results"]
    min_count, maj_count = tone["min_count"], tone["maj_count"]
    acc_dark = (
        (tone["tp_min"] + tone["tn_min"]) / min_count if min_count else 0.0
    )
    acc_light = (
        (tone["tp_maj"] + tone["tn_maj"]) / maj_count if maj_count else 0.0
    )
    record["tone_accuracy_dark"] = acc_dark
    record["tone_accuracy_light"] = acc_light
    record["tone_accuracy_gap"] = acc_dark - acc_light
    if "skin_tone" in table.group_codes:
        codes = table.group_codes["skin_tone"][row_ids]
        dark_mask = codes == 1
        light_mask = codes == 0
        record["auc_dark"] = roc_auc(labels[dark_mask], scores[dark_mask])
        record["auc_light"] = roc_auc(labels[light_mask], scores[light_mask])
    return record


def evaluate_model(
    params: Any, apply_fn: Callable, loader: BatchIterator,
    preprocess_fn: Callable | None = None, batch_stats: Any = None,
) -> float:
    """Whole-set accuracy (reference: tone_bias_test.py:99-127)."""
    eval_step = make_eval_step(preprocess_fn=preprocess_fn)
    correct = total = 0
    for batch in loader:
        out = eval_step(params, apply_fn, batch, batch_stats)
        valid = np.asarray(out.get("valid", np.ones(len(out["pred"]), bool)))
        labels = np.asarray(batch["label"])[valid]
        preds = np.asarray(out["pred"])[valid]
        correct += int((preds == labels).sum())
        total += int(valid.sum())
    return correct / max(total, 1)


def evaluate_model_by_class(
    params: Any,
    apply_fn: Callable,
    loader: BatchIterator,
    n_classes: int = 2,
    preprocess_fn: Callable | None = None,
    batch_stats: Any = None,
) -> dict[int, float]:
    """Per-class accuracy (reference: tone_bias_test.py:129-159)."""
    eval_step = make_eval_step(preprocess_fn=preprocess_fn)
    correct = np.zeros(n_classes)
    total = np.zeros(n_classes)
    for batch in loader:
        out = eval_step(params, apply_fn, batch, batch_stats)
        valid = np.asarray(out.get("valid", np.ones(len(out["pred"]), bool)))
        labels = np.asarray(batch["label"])[valid]
        preds = np.asarray(out["pred"])[valid]
        for c in range(n_classes):
            mask = labels == c
            total[c] += mask.sum()
            correct[c] += (preds[mask] == c).sum()
    return {c: correct[c] / max(total[c], 1) for c in range(n_classes)}
