"""Generic image-classification trainer over LesionTables.

One trainer drives every side task in the reference: the ToneClassifier's
binary light/dark ResNet transfer (CNNTrial.py) and the HAM-10000
notebooks' 7-class ``dx`` experiments (jgi_ham_2018_*.ipynb) — arbitrary
``class_names``/``label_column`` via LesionTable, class-weighted NLL,
flip/crop/ImageNet augmentation, per-epoch accuracy + macro PRF metrics,
wandb-style logging. The main diagnosis+fairness pipeline stays in
train.loop (it additionally owns the experiment store and fairness audit).
"""

from __future__ import annotations

from dataclasses import dataclass

import threading

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.data.dataset import LesionTable
from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore
from skin_image_analysis_tpu.ops.preprocess import (
    AugmentConfig,
    make_preprocess_fn,
    normalize_affine,
)
from skin_image_analysis_tpu.toneclassifier.class_weight import (
    balanced_class_weights,
)
from skin_image_analysis_tpu.train.state import copy_state, create_train_state
from skin_image_analysis_tpu.train.step import make_eval_step, make_train_step
from skin_image_analysis_tpu.utils.metrics_log import MetricsLogger, binary_metrics


@dataclass(frozen=True)
class ClassifyConfig:
    model_name: str = "resnet50"
    num_classes: int = 2
    image_size: int = 224
    canonical_size: int = 256
    batch_size: int = 32
    epochs: int = 10
    learning_rate: float = 1e-3
    weight_decay: float = 0.01
    optimizer: str = "adamw"
    use_class_weights: bool = True
    oversample: bool = False
    augment: bool = True
    normalize_imagenet: bool = True
    input_affine: tuple | None = None  # generic (scale, offset) on the
                                    # [0,1] floats — imported models whose
                                    # input convention is neither [0,1]
                                    # nor ImageNet-normalized (exclusive
                                    # with normalize_imagenet; see
                                    # ops.preprocess.normalize_affine)
    seed: int = 0
    compute_dtype: str = "bfloat16"
    out_dir: str = "classify_runs"
    freeze_backbone: bool = False   # frozen-feature transfer: train the
                                    # head only (jgi_ham_2018_torch
                                    # cells 30-32; see ModelConfig)
    input_mode: str = "rgb"         # "ita" = the ToneClassifier plan's
                                    # stage-3 "ITA-matrix CNN"
                                    # (readme.md): train on fused
                                    # on-device [ITA/90, skin-mask]
                                    # channels instead of RGB
                                    # (data.ita.ita_input)
    five_crop_eval: bool = False    # test-time 5-crop TTA, averaged
                                    # (CNNTrialDataset.py:61-65); needs
                                    # canonical_size > image_size
    steps_per_dispatch: int = 1     # >1: scan k train steps / k eval
                                    # batches per XLA program over the
                                    # device arenas (the flagship loop's
                                    # multi-step dispatch — amortizes the
                                    # ~2 ms/program relay tax,
                                    # docs/PERF.md §Transfer)
    checkpoint_best: bool = False   # save session_model_best.msgpack at
                                    # each best_metric improvement (the
                                    # flagship loop's semantics)
    best_metric: str = "accuracy"   # epoch-metric key ('accuracy',
                                    # 'auc', 'f1' — higher better) or
                                    # 'loss' (train_loss_mean, lower)
    early_stop_patience: int = 0    # stop after N epochs without a
                                    # best_metric improvement (0 = off)


def multiclass_metrics(preds, labels, n_classes: int) -> dict[str, float]:
    """Accuracy + macro-averaged precision/recall/F1 (collapses to the
    binary report for n=2 via the positive-class convention)."""
    preds = np.asarray(preds)
    labels = np.asarray(labels)
    if n_classes == 2:
        return binary_metrics(preds, labels)
    accuracy = float((preds == labels).mean()) if preds.size else 0.0
    ps, rs, fs = [], [], []
    for c in range(n_classes):
        tp = int(((preds == c) & (labels == c)).sum())
        fp = int(((preds == c) & (labels != c)).sum())
        fn = int(((preds != c) & (labels == c)).sum())
        p = tp / (tp + fp) if tp + fp else 0.0
        r = tp / (tp + fn) if tp + fn else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        ps.append(p), rs.append(r), fs.append(f)
    return {
        "accuracy": accuracy,
        "precision": float(np.mean(ps)),
        "recall": float(np.mean(rs)),
        "f1": float(np.mean(fs)),
    }


def _oversampled_order(labels: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    weights = balanced_class_weights(labels, int(labels.max()) + 1)[labels]
    p = weights / weights.sum()
    return rng.choice(len(labels), size=len(labels), replace=True, p=p)


def train_classifier(
    train_table: LesionTable,
    test_table: LesionTable,
    cfg: ClassifyConfig = ClassifyConfig(),
    verbose: bool = True,
) -> dict:
    """Returns {state, history, test_metrics, out_dir}."""
    # validate config before any decode/init/compile work
    if cfg.input_mode not in ("rgb", "ita"):
        raise ValueError(f"input_mode must be rgb|ita, got {cfg.input_mode!r}")
    if cfg.five_crop_eval and cfg.canonical_size <= cfg.image_size:
        raise ValueError(
            "five_crop_eval needs canonical_size > image_size "
            f"({cfg.canonical_size} <= {cfg.image_size})"
        )
    if cfg.checkpoint_best or cfg.early_stop_patience:
        # validated upfront — a typo'd metric must not cost an epoch
        trackable = ("loss", "train_loss_mean", "accuracy",
                     "precision", "recall", "f1") + (
                         ("auc",) if cfg.num_classes == 2 else ())
        if cfg.best_metric not in trackable:
            raise ValueError(
                f"best_metric {cfg.best_metric!r} is not trackable; "
                f"choose one of {trackable}"
                + ("" if cfg.num_classes == 2
                   else " ('auc' needs num_classes == 2)"))
    # Decode in the background: JPEG decode and the model/step compiles
    # are the two cold-start costs — overlap them. This mirrors the
    # flagship loop's cold-start machinery (train/loop.py _decode /
    # _warm / _warm_multi) in simplified form — the flagship adds planar
    # arenas, Pallas preprocess, mesh shardings, and early HBM commit
    # that do not apply here. A fix to the relay compile-order or warm
    # semantics likely needs to land in BOTH places.
    stores: dict[str, HostImageStore] = {}
    decode_error: list[BaseException] = []

    def _decode():
        try:
            stores["train"] = HostImageStore(train_table, cfg.canonical_size)
            stores["test"] = HostImageStore(test_table, cfg.canonical_size)
        except BaseException as e:  # surfaced after join — a daemon
            # thread's traceback would otherwise be lost and the main
            # thread would die on a bare KeyError
            decode_error.append(e)

    decode_thread = threading.Thread(target=_decode, daemon=True)
    decode_thread.start()

    class_weights = (
        tuple(balanced_class_weights(train_table.labels, cfg.num_classes))
        if cfg.use_class_weights
        else None
    )

    model_cfg = ModelConfig(
        name=cfg.model_name, num_classes=cfg.num_classes,
        image_size=cfg.image_size, compute_dtype=cfg.compute_dtype,
        freeze_backbone=cfg.freeze_backbone,
        in_channels=2 if cfg.input_mode == "ita" else 3,
    )
    optim_cfg = OptimConfig(
        optimizer=cfg.optimizer, learning_rate=cfg.learning_rate,
        weight_decay=cfg.weight_decay,
    )
    state, model = create_train_state(
        model_cfg, optim_cfg, jax.random.key(cfg.seed),
        batch_size=cfg.batch_size,
    )

    ita_mode = cfg.input_mode == "ita"
    # ITA needs raw sRGB in [0,1]; its own channels replace the ImageNet
    # normalization
    norm = cfg.normalize_imagenet and not ita_mode
    affine = cfg.input_affine if not ita_mode else None
    train_pre = make_preprocess_fn(
        cfg.image_size, train=True,
        augment=AugmentConfig(random_crop=True, horizontal_flip=True)
        if cfg.augment else None,
        normalize_imagenet=norm, input_affine=affine,
    )
    eval_pre = make_preprocess_fn(
        cfg.image_size, train=False, normalize_imagenet=norm,
        input_affine=affine,
    )
    if ita_mode:
        from skin_image_analysis_tpu.data.ita import ita_input

        def _ita_wrap(pre):
            def fn(pixels, key=None):
                return ita_input(pre(pixels, key))

            return fn

        train_pre, eval_pre = _ita_wrap(train_pre), _ita_wrap(eval_pre)
    train_step = make_train_step(
        class_weights=class_weights, preprocess_fn=train_pre
    )
    if cfg.five_crop_eval:
        from skin_image_analysis_tpu.data.ita import ita_input as _ita_in
        from skin_image_analysis_tpu.train.step import make_five_crop_eval_step

        eval_step = make_five_crop_eval_step(
            cfg.image_size, normalize_imagenet=norm,
            channels_fn=_ita_in if ita_mode else None,
            input_affine=affine,
        )
    else:
        eval_step = make_eval_step(preprocess_fn=eval_pre)

    # Multi-step dispatch (the flagship loop's scan-of-k machinery,
    # train.step.make_multi_*): k train steps / k eval batches per XLA
    # program over the device arenas — only [k, B] index arrays cross
    # the host link, and the ~2 ms/program relay dispatch amortizes.
    # Five-crop eval keeps the per-batch path (its step consumes
    # canonical pixels with a different signature).
    k_spd = max(1, cfg.steps_per_dispatch)
    multi_train = multi_eval = None
    if k_spd > 1:
        from skin_image_analysis_tpu.train.step import (
            make_multi_eval_step,
            make_multi_train_step,
        )

        multi_train = make_multi_train_step(
            k_spd, class_weights=class_weights, preprocess_fn=train_pre
        )
        if not cfg.five_crop_eval:
            multi_eval = make_multi_eval_step(
                k_spd, preprocess_fn=eval_pre
            )

    # Warm the 1-step program on a dummy batch WHILE the decode thread
    # works: same shapes/dtypes as the real batches, so the epoch loop
    # hits the compile cache. Also the compile-order trick — a 1-step
    # compile immediately before the scan-of-k compile makes the scan
    # ~30-50x faster through the remote-compile relay (docs/PERF.md
    # §Cold start).
    dummy = {
        "pixels": jnp.zeros(
            (cfg.batch_size, cfg.canonical_size, cfg.canonical_size,
             3), jnp.uint8),
        "label": jnp.zeros((cfg.batch_size,), jnp.int32),
        "row_id": jnp.zeros((cfg.batch_size,), jnp.int32),
        "valid": jnp.zeros((cfg.batch_size,), bool),
    }
    try:
        ws, _ = train_step(copy_state(state), dummy)
        jax.device_get(ws.step)
        del ws
    except Exception:
        pass  # first real batch will compile instead

    decode_thread.join()
    if decode_error:
        raise decode_error[0]
    train_store, test_store = stores["train"], stores["test"]
    train_arena = train_store.to_device()
    test_arena = test_store.to_device()

    if k_spd > 1:
        # The scanned warms run inert (all-False valid) super-steps on
        # the REAL arenas — side-effect-free (no optimizer update, no
        # BN motion), and no arena-sized zeros duplicate in HBM.
        zi = jnp.zeros((k_spd, cfg.batch_size), jnp.int32)
        zv = jnp.zeros((k_spd, cfg.batch_size), bool)
        ws, wm = multi_train(copy_state(state), train_arena, zi, zi.copy(), zv)
        jax.device_get(wm["loss"])
        del ws
        if multi_eval is not None:
            wo = multi_eval(state.params, state.apply_fn, test_arena,
                            zi, zi.copy(), zv, state.batch_stats)
            jax.device_get(wo["pred"])

    order_fn = (
        (lambda rng: _oversampled_order(train_table.labels, rng))
        if cfg.oversample
        else None
    )
    train_loader = BatchIterator(
        train_store, cfg.batch_size, shuffle=True, drop_remainder=True,
        seed=cfg.seed + 1, order_fn=order_fn, device_arena=train_arena,
    )
    test_loader = BatchIterator(
        test_store, cfg.batch_size, shuffle=False, drop_remainder=False,
        device_arena=test_arena,
    )

    history = []
    best_value = None
    best_snapshot = None   # (params, batch_stats) host copies
    epochs_since_best = 0
    with MetricsLogger(cfg.out_dir, run_name=f"classify_{cfg.model_name}") as logger:
        step_idx = 0
        for epoch in range(cfg.epochs):
            if multi_train is not None:
                metric_handles = []
                for ib, lb, vd in train_loader.super_batches(k_spd):
                    state, metrics = multi_train(
                        state, train_arena, ib, lb, vd
                    )
                    metric_handles.append(metrics)
                fetched = jax.device_get(metric_handles)
                if fetched:
                    losses_arr = np.concatenate(
                        [m["loss"] for m in fetched]
                    )
                    live = np.concatenate(
                        [m["count"] for m in fetched]
                    ) > 0  # padded tail super-steps are inert
                    losses = [float(v) for v in losses_arr[live]]
                else:
                    # train split smaller than one batch (drop_remainder)
                    losses = []
                step_idx += len(losses)
            else:
                losses = []
                for batch in train_loader:
                    state, metrics = train_step(state, batch)
                    losses.append(metrics["loss"])
                    step_idx += 1
                losses = [float(v) for v in jax.device_get(losses)]

            if multi_eval is not None:
                outs, host_labels = [], []
                for ib, lb, rid, vd in test_loader.super_batches(
                    k_spd, with_row_ids=True
                ):
                    outs.append(multi_eval(
                        state.params, state.apply_fn, test_arena,
                        ib, rid, vd, state.batch_stats,
                    ))
                    host_labels.append(lb)
                outs = jax.device_get(outs)
                valid = np.concatenate(
                    [np.asarray(o["valid"]).reshape(-1) for o in outs]
                )
                preds = np.concatenate(
                    [np.asarray(o["pred"]).reshape(-1) for o in outs]
                )[valid]
                labels = np.concatenate(
                    [lab.reshape(-1) for lab in host_labels]
                )[valid]
                log_probs = np.concatenate(
                    [np.asarray(o["log_probs"]).reshape(
                        -1, cfg.num_classes) for o in outs]
                )[valid]
            else:
                outs, host_labels = [], []
                for batch in test_loader:
                    outs.append(
                        eval_step(state.params, state.apply_fn, batch,
                                  state.batch_stats)
                    )
                    host_labels.append(np.asarray(batch["label"]))
                outs = jax.device_get(outs)
                preds = np.concatenate(
                    [o["pred"][o["valid"]] for o in outs]
                )
                labels = np.concatenate(
                    [lab[o["valid"]] for o, lab in zip(outs, host_labels)]
                )
                log_probs = np.concatenate(
                    [np.asarray(o["log_probs"])[o["valid"]] for o in outs]
                )
            m = multiclass_metrics(preds, labels, cfg.num_classes)
            if cfg.num_classes == 2 and labels.size:
                # the BASELINE north-star metric: binary AUC over the
                # positive-class score (exp of the log-softmax head)
                from skin_image_analysis_tpu.metrics.auc import roc_auc

                m["auc"] = roc_auc(labels, np.exp(log_probs[:, 1]))
            m["epoch"] = epoch
            m["train_loss_mean"] = float(np.mean(losses)) if losses else 0.0
            for i, loss in enumerate(losses):
                logger.log({"train_loss": loss}, step=step_idx - len(losses) + i)
            logger.log(m, step=step_idx)
            history.append(m)
            if verbose:
                print(f"epoch {epoch}: {m}")

            # best-metric bookkeeping (mirrors train.loop's semantics;
            # here every epoch evaluates, so every epoch is a metric
            # epoch)
            if (cfg.checkpoint_best or cfg.early_stop_patience) and (
                cfg.best_metric != "auc" or "auc" in m
            ):  # auc is absent on an empty test split — skip the epoch
                lower = cfg.best_metric in ("loss", "train_loss_mean")
                key = "train_loss_mean" if lower else cfg.best_metric
                val = float(m[key])
                if best_value is None or (
                    val < best_value if lower else val > best_value
                ):
                    best_value = val
                    epochs_since_best = 0
                    if cfg.checkpoint_best:
                        best_snapshot = jax.device_get(
                            (state.params, state.batch_stats))
                else:
                    epochs_since_best += 1
                if (cfg.early_stop_patience
                        and epochs_since_best
                        >= cfg.early_stop_patience):
                    if verbose:
                        print(f"early stop: {cfg.best_metric} has not "
                              f"improved for {epochs_since_best} epochs "
                              f"(best {best_value:.4f})")
                    break

    # Persist the trained model in the flagship artifact format (the TF
    # notebook saves skin_cancer_xception_model.keras, jgi_ham_2018_tf
    # cell 75; without this the transfer weights evaporate at exit).
    # Same file layout as a tone_bias_train experiment folder, so
    # tone_bias_export.py / tone_bias_serve.py consume out_dir directly.
    import json
    import os

    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    model_path = os.path.join(cfg.out_dir, ckpt_lib.MODEL_FILENAME)
    ckpt_lib.save_model(model_path, model_cfg, state.params,
                        state.batch_stats)
    if best_snapshot is not None:
        ckpt_lib.save_model(
            os.path.join(cfg.out_dir, ckpt_lib.BEST_MODEL_FILENAME),
            model_cfg, best_snapshot[0], best_snapshot[1])
    # the frozen splits, flagship-layout: serve.quantize.calibration_rows
    # and tone_bias_test read them
    from skin_image_analysis_tpu.train.loop import (
        TEST_SET_FILENAME,
        TRAIN_SET_FILENAME,
    )

    train_table.metadata_df.to_csv(
        os.path.join(cfg.out_dir, TRAIN_SET_FILENAME))
    test_table.metadata_df.to_csv(
        os.path.join(cfg.out_dir, TEST_SET_FILENAME))
    with open(os.path.join(cfg.out_dir, "train_config.json"), "w") as f:
        data_cfg = {"normalize_imagenet": norm}
        if affine is not None:
            data_cfg["input_affine"] = [list(v) for v in
                                        normalize_affine(affine)]
        json.dump({"data": data_cfg,
                   "class_names": list(train_table.class_names),
                   "classify": cfg.__dict__}, f, indent=2, default=str)

    return {
        "state": state,
        "history": history,
        "test_metrics": history[-1] if history else {},
        "out_dir": cfg.out_dir,
        "model_path": model_path,
    }
