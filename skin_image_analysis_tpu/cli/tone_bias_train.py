#!/usr/bin/env python
"""Training CLI — surface parity with the reference driver.

Usage (reference: tone_bias_train.py:176-182, README.md:103-112)::

    python cli/tone_bias_train.py <image root> <epochs> <'balance'|'imbalanced'|existing experiment folder>
    python cli/tone_bias_train.py tone 20 balance

Extra (optional) flags after the positional args: ``--seed N``,
``--batch-size N``, ``--lr F``, ``--optimizer adam|adamw|rmsprop|sgd``
(the search space's optimizer choices, tone_bias_optuna.py:239; sgd
also carries no moment state — the fit-on-one-chip choice at extreme
resolutions, docs/PERF.md §Full resolution), ``--augment``,
``--bf16/--fp32``,
``--checkpoint-every N`` (periodic full-state snapshots),
``--auto-resume N`` (elastic supervision: on a crash, locate the
experiment folder and resume the remaining epochs, up to N restarts;
implies ``--checkpoint-every 1`` unless set),
``--keep-best loss|accuracy|auc`` (save session_model_best.msgpack at
each improvement of the metric — the legacy notebook's best-val
pattern, tone_bias_torch.py:943-1014), ``--early-stop N`` (stop after
N metric epochs without improvement).
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from skin_image_analysis_tpu.config import (  # noqa: E402
    DataConfig,
    ModelConfig,
    OptimConfig,
    TrainConfig,
)
from skin_image_analysis_tpu.train.loop import (  # noqa: E402
    run_training,
    run_training_elastic,
)


def _optim_config(lr: float, class_weights: str, opts: dict) -> "OptimConfig":
    """--class-weights '' (off) | 'auto' (balanced from the train split,
    the imbalanced-sampling config) | 'w0,w1' explicit. LR-schedule flags
    map to OptimConfig (StepLR equivalent, tone_bias_train.py:377)."""
    kw = dict(
        learning_rate=lr,
        **({"optimizer": opts["optimizer"]} if opts.get("optimizer")
           else {}),
        lr_schedule=opts["lr-schedule"],
        lr_step_size=opts["lr-step-size"],
        lr_gamma=opts["lr-gamma"],
        lr_decay_steps=opts["lr-decay-steps"],
        lr_warmup_steps=opts["lr-warmup-steps"],
        moment_dtype=opts["moment-dtype"] or None,
        nu_dtype=opts["nu-dtype"] or None,
    )
    if class_weights == "auto":
        return OptimConfig(auto_class_weights=True, **kw)
    if class_weights:
        kw["class_weights"] = tuple(float(w) for w in class_weights.split(","))
    return OptimConfig(**kw)


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import init_runtime, parse

    init_runtime()

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv,
        {"seed": 0, "batch-size": 16, "lr": 1e-5, "init-from": "",
         "model": "skin_cancer_list", "image-size": 224, "profile": "",
         "chunk-size": 2048, "class-weights": "", "lr-schedule": "",
         "lr-step-size": 0, "lr-gamma": 0.1, "lr-decay-steps": 0,
         "lr-warmup-steps": 0, "moment-dtype": "", "nu-dtype": "",
         "optimizer": "",
         "steps-per-dispatch": 8, "auto-resume": 0,
         "checkpoint-every": 0, "from-hpo": "",
         "keep-best": "", "early-stop": 0},
        bool_flags={"augment", "fp32", "bf16", "debug-nans", "streaming",
                    "stream-cache"},
    )
    if len(positional) != 3:
        print("Usage: <root directory of ISIC images> <number of epochs> "
              "<'balance' or 'imbalanced' | path to existing model>")
        print("Example: tone 20 balance")
        return 1
    root, epochs, mode = positional[0], int(positional[1]), positional[2]

    seed = opts["seed"]
    batch_size = opts["batch-size"]
    lr = opts["lr"]
    augment = opts["augment"]
    compute_dtype = "float32" if opts["fp32"] else "bfloat16"

    balance = "imbalanced" not in mode
    experiment_dir = mode if os.path.exists(mode) else (
        mode if mode not in ("balance", "balanced", "imbalanced") else None
    )

    auto_resume = opts["auto-resume"]
    checkpoint_every = opts["checkpoint-every"]
    if auto_resume > 0 and checkpoint_every == 0:
        # elastic recovery is only epoch-granular with snapshots; a
        # run that dies before its first save resumes from fresh init
        checkpoint_every = 1

    # --keep-best [loss|accuracy|auc|<record key>] saves
    # session_model_best.msgpack at each improvement; --early-stop N
    # stops after N metric epochs without one (the metric defaults to
    # 'loss' when only --early-stop is given)
    best_metric = opts["keep-best"] or "loss"
    cfg = TrainConfig(
        epochs=epochs,
        experiment_dir=experiment_dir,
        init_from=opts["init-from"] or None,
        checkpoint_every=checkpoint_every,
        checkpoint_best=bool(opts["keep-best"]),
        best_metric=best_metric,
        early_stop_patience=int(opts["early-stop"]),
        seed=seed,
        data=DataConfig(
            root_dir=root, balance=balance, batch_size=batch_size,
            augment=augment, seed=seed, image_size=opts["image-size"],
            canonical_size=max(256, opts["image-size"]),
            streaming=opts["streaming"], chunk_size=opts["chunk-size"],
            stream_cache=opts["stream-cache"],
            steps_per_dispatch=opts["steps-per-dispatch"],
        ),
        model=ModelConfig(
            name=opts["model"], image_size=opts["image-size"],
            compute_dtype=compute_dtype,
        ),
        optim=_optim_config(lr, opts["class-weights"], opts),
    )
    if opts["from-hpo"]:
        # Train the winning config from a sweep artifact — ours OR the
        # reference's hand-rolled optuna_*.json format (the reference's
        # create_best_model flow, tone_bias_optuna.py:116-121, pointed
        # at a file). Architecture, optimizer kind, and lr come from the
        # artifact; every other flag (schedules, class weights,
        # image size, dtype) still applies.
        import dataclasses

        from skin_image_analysis_tpu.hpo.replay import replay_artifact

        model_cfg, optim_cfg = replay_artifact(
            opts["from-hpo"], image_size=opts["image-size"],
            compute_dtype=compute_dtype,
        )
        cfg = dataclasses.replace(
            cfg,
            model=model_cfg,
            optim=dataclasses.replace(
                cfg.optim,
                optimizer=optim_cfg.optimizer,
                learning_rate=optim_cfg.learning_rate,
            ),
        )
        print(
            f"from-hpo: conv={model_cfg.conv_features} "
            f"linear={model_cfg.linear_features} "
            f"dropout={tuple(round(d, 3) for d in model_cfg.dropout)} "
            f"{optim_cfg.optimizer} lr={optim_cfg.learning_rate:g}"
        )
    if opts["debug-nans"]:
        # bring-up sanitizer (SURVEY §5: no sanitizers in the reference;
        # jax's nan-checker is the TPU-native equivalent)
        import jax

        jax.config.update("jax_debug_nans", True)

    def _run():
        if auto_resume > 0:
            # elastic supervision: crash -> locate folder -> resume the
            # remaining epochs, up to N restarts (--auto-resume N)
            return run_training_elastic(cfg, retries=auto_resume)
        return run_training(cfg)

    if opts["profile"]:
        from skin_image_analysis_tpu.utils.profiling import trace

        with trace(opts["profile"]):
            folder = _run()
    else:
        folder = _run()
    print(f"Experiment folder: {folder}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
