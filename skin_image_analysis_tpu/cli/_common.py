"""Shared positional+flag parsing for the CLIs.

The reference CLIs are purely positional (sys.argv slicing); ours accept
the same positionals plus optional ``--flag value`` / ``--flag=value``
extras. ``parse`` consumes flag values so they never leak into the
positional list.
"""

from __future__ import annotations

from typing import Any


def parse(
    argv: list[str], value_flags: dict[str, Any], bool_flags: set[str] = frozenset()
) -> tuple[list[str], dict[str, Any]]:
    """Returns (positionals, options). ``value_flags`` maps flag name →
    default (type inferred from the default); ``bool_flags`` are presence
    flags. Unknown flags exit with an error."""
    positional: list[str] = []
    opts: dict[str, Any] = dict(value_flags)
    flags_seen: set[str] = set()
    i = 0
    while i < len(argv):
        arg = argv[i]
        if arg.startswith("--"):
            name, _, value = arg[2:].partition("=")
            if name in bool_flags:
                flags_seen.add(name)
            elif name in value_flags:
                if not value:
                    i += 1
                    if i >= len(argv):
                        raise SystemExit(f"--{name} requires a value")
                    value = argv[i]
                default = value_flags[name]
                cast = type(default) if default is not None else str
                opts[name] = cast(value)
            else:
                raise SystemExit(f"unknown flag --{name}")
        else:
            positional.append(arg)
        i += 1
    for name in bool_flags:
        opts[name] = name in flags_seen
    return positional, opts


def init_runtime() -> None:
    """Multi-host initialization — call once at the top of a trainer
    CLI, BEFORE anything queries devices. No-op on a single host;
    initializes ``jax.distributed`` from the TPU-pod environment or the
    explicit SIA_COORDINATOR/SIA_NUM_PROCESSES/SIA_PROCESS_ID triple
    (parallel/distributed.py), after which ``jax.devices()`` spans the
    cluster and the mesh/sharding code scales unchanged."""
    from skin_image_analysis_tpu.parallel.distributed import (
        maybe_initialize,
    )

    maybe_initialize()


def input_convention(folder: str) -> tuple[bool, tuple | None]:
    """The experiment's model-input convention, read from its
    ``train_config.json``: ``(normalize_imagenet, input_affine)``.

    Every eval/inference surface that reconstructs a preprocess for a
    checkpoint folder must honor this — transfer runs train with
    ImageNet normalization (ClassifyConfig default) and imported
    ``.keras`` artifacts may carry a generic affine
    (migrate/keras_model.py); scoring them on plain [0, 1] floats would
    silently shift every prediction. Defaults to ``(False, None)``
    (the flagship convention) when the folder has no config.
    """
    import json
    import os

    from skin_image_analysis_tpu.ops.preprocess import normalize_affine

    cfg_path = os.path.join(folder, "train_config.json")
    if not os.path.exists(cfg_path):
        return False, None
    try:
        with open(cfg_path) as f:
            data_cfg = json.load(f).get("data", {})
    except (OSError, ValueError):
        return False, None
    return (
        bool(data_cfg.get("normalize_imagenet", False)),
        normalize_affine(data_cfg.get("input_affine")),
    )


def model_file(folder: str, best: bool = False) -> str:
    """Path of the model artifact to load from an experiment folder:
    ``session_model.msgpack`` (final weights), or with ``best`` the
    ``--keep-best`` checkpoint ``session_model_best.msgpack`` — refused
    loudly when the run was not trained with --keep-best."""
    import os

    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    name = (ckpt_lib.BEST_MODEL_FILENAME if best
            else ckpt_lib.MODEL_FILENAME)
    path = os.path.join(folder, name)
    if best and not os.path.exists(path):
        raise SystemExit(
            f"{folder} has no session_model_best.msgpack — train with "
            "--keep-best to produce one")
    return path
