"""Typed configuration dataclasses backing every CLI.

The reference drives everything through positional ``sys.argv`` plus inline
magic numbers (batch 16, workers 10, lr 1e-5, split 0.7 — see
tone_bias_train.py:176-182,:334-340,:376 and tone_bias_optuna.py:26-39).
Here every knob lives in one frozen dataclass per subsystem; the CLIs keep
the reference's positional surface and translate into these configs.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Any, Mapping


@dataclasses.dataclass(frozen=True)
class DataConfig:
    """Dataset ingest + input-pipeline configuration."""

    root_dir: str = "./tone"
    image_size: int = 224          # final model input H=W
    canonical_size: int = 256      # host-side decode target (uint8 HWC)
    batch_size: int = 16           # reference default (tone_bias_train.py:336)
    split_ratio: float = 0.7       # train fraction (tone_bias_train.py:271)
    balance: bool = True           # diagnosis-then-tone undersampling
    decode_workers: int = 8        # host decode threads (native loader)
    prefetch_depth: int = 2        # device-side double buffering
    augment: bool = False          # flip/crop/color-jitter (train only)
    normalize_imagenet: bool = False  # ImageNet mean/std (ToneClassifier recipe)
    input_affine: tuple | None = None  # generic per-channel (scale, offset)
                                   # applied to the [0,1] floats — the
                                   # model's input convention when it is
                                   # neither [0,1] nor ImageNet-normalized
                                   # (e.g. imported EfficientNetV2-S/M/L
                                   # .keras artifacts embed Rescaling(
                                   # 1/128, -1)); exclusive with
                                   # normalize_imagenet. See
                                   # ops.preprocess.normalize_affine.
    seed: int = 0
    cache_decoded: bool = True     # keep canonical uint8 images in RAM
    device_cache: bool = True      # commit the uint8 arena to HBM once and
                                   # gather batches on-device (bounded by
                                   # device_cache_max_bytes)
    device_cache_max_bytes: int = 8 << 30
    early_commit_min_bytes: int = 1 << 30
    # single-device runs ship each split's arena to HBM from the decode
    # thread (overlapping the slow host link with decode + compiles) —
    # but the materialization fence costs one extra XLA program compile
    # per arena shape (~30-90 s through the remote-compile relay), so it
    # only pays when the transfer itself is relay-window-sized. Arenas
    # below this threshold keep the lazy post-join commit.
    streaming: bool = False        # archive-scale path: chunked decode-
                                   # ahead instead of whole-cohort arenas
    chunk_size: int = 2048         # images per streaming chunk
    stream_cache: bool = False     # spill canonical uint8 frames to a
                                   # disk memmap during epoch 1; later
                                   # epochs stream at disk speed (the
                                   # 1-core JPEG decode is the wall)
    drop_remainder: bool = True    # static shapes for jit
    pallas_preprocess: str = "auto"  # "auto"|"on"|"off": planar arenas +
                                   # the Pallas fused preprocess kernel in
                                   # the train step (auto = on for TPU
                                   # backends when augmenting)
    steps_per_dispatch: int = 8    # scan this many train steps per XLA
                                   # dispatch when the device arena is
                                   # resident (amortizes ~2 ms/dispatch
                                   # relay latency); 1 = per-batch steps

    @property
    def num_classes(self) -> int:
        return 2


@dataclasses.dataclass(frozen=True)
class ModelConfig:
    """SkinCancerListModel-family architecture description.

    Mirrors the reference production model (tone_bias_model.py:56-152):
    conv stack [32, 64, 128] (first kernel 7, rest 3, each + ReLU +
    2x2 max-pool), MLP [512, 256] with dropout 0.5, 2-way log-softmax head,
    Xavier-normal init. ``conv_features``/``linear_features`` are free so
    the HPO search space (tone_bias_optuna.py:123-173) reuses this config.
    """

    name: str = "skin_cancer_list"
    conv_features: tuple[int, ...] = (32, 64, 128)
    first_kernel: int = 7
    kernel: int = 3
    linear_features: tuple[int, ...] = (512, 256)
    dropout: tuple[float, ...] = (0.5, 0.5)
    num_classes: int = 2
    image_size: int = 224
    compute_dtype: str = "bfloat16"   # MXU-friendly; "float32" for parity runs
    param_dtype: str = "float32"
    remat: bool = False               # jax.checkpoint conv/mlp blocks:
                                      # trade recompute for activation HBM
    fused_pool: bool = True           # False -> stock relu + max_pool
                                      # (SelectAndScatter backward)
    pool_mode: str = "auto"           # auto|phase|selector|stock: conv+
                                      # relu+pool lowering (see ConvBlock;
                                      # all bit-equal forward)
    stem: str = "auto"                # auto|phase|s2d: block-0 lowering.
                                      # "s2d" = space-to-depth stem (2x2
                                      # s2d input layout + 5x5 conv at 4x
                                      # the input channels); "auto" =
                                      # measured-best (docs/PERF.md)
    in_channels: int = 3              # model-input channels (Flax convs
                                      # infer the rest; this only shapes
                                      # the init dummy). 2 for the
                                      # ITA-matrix input mode
                                      # (data.ita.ita_input).
    freeze_backbone: bool = False     # frozen-feature transfer (the
                                      # reference's ResNet-18 recipe,
                                      # jgi_ham_2018_torch.ipynb cells
                                      # 30-32): stop_gradient on the
                                      # pooled features so XLA prunes the
                                      # whole backbone backward, plus a
                                      # masked optimizer (head-only
                                      # updates, no backbone moments).
                                      # BatchNorm running stats still
                                      # update in train mode (torch
                                      # requires_grad=False semantics).
                                      # resnet*/xception* families only.

    def __post_init__(self) -> None:
        if len(self.dropout) not in (1, len(self.linear_features)):
            raise ValueError(
                "dropout must have one rate or one per linear layer: "
                f"{self.dropout} vs {self.linear_features}"
            )


@dataclasses.dataclass(frozen=True)
class OptimConfig:
    optimizer: str = "adam"        # adam | rmsprop | sgd | adamw
    learning_rate: float = 1e-5    # reference production LR (train.py:376)
    weight_decay: float = 0.0
    momentum: float = 0.0
    moment_dtype: str | None = None  # "bfloat16" stores adam's FIRST
                                     # moment (mu) bf16 — optax semantics,
                                     # safe for long runs
    nu_dtype: str | None = None      # "bfloat16" ALSO stores the second
                                     # moment bf16 with -lr folded into the
                                     # update (the bench operating point).
                                     # Caveat: once nu grows, (1-b2)*g^2
                                     # increments below bf16 ulp (~0.4%
                                     # relative) round away — on very long
                                     # runs the effective step can drift.
                                     # Default f32 keeps optax semantics.
    class_weights: tuple[float, ...] | None = None  # weighted NLL for imbalanced runs
    auto_class_weights: bool = False  # derive balanced weights from the
                                      # train split (imbalanced config)
    # LR schedule (the reference defines-but-comments-out StepLR,
    # tone_bias_train.py:377,:394-395). All sizes are optimizer steps.
    lr_schedule: str = ""          # "" | "step" | "exponential" | "cosine"
    lr_step_size: int = 0          # steps between decays (step/exponential)
    lr_gamma: float = 0.1          # decay factor (StepLR gamma)
    lr_decay_steps: int = 0        # cosine horizon
    lr_warmup_steps: int = 0       # linear warmup prefix


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Device-mesh description. data axis = DP, model axis = TP."""

    data_axis: str = "data"
    model_axis: str = "model"
    data_parallel: int = -1        # -1: all devices on the data axis
    model_parallel: int = 1


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    epochs: int = 20
    eval_every: int = 1            # reference: full fairness eval every epoch
    checkpoint_every: int = 0      # orbax full-state snapshot every N epochs
                                   # (0 = final only); crash-resume fidelity
    results_dir: str = "results"
    experiment_dir: str | None = None  # resume path; None → new run
    init_from: str | None = None       # fine-tune: warm-start weights from
                                       # another experiment's session_model
    log_every_batches: int = 8     # reference prints every 8 batches
    checkpoint_best: bool = False  # reference saves last weights only
    best_metric: str = "loss"      # what "best" means for the best
                                   # checkpoint / early stopping:
                                   # 'loss' = train avg batch loss
                                   # (lower better, every epoch); any
                                   # eval-record key ('accuracy',
                                   # 'auc', ...) is higher-better and
                                   # updates on eval epochs only
    early_stop_patience: int = 0   # stop after N metric epochs without
                                   # improvement (0 = off) — the legacy
                                   # notebook's best-val pattern,
                                   # tone_bias_torch.py:943-1014
    seed: int = 0
    data: DataConfig = dataclasses.field(default_factory=DataConfig)
    model: ModelConfig = dataclasses.field(default_factory=ModelConfig)
    optim: OptimConfig = dataclasses.field(default_factory=OptimConfig)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)


@dataclasses.dataclass(frozen=True)
class HpoConfig:
    """HPO sweep configuration (reference constants tone_bias_optuna.py:26-39)."""

    trials: int = 100
    time_limit_hours: float = 16.0
    sample_size: int = 300
    batch_size: int = 32
    epochs: int = 10
    n_train_examples: int = 32 * 12
    n_valid_examples: int = 32 * 4
    population: int = 8            # vmap-stacked same-shape trials per wave
    seed: int = 0


def to_dict(cfg: Any) -> dict:
    return dataclasses.asdict(cfg)


def to_json(cfg: Any) -> str:
    return json.dumps(to_dict(cfg), indent=2, sort_keys=True)


def replace(cfg: Any, **kw: Any) -> Any:
    return dataclasses.replace(cfg, **kw)


def _deep_tuple(value: list) -> tuple:
    """JSON arrays → hashable nested tuples (frozen configs feed jit
    static arguments, e.g. DataConfig.input_affine)."""
    return tuple(
        _deep_tuple(v) if isinstance(v, list) else v for v in value
    )


def _build(cls: type, payload: Mapping[str, Any]) -> Any:
    """Recursively build a (possibly nested) config dataclass from a mapping."""
    kwargs: dict[str, Any] = {}
    for field in dataclasses.fields(cls):
        if field.name not in payload:
            continue
        value = payload[field.name]
        if dataclasses.is_dataclass(field.type) and isinstance(value, Mapping):
            value = _build(field.type, value)
        elif isinstance(value, list):
            value = _deep_tuple(value)
        kwargs[field.name] = value
    return cls(**kwargs)


def train_config_from_dict(payload: Mapping[str, Any]) -> TrainConfig:
    payload = dict(payload)
    for key, sub in (("data", DataConfig), ("model", ModelConfig),
                     ("optim", OptimConfig), ("mesh", MeshConfig)):
        if key in payload and isinstance(payload[key], Mapping):
            payload[key] = _build(sub, payload[key])
    return _build(TrainConfig, payload)
