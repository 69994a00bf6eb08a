"""EfficientNet family (Flax), weight-compatible with
``keras.applications.EfficientNetB0-B7``.

BASELINE.json's north star names the backbone class explicitly
("tone_bias_model's CNN backbone (ResNet/EfficientNet-class,
benign/malignant head) is reimplemented in JAX/Flax"); the reference
itself ships ResNet/Xception transfers (CNNTrial.py:80,
jgi_ham_2018_tf.ipynb cell 70) and this module completes the named
family the same way: a from-scratch Flax EfficientNet with the exact
Keras architecture — MBConv (expand 1x1 → depthwise k×k → squeeze-excite
→ project 1x1), swish activations, BatchNorm(eps=1e-3), Keras'
asymmetric ``correct_pad`` zero-padding before every stride-2 conv (SAME
would shift every transferred activation on even inputs), stochastic
depth on the residual adds — so ImageNet ``.h5`` checkpoints convert
losslessly (``load_keras_efficientnet_weights``; numerically pinned
against a LIVE Keras oracle in tests/test_efficientnet.py, the same
harness that pins the Xception converter). NHWC, bf16 compute; depthwise
convs via ``feature_group_count`` (XLA maps them onto the TPU
efficiently). Head: GAP → Dropout → Dense → log-softmax (the transfer
recipe replaces the ImageNet top, so only the backbone converts).

Layer names mirror Keras' (``stem_conv``, ``block2a_dwconv``,
``top_bn``, …) so the converter is a direct name map.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model

_BN_EPS = 1e-3  # keras BatchNormalization default (parity-critical)

# (expand_ratio, filters_out, repeats, stride, kernel) — the B0 stage
# table; B1-B7 scale it via round_filters/round_repeats exactly as Keras
_B0_STAGES = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# (width_coefficient, depth_coefficient, top_dropout) per variant —
# the published compound-scaling table, identical to keras.applications
_VARIANTS = {
    "b0": (1.0, 1.0, 0.2),
    "b1": (1.0, 1.1, 0.2),
    "b2": (1.1, 1.2, 0.3),
    "b3": (1.2, 1.4, 0.3),
    "b4": (1.4, 1.8, 0.4),
    "b5": (1.6, 2.2, 0.4),
    "b6": (1.8, 2.6, 0.5),
    "b7": (2.0, 3.1, 0.5),
}


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def round_filters(filters: float, width_coefficient: float,
                  divisor: int = 8) -> int:
    """Keras' width scaling: round to the nearest multiple of
    ``divisor``, never dropping below 90% of the target."""
    filters *= width_coefficient
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def _correct_pad(x, kernel: int):
    """Keras ``imagenet_utils.correct_pad``: the asymmetric zero-padding
    applied before a stride-2 VALID conv so even inputs downsample
    without the half-pixel shift SAME padding introduces."""
    h, w = int(x.shape[1]), int(x.shape[2])
    adj_h, adj_w = 1 - h % 2, 1 - w % 2
    c = kernel // 2
    return ((c - adj_h, c), (c - adj_w, c))


class MBConv(nn.Module):
    """One Keras EfficientNet block: expand → depthwise → SE → project,
    with stochastic depth on the identity add. ``name_prefix`` carries
    the Keras block name (e.g. ``block2a``) so parameters land exactly
    where the weight converter expects them."""

    filters_in: int
    filters_out: int
    kernel: int = 3
    strides: int = 1
    expand_ratio: int = 1
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    name_prefix: str = "block1a"
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, *, train: bool):
        dtype = _dtype(self.compute_dtype)
        p = self.name_prefix
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)

        filters = self.filters_in * self.expand_ratio
        y = x
        if self.expand_ratio != 1:
            y = nn.Conv(filters, (1, 1), use_bias=False, dtype=dtype,
                        name=f"{p}_expand_conv")(y)
            y = bn(name=f"{p}_expand_bn")(y)
            y = jax.nn.silu(y)

        # depthwise — stride 2 uses Keras' correct_pad + VALID
        if self.strides == 2:
            pad = _correct_pad(y, self.kernel)
        else:
            pad = "SAME"
        y = nn.Conv(filters, (self.kernel, self.kernel),
                    (self.strides, self.strides), padding=pad,
                    feature_group_count=filters, use_bias=False,
                    dtype=dtype, name=f"{p}_dwconv")(y)
        y = bn(name=f"{p}_bn")(y)
        y = jax.nn.silu(y)

        # squeeze-and-excite: reduce filters from the block INPUT width
        if 0 < self.se_ratio <= 1:
            se_filters = max(1, int(self.filters_in * self.se_ratio))
            se = jnp.mean(y, axis=(1, 2), keepdims=True)
            se = nn.Conv(se_filters, (1, 1), dtype=dtype,
                         name=f"{p}_se_reduce")(se)
            se = jax.nn.silu(se)
            se = nn.Conv(filters, (1, 1), dtype=dtype,
                         name=f"{p}_se_expand")(se)
            y = y * jax.nn.sigmoid(se)

        y = nn.Conv(self.filters_out, (1, 1), use_bias=False, dtype=dtype,
                    name=f"{p}_project_conv")(y)
        y = bn(name=f"{p}_project_bn")(y)

        if self.strides == 1 and self.filters_in == self.filters_out:
            if self.drop_rate > 0:
                # stochastic depth: per-sample whole-block drop (Keras
                # Dropout with noise_shape=(None, 1, 1, 1))
                y = nn.Dropout(self.drop_rate, broadcast_dims=(1, 2, 3),
                               deterministic=not train,
                               name=f"{p}_drop")(y)
            y = y + x
        return y


class EfficientNet(nn.Module):
    """keras.applications.EfficientNetB* backbone + the transfer head.

    Keras' preprocessing layers (Rescaling/Normalization) are NOT part
    of the model — this framework preprocesses in the input pipeline
    (ops/preprocess.py) — so the forward expects normalized floats like
    every other model family here."""

    num_classes: int = 2
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
    top_dropout: float = 0.2
    drop_connect_rate: float = 0.2
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    # Frozen-feature transfer (see models/resnet.py): stop_gradient on
    # the pooled features prunes the backbone backward at compile time;
    # BN running stats still update in train mode.
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)
        x = x.astype(dtype)

        # stem: correct_pad + VALID 3x3/s2
        x = nn.Conv(round_filters(32, self.width_coefficient), (3, 3),
                    (2, 2), padding=_correct_pad(x, 3), use_bias=False,
                    dtype=dtype, name="stem_conv")(x)
        x = bn(name="stem_bn")(x)
        x = jax.nn.silu(x)

        blocks_total = sum(
            round_repeats(r, self.depth_coefficient)
            for _, _, r, _, _ in _B0_STAGES
        )
        b = 0
        filters_in = round_filters(32, self.width_coefficient)
        for stage_i, (expand, f_out, repeats, stride, kernel) in enumerate(
            _B0_STAGES
        ):
            f_out = round_filters(f_out, self.width_coefficient)
            for rep in range(round_repeats(repeats, self.depth_coefficient)):
                x = MBConv(
                    filters_in=filters_in,
                    filters_out=f_out,
                    kernel=kernel,
                    strides=stride if rep == 0 else 1,
                    expand_ratio=expand,
                    drop_rate=self.drop_connect_rate * b / blocks_total,
                    name_prefix=f"block{stage_i + 1}{chr(ord('a') + rep)}",
                    compute_dtype=self.compute_dtype,
                    name=f"block{stage_i + 1}{chr(ord('a') + rep)}",
                )(x, train=train)
                filters_in = f_out
                b += 1

        x = nn.Conv(round_filters(1280, self.width_coefficient), (1, 1),
                    use_bias=False, dtype=dtype, name="top_conv")(x)
        x = bn(name="top_bn")(x)
        x = jax.nn.silu(x)

        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _make(variant: str, cfg: ModelConfig) -> EfficientNet:
    w, d, top_drop = _VARIANTS[variant]
    return EfficientNet(
        num_classes=cfg.num_classes,
        width_coefficient=w, depth_coefficient=d, top_dropout=top_drop,
        compute_dtype=cfg.compute_dtype,
        freeze_backbone=cfg.freeze_backbone,
    )


@register_model("efficientnet_b0")
def _build_b0(cfg: ModelConfig):
    return _make("b0", cfg)


@register_model("efficientnet_b1")
def _build_b1(cfg: ModelConfig):
    return _make("b1", cfg)


@register_model("efficientnet_b2")
def _build_b2(cfg: ModelConfig):
    return _make("b2", cfg)


@register_model("efficientnet_b3")
def _build_b3(cfg: ModelConfig):
    return _make("b3", cfg)


@register_model("efficientnet_b4")
def _build_b4(cfg: ModelConfig):
    return _make("b4", cfg)


@register_model("efficientnet_b5")
def _build_b5(cfg: ModelConfig):
    return _make("b5", cfg)


@register_model("efficientnet_b6")
def _build_b6(cfg: ModelConfig):
    return _make("b6", cfg)


@register_model("efficientnet_b7")
def _build_b7(cfg: ModelConfig):
    return _make("b7", cfg)


def block_counts(variant: str) -> tuple[int, ...]:
    """Depth-scaled blocks per stage — the structural fingerprint the
    .keras importer uses to recover the variant from an artifact (b1
    and b2 share counts and are disambiguated by weight shapes)."""
    _, d, _ = _VARIANTS[variant]
    return tuple(round_repeats(r, d) for _, _, r, _, _ in _B0_STAGES)


def apply_keras_efficientnet_weights(layer_names, weights_of,
                                     variables) -> Any:
    """Keras→Flax EfficientNet v1 mapping (source-agnostic — callers
    feed it either a legacy-.h5 table or a live Keras model,
    models/keras_io.py). Unlike the name-identity families, v1's Flax
    params nest under the MBConv submodule that shares the layer's
    block prefix ("block2a"/"block2a_dwconv"/…), stem/top at the root.
    The ImageNet head ('predictions') and preprocessing layers are
    skipped; depthwise kernels [k, k, C, 1] transpose to Flax's
    grouped-conv [k, k, 1, C]."""
    import numpy as np

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = dict(flat)

    def _target(layer: str, leaf: str):
        if layer.startswith("block"):
            block = layer.split("_")[0]
            return ("params", block, layer, leaf)
        return ("params", layer, leaf)

    def _target_bn(layer: str, col: str, leaf: str):
        if col == "params":
            return _target(layer, leaf)
        if layer.startswith("block"):
            block = layer.split("_")[0]
            return ("batch_stats", block, layer, leaf)
        return ("batch_stats", layer, leaf)

    def put(key, value):
        if key not in flat:
            raise KeyError(f"converter target {key} not in model")
        expect = flat[key].shape
        if tuple(value.shape) != tuple(expect):
            raise ValueError(f"{key}: {value.shape} vs {expect}")
        out[key] = jnp.asarray(np.asarray(value))

    for layer in layer_names:
        if (layer in ("rescaling", "normalization", "predictions",
                      "avg_pool", "top_dropout")
                or layer.startswith(("rescaling_", "normalization_"))):
            continue
        w = weights_of(layer)
        if not w:
            continue
        if "gamma" in w:  # BatchNorm
            put(_target_bn(layer, "params", "scale"), w["gamma"])
            put(_target_bn(layer, "params", "bias"), w["beta"])
            put(_target_bn(layer, "stats", "mean"), w["moving_mean"])
            put(_target_bn(layer, "stats", "var"),
                w["moving_variance"])
        elif "depthwise_kernel" in w:
            put(_target(layer, "kernel"),
                np.transpose(w["depthwise_kernel"], (0, 1, 3, 2)))
        elif "kernel" in w:
            put(_target(layer, "kernel"), w["kernel"])
            if "bias" in w:
                put(_target(layer, "bias"), w["bias"])
        else:
            raise ValueError(
                f"{layer}: unrecognized weight set {sorted(w)}"
            )

    return flax.traverse_util.unflatten_dict(out)


def load_keras_efficientnet_weights(path: str, variables: Any) -> Any:
    """Map a Keras EfficientNet weights ``.h5`` (the legacy
    ``layer_names``/``weight_names`` format the downloadable
    ``efficientnetb*_notop.h5`` files use) onto this model's variables.
    Reads with h5py only — no TF/Keras needed at load time
    (``apply_keras_efficientnet_weights`` documents the mapping)."""
    from skin_image_analysis_tpu.models.keras_io import read_legacy_h5

    layer_names, table = read_legacy_h5(path)
    return apply_keras_efficientnet_weights(
        layer_names, table.__getitem__, variables
    )
