"""EfficientNetV2 family (Flax), weight-compatible with
``keras.applications.EfficientNetV2B0-B3/S/M/L``.

The reference's TF transfer recipe lists EfficientNetV2B3 as a
commented backbone alternative (jgi_ham_2018_tf.ipynb cell 70,
``keras.applications.efficientnet_v2.EfficientNetV2B3``); this module
completes that family the same way the v1 EfficientNets were built: a
from-scratch Flax implementation with the exact Keras architecture so
ImageNet checkpoints convert losslessly.

V2 architecture facts (all parity-critical, pinned against a LIVE
Keras oracle in tests/test_efficientnet_v2.py):

- Early stages use **Fused-MBConv** (the depthwise+1x1 pair fused into
  one full 3x3 conv — much better MXU utilisation at large spatial
  dims, which is exactly why the v2 paper introduced it and why it
  suits TPUs); later stages are MBConv with squeeze-excite.
- A fused block with expand_ratio=1 degenerates to a single k×k conv
  named ``project_conv`` whose activation comes AFTER project_bn; with
  expand_ratio>1 the 1x1 project has NO trailing activation.
- All convs are SAME-padded (v2 dropped v1's ``correct_pad``+VALID
  stride-2 geometry); the depthwise conv is named ``dwconv2`` and its
  BatchNorm just ``bn``.
- ``round_filters`` is v2's own (divisor snap WITHOUT v1's 90% bump);
  ``round_repeats`` = ceil. B0-B3 scale one shared stage table; S/M/L
  have fixed tables (coefficients 1.0) and M/L a 7th stage.
- Stochastic-depth rates replicate Keras' accounting verbatim: the
  denominator is the sum of UNSCALED stage repeats while the counter
  runs over the depth-scaled blocks (so B1-B3 rates exceed
  drop_connect_rate near the tail — a Keras quirk we must share for
  training parity), and a rate-0 first block has no Dropout at all.
- BN eps 1e-3, silu everywhere, SE reduce width from the block's
  (rounded) input filters.

Keras' in-model preprocessing (Rescaling+Normalization for the B
variants — exactly our pipeline's ``normalize_imagenet`` transform —
and Rescaling(1/128,-1) for S/M/L) is NOT part of this module: like
every family here, the forward expects pipeline-preprocessed floats.
The ``.keras`` importer (migrate/keras_model.py) maps the B variants'
embedded normalization onto the pipeline flag exactly.

Head: GAP → dropout → Dense → log-softmax (cell 70's transfer recipe);
``freeze_backbone`` via stop_gradient as in models/resnet.py.
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

# (fused?, expand_ratio, filters_in, filters_out, repeats, stride,
#  se_ratio) per stage — the keras.applications DEFAULT_BLOCKS_ARGS
# tables. filters_in of stage 0 doubles as the stem width.
_STAGES = {
    "b": (
        (True, 1, 32, 16, 1, 1, 0.0),
        (True, 4, 16, 32, 2, 2, 0.0),
        (True, 4, 32, 48, 2, 2, 0.0),
        (False, 4, 48, 96, 3, 2, 0.25),
        (False, 6, 96, 112, 5, 1, 0.25),
        (False, 6, 112, 192, 8, 2, 0.25),
    ),
    "s": (
        (True, 1, 24, 24, 2, 1, 0.0),
        (True, 4, 24, 48, 4, 2, 0.0),
        (True, 4, 48, 64, 4, 2, 0.0),
        (False, 4, 64, 128, 6, 2, 0.25),
        (False, 6, 128, 160, 9, 1, 0.25),
        (False, 6, 160, 256, 15, 2, 0.25),
    ),
    "m": (
        (True, 1, 24, 24, 3, 1, 0.0),
        (True, 4, 24, 48, 5, 2, 0.0),
        (True, 4, 48, 80, 5, 2, 0.0),
        (False, 4, 80, 160, 7, 2, 0.25),
        (False, 6, 160, 176, 14, 1, 0.25),
        (False, 6, 176, 304, 18, 2, 0.25),
        (False, 6, 304, 512, 5, 1, 0.25),
    ),
    "l": (
        (True, 1, 32, 32, 4, 1, 0.0),
        (True, 4, 32, 64, 7, 2, 0.0),
        (True, 4, 64, 96, 7, 2, 0.0),
        (False, 4, 96, 192, 10, 2, 0.25),
        (False, 6, 192, 224, 19, 1, 0.25),
        (False, 6, 224, 384, 25, 2, 0.25),
        (False, 6, 384, 640, 7, 1, 0.25),
    ),
}

# registered name -> (stage table, width_coefficient, depth_coefficient)
_VARIANTS = {
    "efficientnet_v2_b0": ("b", 1.0, 1.0),
    "efficientnet_v2_b1": ("b", 1.0, 1.1),
    "efficientnet_v2_b2": ("b", 1.1, 1.2),
    "efficientnet_v2_b3": ("b", 1.2, 1.4),
    "efficientnet_v2_s": ("s", 1.0, 1.0),
    "efficientnet_v2_m": ("m", 1.0, 1.0),
    "efficientnet_v2_l": ("l", 1.0, 1.0),
}


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


def round_filters_v2(filters: float, width_coefficient: float,
                     divisor: int = 8) -> int:
    """Keras' V2 width scaling: snap to the nearest multiple of
    ``divisor`` with a floor of ``divisor`` — WITHOUT v1's never-below-
    90% bump (v2 dropped it)."""
    filters *= width_coefficient
    return int(max(divisor,
                   int(filters + divisor / 2) // divisor * divisor))


def round_repeats_v2(repeats: int, depth_coefficient: float) -> int:
    return int(math.ceil(depth_coefficient * repeats))


def block_counts(variant: str) -> tuple[int, ...]:
    """Depth-scaled blocks per stage — the structural fingerprint the
    .keras importer uses to recover the variant from an artifact."""
    table, _, d = _VARIANTS[variant]
    return tuple(round_repeats_v2(row[4], d) for row in _STAGES[table])


class EfficientNetV2(nn.Module):
    """keras.applications.EfficientNetV2* backbone + the transfer head.

    Keras' preprocessing layers are NOT part of the model (module
    docstring) — the forward expects pipeline-preprocessed floats like
    every other model family here."""

    num_classes: int = 2
    table: str = "b"
    width_coefficient: float = 1.0
    depth_coefficient: float = 1.0
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
        stages = _STAGES[self.table]
        rf = partial(round_filters_v2,
                     width_coefficient=self.width_coefficient)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)
        conv = partial(nn.Conv, padding="SAME", use_bias=False,
                       dtype=dtype)
        x = x.astype(dtype)

        x = conv(rf(stages[0][2]), (3, 3), (2, 2), name="stem_conv")(x)
        x = jax.nn.silu(bn(name="stem_bn")(x))

        # keras quirk (shared for training parity): the stochastic-depth
        # denominator is the UNSCALED repeat sum, the counter is over
        # depth-scaled blocks
        blocks_total = sum(row[4] for row in stages)
        b = 0
        for stage_i, (fused, expand, f_in, f_out, repeats, stride,
                      se_ratio) in enumerate(stages):
            f_in, f_out = rf(f_in), rf(f_out)
            for rep in range(round_repeats_v2(repeats,
                                              self.depth_coefficient)):
                p = f"block{stage_i + 1}{chr(ord('a') + rep)}"
                if rep > 0:
                    f_in, stride = f_out, 1
                s = (stride, stride)
                filters = f_in * expand
                shortcut = x
                y = x
                if expand != 1:
                    k = (3, 3) if fused else (1, 1)
                    y = conv(filters, k, s if fused else (1, 1),
                             name=f"{p}_expand_conv")(y)
                    y = jax.nn.silu(bn(name=f"{p}_expand_bn")(y))
                if not fused:
                    y = nn.Conv(filters, (3, 3), s, padding="SAME",
                                feature_group_count=filters,
                                use_bias=False, dtype=dtype,
                                name=f"{p}_dwconv2")(y)
                    y = jax.nn.silu(bn(name=f"{p}_bn")(y))
                if 0 < se_ratio <= 1:
                    se_filters = max(1, int(f_in * se_ratio))
                    se = jnp.mean(y, axis=(1, 2), keepdims=True)
                    se = nn.Conv(se_filters, (1, 1), dtype=dtype,
                                 name=f"{p}_se_reduce")(se)
                    se = jax.nn.silu(se)
                    se = nn.Conv(filters, (1, 1), dtype=dtype,
                                 name=f"{p}_se_expand")(se)
                    y = y * jax.nn.sigmoid(se)
                if fused:
                    # expand==1: the whole block is this k×k conv (with
                    # stride) and the activation moves AFTER project_bn
                    k = (1, 1) if expand != 1 else (3, 3)
                    y = conv(f_out, k, (1, 1) if expand != 1 else s,
                             name=f"{p}_project_conv")(y)
                    y = bn(name=f"{p}_project_bn")(y)
                    if expand == 1:
                        y = jax.nn.silu(y)
                else:
                    y = conv(f_out, (1, 1), name=f"{p}_project_conv")(y)
                    y = bn(name=f"{p}_project_bn")(y)
                if stride == 1 and f_in == f_out:
                    rate = self.drop_connect_rate * b / blocks_total
                    if rate > 0:
                        # stochastic depth: per-sample whole-block drop
                        # (keras Dropout, noise_shape=(None, 1, 1, 1))
                        y = nn.Dropout(rate, broadcast_dims=(1, 2, 3),
                                       deterministic=not train,
                                       name=f"{p}_drop")(y)
                    y = y + shortcut
                x = y
                b += 1

        x = conv(rf(1280), (1, 1), name="top_conv")(x)
        x = jax.nn.silu(bn(name="top_bn")(x))

        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def _register(variant: str):
    @register_model(variant)
    def _build(cfg: ModelConfig):
        table, w, d = _VARIANTS[variant]
        return EfficientNetV2(
            num_classes=cfg.num_classes, table=table,
            width_coefficient=w, depth_coefficient=d,
            compute_dtype=cfg.compute_dtype,
            freeze_backbone=cfg.freeze_backbone,
        )
    return _build


for _v in _VARIANTS:
    _register(_v)


def apply_keras_efficientnet_v2_weights(layer_names, weights_of,
                                        variables) -> Any:
    """Keras→Flax EfficientNetV2 mapping (source-agnostic,
    models/keras_io.py). Names are the identity; depthwise ``dwconv2``
    kernels transpose [k,k,C,1]→[k,k,1,C]; the ImageNet head
    ('predictions') and preprocessing layers are skipped."""
    from skin_image_analysis_tpu.models.keras_io import (
        apply_name_identity_weights,
    )

    return apply_name_identity_weights(
        layer_names, weights_of, variables,
        skip=("predictions", "probs", "rescaling", "normalization"),
    )


def load_keras_efficientnet_v2_weights(path: str, variables: Any) -> Any:
    """Map a legacy-format EfficientNetV2 weights ``.h5`` (the
    downloadable ``efficientnetv2-*_notop.h5`` layout) onto this
    model's variables; h5py only."""
    from skin_image_analysis_tpu.models.keras_io import read_legacy_h5

    layer_names, table = read_legacy_h5(path)
    return apply_keras_efficientnet_v2_weights(
        layer_names, table.__getitem__, variables
    )
