"""Xception separable-conv network (Flax), weight-compatible with
``keras.applications.Xception``.

The reference's TF notebook trains an ImageNet Xception transfer model on
HAM-10000 (jgi_ham_2018_tf.ipynb cells 70-75, saved as
``skin_cancer_xception_model.keras``). This is a from-scratch Flax
Xception matching the Keras architecture exactly — VALID stem convs,
entry flow 128/256/728 (2 sepconvs + maxpool + 1x1 skip), middle flow of
3-sepconv residual blocks at 728, exit flow 728/1024 + 1536/2048 tail,
BatchNorm(eps=1e-3) — so ImageNet weights convert losslessly
(``load_keras_xception_weights``; numerically pinned against a live
Keras oracle in tests/test_ham_xception.py). NHWC, bf16 compute;
depthwise convs use ``feature_group_count``, which XLA maps efficiently
on TPU. Head: GAP → Dropout → Dense → log-softmax (the notebook pops
the ImageNet top and adds its own head, so only the backbone converts).
"""

from __future__ import annotations

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model

_BN_EPS = 1e-3  # keras BatchNormalization default (parity-critical)


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class SeparableConv(nn.Module):
    """Keras SeparableConv2D: depthwise 3x3 (no bias) + pointwise 1x1."""

    features: int
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x):
        dtype = _dtype(self.compute_dtype)
        in_feats = x.shape[-1]
        x = nn.Conv(
            in_feats, (3, 3), padding="SAME", feature_group_count=in_feats,
            use_bias=False, dtype=dtype, name="depthwise",
        )(x)
        x = nn.Conv(
            self.features, (1, 1), use_bias=False, dtype=dtype,
            name="pointwise",
        )(x)
        return x


class Xception(nn.Module):
    """keras.applications.Xception backbone + the transfer head.

    ``middle_blocks=8`` is the ImageNet architecture (blocks 5-12);
    smaller values give the same topology at reduced depth (weights from
    real checkpoints then require matching depth)."""

    num_classes: int = 2
    middle_blocks: int = 8
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    # Frozen-feature transfer (see models/resnet.py): stop_gradient on
    # the pooled features prunes the backbone backward; BN running stats
    # still update in train mode.
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        conv = partial(nn.Conv, use_bias=False, dtype=dtype)
        bn = partial(nn.BatchNorm, use_running_average=not train,
                     dtype=dtype, epsilon=_BN_EPS)
        x = x.astype(dtype)
        # entry stem — VALID padding like Keras (SAME would shift every
        # transferred activation)
        x = conv(32, (3, 3), (2, 2), padding="VALID",
                 name="block1_conv1")(x)
        x = bn(name="block1_conv1_bn")(x)
        x = nn.relu(x)
        x = conv(64, (3, 3), padding="VALID", name="block1_conv2")(x)
        x = bn(name="block1_conv2_bn")(x)
        x = nn.relu(x)

        # entry blocks 2-4: 2 sepconvs + 3x3/s2 maxpool, 1x1/s2 skip
        for bi, feats in zip((2, 3, 4), (128, 256, 728)):
            residual = conv(feats, (1, 1), (2, 2),
                            name=f"block{bi}_res_conv")(x)
            residual = bn(name=f"block{bi}_res_bn")(residual)
            y = x
            for si in (1, 2):
                if not (bi == 2 and si == 1):  # keras: no relu before
                    y = nn.relu(y)             # block2_sepconv1
                y = SeparableConv(
                    feats, self.compute_dtype,
                    name=f"block{bi}_sepconv{si}",
                )(y)
                y = bn(name=f"block{bi}_sepconv{si}_bn")(y)
            y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
            x = y + residual

        # middle flow: 3-sepconv residual blocks at 728
        for mi in range(self.middle_blocks):
            bi = 5 + mi
            y = x
            for si in (1, 2, 3):
                y = nn.relu(y)
                y = SeparableConv(
                    728, self.compute_dtype,
                    name=f"block{bi}_sepconv{si}",
                )(y)
                y = bn(name=f"block{bi}_sepconv{si}_bn")(y)
            x = x + y

        # exit block: sep728 -> sep1024 -> maxpool, 1x1/s2 skip to 1024
        bi = 5 + self.middle_blocks
        residual = conv(1024, (1, 1), (2, 2),
                        name=f"block{bi}_res_conv")(x)
        residual = bn(name=f"block{bi}_res_bn")(residual)
        y = nn.relu(x)
        y = SeparableConv(728, self.compute_dtype,
                          name=f"block{bi}_sepconv1")(y)
        y = bn(name=f"block{bi}_sepconv1_bn")(y)
        y = nn.relu(y)
        y = SeparableConv(1024, self.compute_dtype,
                          name=f"block{bi}_sepconv2")(y)
        y = bn(name=f"block{bi}_sepconv2_bn")(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding="SAME")
        x = y + residual

        # exit tail
        bi += 1
        x = SeparableConv(1536, self.compute_dtype,
                          name=f"block{bi}_sepconv1")(x)
        x = bn(name=f"block{bi}_sepconv1_bn")(x)
        x = nn.relu(x)
        x = SeparableConv(2048, self.compute_dtype,
                          name=f"block{bi}_sepconv2")(x)
        x = bn(name=f"block{bi}_sepconv2_bn")(x)
        x = nn.relu(x)

        x = jnp.mean(x, axis=(1, 2))  # GAP
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


@register_model("xception")
def _build_xception(cfg: ModelConfig):
    return Xception(num_classes=cfg.num_classes,
                    compute_dtype=cfg.compute_dtype,
                    freeze_backbone=cfg.freeze_backbone)


@register_model("xception_small")
def _build_xception_small(cfg: ModelConfig):
    return Xception(num_classes=cfg.num_classes, middle_blocks=2,
                    compute_dtype=cfg.compute_dtype,
                    freeze_backbone=cfg.freeze_backbone)


def apply_keras_xception_weights(layer_names, weights_of, variables):
    """Core Keras→Flax Xception mapping, source-agnostic.

    ``layer_names`` is the ordered Keras layer-name list; ``weights_of``
    maps a layer name to ``{short_weight_name: ndarray}`` (short names =
    ``kernel``/``gamma``/``depthwise_kernel``/... as Keras uses them).
    Sources: the legacy ``.h5`` weight files (`load_keras_xception_
    weights`) and live Keras models loaded from ``.keras`` artifacts
    (migrate/keras_model.py, jgi_ham_2018_tf.ipynb cell 75).

    Keras stores conv kernels HWIO (no transpose); depthwise kernels
    [k, k, Cin, 1] transpose to Flax's grouped-conv [k, k, 1, Cin]."""
    import numpy as np

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = dict(flat)

    def put(key, value):
        if key not in flat:
            raise KeyError(f"converter target {key} not in model")
        expect = flat[key].shape
        if tuple(value.shape) != tuple(expect):
            raise ValueError(f"{key}: {value.shape} vs {expect}")
        out[key] = jnp.asarray(np.asarray(value))

    def put_bn(flax_name, layer):
        w = weights_of(layer)
        put(("params", flax_name, "scale"), w["gamma"])
        put(("params", flax_name, "bias"), w["beta"])
        put(("batch_stats", flax_name, "mean"), w["moving_mean"])
        put(("batch_stats", flax_name, "var"), w["moving_variance"])

    def put_conv(flax_name, layer):
        put(("params", flax_name, "kernel"),
            weights_of(layer)["kernel"])

    def put_sep(flax_name, layer):
        w = weights_of(layer)
        put(("params", flax_name, "depthwise", "kernel"),
            np.transpose(w["depthwise_kernel"], (0, 1, 3, 2)))
        put(("params", flax_name, "pointwise", "kernel"),
            w["pointwise_kernel"])

    # residual 1x1 convs/bns carry keras auto-names (conv2d,
    # conv2d_1, ... / batch_normalization, ...) in build order:
    # blocks 2, 3, 4, then the exit block
    def _numbered(prefix):
        def rank(n):
            tail = n[len(prefix):]
            return int(tail[1:]) if tail else -1
        return sorted(
            (n for n in layer_names
             if n == prefix or n.startswith(prefix + "_")),
            key=rank,
        )

    res_convs = _numbered("conv2d")
    res_bns = _numbered("batch_normalization")

    sep_blocks = sorted({
        n.split("_")[0] for n in layer_names
        if n.startswith("block") and "_sepconv" in n
    }, key=lambda b: int(b[5:]))
    n_blocks = int(sep_blocks[-1][5:])  # 14 for ImageNet depth
    exit_block = n_blocks - 1
    if len(res_convs) != 4 or len(res_bns) != 4:
        raise ValueError(
            f"expected 4 residual convs/bns, got "
            f"{len(res_convs)}/{len(res_bns)}"
        )

    put_conv("block1_conv1", "block1_conv1")
    put_bn("block1_conv1_bn", "block1_conv1_bn")
    put_conv("block1_conv2", "block1_conv2")
    put_bn("block1_conv2_bn", "block1_conv2_bn")

    for res_i, bi in enumerate((2, 3, 4, exit_block)):
        put_conv(f"block{bi}_res_conv", res_convs[res_i])
        put_bn(f"block{bi}_res_bn", res_bns[res_i])

    for bi in range(2, n_blocks + 1):
        for si in (1, 2, 3):
            name = f"block{bi}_sepconv{si}"
            if name not in layer_names:
                continue
            put_sep(name, name)
            put_bn(f"{name}_bn", f"{name}_bn")

    return flax.traverse_util.unflatten_dict(out)


def load_keras_xception_weights(path: str, variables: Any) -> Any:
    """Map a Keras Xception weights ``.h5`` (the legacy
    ``layer_names``/``weight_names`` format every downloadable
    ``xception_weights_tf_dim_ordering_tf_kernels*.h5`` uses) onto this
    model's variables. Reads with h5py only — no TF/Keras needed at load
    time. The ImageNet classification head ('predictions') is skipped:
    the transfer recipe replaces it (jgi_ham_2018_tf.ipynb cell 70)."""
    import h5py
    import numpy as np

    with h5py.File(path, "r") as f:
        grp = f["model_weights"] if "model_weights" in f else f
        layer_names = [
            n.decode() if isinstance(n, bytes) else str(n)
            for n in grp.attrs["layer_names"]
        ]

        def weights_of(layer):
            g = grp[layer]
            names = [
                n.decode() if isinstance(n, bytes) else str(n)
                for n in g.attrs["weight_names"]
            ]
            return {
                n.split("/")[-1].split(":")[0]: np.asarray(g[n])
                for n in names
            }

        return apply_keras_xception_weights(
            layer_names, weights_of, variables
        )
