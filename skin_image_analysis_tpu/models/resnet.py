"""ResNet family (Flax) — the ToneClassifier's transfer backbone.

The reference fine-tunes torchvision ResNet-50 (IMAGENET1K_V1) with the
fc replaced by Dropout(0.5) + Linear(num_ftrs, 2)
(notebooks/ToneClassifier/CNNTrial.py:80-87). This is a from-scratch Flax
ResNet-18/34/50 with the same block structure (BasicBlock / Bottleneck,
stride-2 stages, BatchNorm+ReLU, global average pool) and the same
dropout+dense head, NHWC + bf16-compute for the MXU.

Pretrained ImageNet weights cannot be downloaded in this environment
(zero egress); ``load_torchvision_weights`` converts a locally present
torchvision ``resnet*.pth`` state_dict when one exists, mapping
NCHW conv kernels (O,I,H,W) → NHWC (H,W,I,O) and fc → head Dense.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.models.registry import register_model


def _dtype(name: str):
    return {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[name]


class BasicBlock(nn.Module):
    features: int
    strides: int = 1
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, *, train: bool):
        dtype = _dtype(self.compute_dtype)
        residual = x
        # explicit (1,1) padding: identical to SAME at stride 1, but at
        # stride 2 SAME pads (0,1) while torch pads (1,1) — symmetric
        # padding keeps transferred torchvision weights seeing the same
        # activations (CNNTrial.py:80 transfer fidelity)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), padding=[(1, 1), (1, 1)],
                    use_bias=False, dtype=dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    compute_dtype: str = "bfloat16"

    @nn.compact
    def __call__(self, x, *, train: bool):
        dtype = _dtype(self.compute_dtype)
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=dtype)(x)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype)(y)
        y = nn.relu(y)
        # symmetric (1,1) padding — torch parity at stride 2 (see
        # BasicBlock note)
        y = nn.Conv(self.features, (3, 3), (self.strides, self.strides),
                    padding=[(1, 1), (1, 1)], use_bias=False, dtype=dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype)(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=dtype)(y)
        y = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         scale_init=nn.initializers.zeros)(y)
        if residual.shape != y.shape:
            residual = nn.Conv(self.features * 4, (1, 1),
                               (self.strides, self.strides), use_bias=False,
                               dtype=dtype, name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet(nn.Module):
    """ResNet with the ToneClassifier head: GAP → Dropout(0.5) → Dense(n)
    → log-softmax (log-prob head keeps NLL-loss compatibility with the
    rest of the framework; CNNTrial uses CrossEntropy on logits, which is
    identical math)."""

    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    block: str = "basic"              # basic | bottleneck
    num_classes: int = 2
    head_dropout: float = 0.5
    compute_dtype: str = "bfloat16"
    # Frozen-feature transfer (jgi_ham_2018_torch.ipynb cells 30-32:
    # requires_grad=False on the backbone, train the new head only).
    # stop_gradient on the pooled features zeroes every backbone VJP, so
    # XLA dead-code-eliminates the entire backbone backward — the train
    # step costs a forward plus a head-only backward. BatchNorm running
    # stats still update in train mode, matching torch's frozen-params
    # semantics (freezing grads does not switch BN to eval).
    freeze_backbone: bool = False

    @nn.compact
    def __call__(self, x, *, train: bool = False):
        dtype = _dtype(self.compute_dtype)
        x = x.astype(dtype)
        x = nn.Conv(64, (7, 7), (2, 2), padding=[(3, 3), (3, 3)],
                    use_bias=False, dtype=dtype, name="stem_conv")(x)
        x = nn.BatchNorm(use_running_average=not train, dtype=dtype,
                         name="stem_bn")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        block_cls = BasicBlock if self.block == "basic" else Bottleneck
        for stage, n_blocks in enumerate(self.stage_sizes):
            for b in range(n_blocks):
                strides = 2 if stage > 0 and b == 0 else 1
                x = block_cls(64 * 2**stage, strides, self.compute_dtype)(
                    x, train=train
                )
        x = jnp.mean(x, axis=(1, 2))  # global average pool
        if self.freeze_backbone:
            x = jax.lax.stop_gradient(x)
        x = nn.Dropout(self.head_dropout, deterministic=not train)(x)
        x = nn.Dense(self.num_classes, dtype=dtype)(x)
        return nn.log_softmax(x.astype(jnp.float32), axis=-1)


def resnet18(num_classes: int = 2, compute_dtype: str = "bfloat16",
             freeze_backbone: bool = False) -> ResNet:
    return ResNet((2, 2, 2, 2), "basic", num_classes,
                  compute_dtype=compute_dtype,
                  freeze_backbone=freeze_backbone)


def resnet34(num_classes: int = 2, compute_dtype: str = "bfloat16",
             freeze_backbone: bool = False) -> ResNet:
    return ResNet((3, 4, 6, 3), "basic", num_classes,
                  compute_dtype=compute_dtype,
                  freeze_backbone=freeze_backbone)


def resnet50(num_classes: int = 2, compute_dtype: str = "bfloat16",
             freeze_backbone: bool = False) -> ResNet:
    return ResNet((3, 4, 6, 3), "bottleneck", num_classes,
                  compute_dtype=compute_dtype,
                  freeze_backbone=freeze_backbone)


@register_model("resnet18")
def _build_r18(cfg: ModelConfig):
    return resnet18(cfg.num_classes, cfg.compute_dtype, cfg.freeze_backbone)


@register_model("resnet34")
def _build_r34(cfg: ModelConfig):
    return resnet34(cfg.num_classes, cfg.compute_dtype, cfg.freeze_backbone)


@register_model("resnet50")
def _build_r50(cfg: ModelConfig):
    return resnet50(cfg.num_classes, cfg.compute_dtype, cfg.freeze_backbone)


def load_torchvision_weights(path: str, variables: Any) -> Any:
    """Map a local torchvision resnet state_dict (.pth) onto this model's
    variables (params + batch_stats). Head (fc) weights are skipped — the
    transfer recipe re-initializes the classifier head anyway
    (CNNTrial.py:85-87). Returns updated variables."""
    import numpy as np
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    sd = {k: v.numpy() for k, v in sd.items() if not k.startswith("fc.")}

    import flax

    flat = flax.traverse_util.flatten_dict(variables)
    out = dict(flat)

    def put(flax_key, value):
        if flax_key in flat:
            expect = flat[flax_key].shape
            if value.shape != expect:
                raise ValueError(f"{flax_key}: {value.shape} vs {expect}")
            out[flax_key] = jnp.asarray(value)

    # stem
    put(("params", "stem_conv", "kernel"),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
    put(("params", "stem_bn", "scale"), sd["bn1.weight"])
    put(("params", "stem_bn", "bias"), sd["bn1.bias"])
    put(("batch_stats", "stem_bn", "mean"), sd["bn1.running_mean"])
    put(("batch_stats", "stem_bn", "var"), sd["bn1.running_var"])

    # stages: torchvision layer{1..4}.{i}. → flax BasicBlock_N / Bottleneck_N
    block_names = sorted(
        {k[1] for k in flat if k[0] == "params"
         and (k[1].startswith("BasicBlock_")
              or k[1].startswith("Bottleneck_"))},
        key=lambda n: int(n.rsplit("_", 1)[1]),
    )
    tv_blocks = []
    layer_sizes: dict[int, int] = {}
    for k in sd:
        if k.startswith("layer"):
            layer = int(k[5])
            idx = int(k.split(".")[1])
            layer_sizes[layer] = max(layer_sizes.get(layer, 0), idx + 1)
    for layer in sorted(layer_sizes):
        for i in range(layer_sizes[layer]):
            tv_blocks.append(f"layer{layer}.{i}")
    if len(tv_blocks) != len(block_names):
        raise ValueError(
            f"block count mismatch: torchvision {len(tv_blocks)} vs "
            f"flax {len(block_names)}"
        )

    for flax_block, tv in zip(block_names, tv_blocks):
        convs = sorted(
            {k[2] for k in flat if k[:2] == ("params", flax_block)
             and k[2].startswith("Conv_")},
            key=lambda n: int(n.split("_")[1]),
        )
        bns = sorted(
            {k[2] for k in flat if k[:2] == ("params", flax_block)
             and k[2].startswith("BatchNorm_")},
            key=lambda n: int(n.split("_")[1]),
        )
        for j, (conv, bn) in enumerate(zip(convs, bns)):
            put(("params", flax_block, conv, "kernel"),
                np.transpose(sd[f"{tv}.conv{j + 1}.weight"], (2, 3, 1, 0)))
            put(("params", flax_block, bn, "scale"), sd[f"{tv}.bn{j + 1}.weight"])
            put(("params", flax_block, bn, "bias"), sd[f"{tv}.bn{j + 1}.bias"])
            put(("batch_stats", flax_block, bn, "mean"),
                sd[f"{tv}.bn{j + 1}.running_mean"])
            put(("batch_stats", flax_block, bn, "var"),
                sd[f"{tv}.bn{j + 1}.running_var"])
        if f"{tv}.downsample.0.weight" in sd:
            put(("params", flax_block, "downsample_conv", "kernel"),
                np.transpose(sd[f"{tv}.downsample.0.weight"], (2, 3, 1, 0)))
            put(("params", flax_block, "downsample_bn", "scale"),
                sd[f"{tv}.downsample.1.weight"])
            put(("params", flax_block, "downsample_bn", "bias"),
                sd[f"{tv}.downsample.1.bias"])
            put(("batch_stats", flax_block, "downsample_bn", "mean"),
                sd[f"{tv}.downsample.1.running_mean"])
            put(("batch_stats", flax_block, "downsample_bn", "var"),
                sd[f"{tv}.downsample.1.running_var"])

    return flax.traverse_util.unflatten_dict(out)
