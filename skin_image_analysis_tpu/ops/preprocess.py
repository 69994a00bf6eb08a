"""Device-side image preprocessing + augmentation.

The reference does all of this per-sample on host CPU inside DataLoader
workers: skimage JPEG decode, float64 anti-aliased resize, HWC→CHW
(tone_bias_dataset.py:326-335, Rescale :397-427, RandomCrop :430-458,
ToTensor :461-473), with the ToneClassifier's real augmentation recipe —
RandomHorizontalFlip(0.5) + RandomCrop(224) + scale + ImageNet Normalize
(CNNTrialDataset.py:54-60). That host path caps training at ~6 img/s.

TPU-native redesign: the host ships **uint8** canonical images (4x less
PCIe/HBM traffic than float32); everything else happens on device inside
the same jit as the train step, so XLA fuses cast → crop → flip → jitter →
normalize into a couple of elementwise kernels over VMEM-resident tiles:

- random crop: one gather per image row/col offset (vmap'd dynamic_slice);
- horizontal flip: ``jnp.where`` on a reversed view (no data-dependent
  control flow — compiler-friendly select);
- color jitter: per-image brightness/contrast/saturation affine, matching
  torchvision ColorJitter's uniform-factor semantics;
- normalize: /255 and optional ImageNet mean/std, folded into one FMA.

A Pallas fused kernel for the uint8→bf16 crop+normalize path lives in
ops/pallas/preprocess_kernel.py; this module is the reference jnp
implementation and the fallback on non-TPU backends.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


def normalize_affine(affine) -> tuple[tuple[float, ...], tuple[float, ...]] | None:
    """Canonicalize an input affine ``(scale, offset)`` — per-channel or
    scalar, lists or tuples (train_config.json stores lists) — into a
    hashable nested float tuple usable as a jit static argument, or None.

    The affine is the model's input convention as a function of this
    pipeline's [0, 1] floats: ``model_input = scale ⊙ x01 + offset``. It
    generalizes ``normalize_imagenet`` (scale=1/std, offset=-mean/std) to
    arbitrary in-model preprocessing stacks — e.g. Keras EfficientNetV2-
    S/M/L artifacts embed ``Rescaling(1/128, offset=-1)``, whose offset
    cannot fold through a zero-padded stem conv (migrate/keras_model.py).
    """
    if affine is None:
        return None
    scale, offset = affine

    def chan3(v) -> tuple[float, ...]:
        if isinstance(v, (int, float)):
            return (float(v),) * 3
        vals = tuple(float(x) for x in v)
        if len(vals) == 1:
            return vals * 3
        return vals

    return chan3(scale), chan3(offset)


class AugmentConfig(NamedTuple):
    random_crop: bool = True
    horizontal_flip: bool = True
    brightness: float = 0.0      # jitter half-range, e.g. 0.2 → factor in [0.8, 1.2]
    contrast: float = 0.0
    saturation: float = 0.0


def _resize_batch(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """Exact (possibly aspect-breaking) resize to (size, size) — the
    pipeline's equivalent of the reference's Rescale((224, 224))
    (tone_bias_train.py:313)."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    return jax.image.resize(x, (b, size, size, c), method="bilinear")


def _random_crops(x: jnp.ndarray, size: int, key: jax.Array) -> jnp.ndarray:
    """Per-image random top-left crop from canonical (H, W) to (size, size)
    (reference RandomCrop semantics, tone_bias_dataset.py:430-458)."""
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    ky, kx = jax.random.split(key)
    ys = jax.random.randint(ky, (b,), 0, h - size + 1)
    xs = jax.random.randint(kx, (b,), 0, w - size + 1)

    def crop(img, y, x0):
        return jax.lax.dynamic_slice(img, (y, x0, 0), (size, size, c))

    return jax.vmap(crop)(x, ys, xs)


def _center_crops(x: jnp.ndarray, size: int) -> jnp.ndarray:
    b, h, w, c = x.shape
    if h == size and w == size:
        return x
    y0, x0 = (h - size) // 2, (w - size) // 2
    return jax.lax.dynamic_slice(x, (0, y0, x0, 0), (b, size, size, c))


def five_crop_batch(x: jnp.ndarray, size: int) -> jnp.ndarray:
    """[B, H, W, C] → [5·B, size, size, C]: four corner crops + the
    center crop, concatenated along the batch axis (torchvision FiveCrop
    order: TL, TR, BL, BR, center — the test-time-augmentation
    experiment CNNTrialDataset.py:61-65 documents; the reference rejected
    it for its 5x eval cost, :97-104 — here the five crops ride one
    batched forward, so the cost is one 5x-larger MXU batch, not five
    dispatches)."""
    b, h, w, c = x.shape
    if h < size or w < size:
        raise ValueError(f"five_crop needs source >= {size}, got {h}x{w}")
    offsets = (
        (0, 0), (0, w - size), (h - size, 0), (h - size, w - size),
        ((h - size) // 2, (w - size) // 2),
    )
    return jnp.concatenate(
        [jax.lax.dynamic_slice(x, (0, y, x0, 0), (b, size, size, c))
         for y, x0 in offsets],
        axis=0,
    )


def _color_jitter(
    x: jnp.ndarray, key: jax.Array, cfg: AugmentConfig
) -> jnp.ndarray:
    """Per-image brightness/contrast/saturation jitter on [0,1] floats."""
    b = x.shape[0]
    kb, kc, ks = jax.random.split(key, 3)
    if cfg.brightness > 0:
        f = jax.random.uniform(
            kb, (b, 1, 1, 1), minval=1 - cfg.brightness, maxval=1 + cfg.brightness
        )
        x = x * f
    if cfg.contrast > 0:
        f = jax.random.uniform(
            kc, (b, 1, 1, 1), minval=1 - cfg.contrast, maxval=1 + cfg.contrast
        )
        mean = jnp.mean(x, axis=(1, 2, 3), keepdims=True)
        x = (x - mean) * f + mean
    if cfg.saturation > 0:
        f = jax.random.uniform(
            ks, (b, 1, 1, 1), minval=1 - cfg.saturation, maxval=1 + cfg.saturation
        )
        # luma via Rec.601
        gray = (
            0.299 * x[..., 0:1] + 0.587 * x[..., 1:2] + 0.114 * x[..., 2:3]
        )
        x = (x - gray) * f + gray
    return jnp.clip(x, 0.0, 1.0)


@partial(
    jax.jit,
    static_argnames=(
        "image_size", "train", "augment", "normalize_imagenet",
        "input_affine",
    ),
)
def preprocess_batch(
    pixels: jnp.ndarray,
    key: jax.Array | None = None,
    *,
    image_size: int = 224,
    train: bool = False,
    augment: AugmentConfig | None = None,
    normalize_imagenet: bool = False,
    input_affine: tuple | None = None,
) -> jnp.ndarray:
    """uint8 (or float) HWC batch → float32 model input.

    Eval: deterministic exact resize to (image_size, image_size), /255 —
    the reference eval transform. Train with ``augment``: random crop from
    the canonical frame (falling back to resize when the source is already
    target-sized), random horizontal flip, color jitter.

    ``input_affine`` (exclusive with ``normalize_imagenet``): a static
    per-channel ``(scale, offset)`` applied last — see
    :func:`normalize_affine` for the convention.
    """
    if normalize_imagenet and input_affine is not None:
        raise ValueError(
            "normalize_imagenet and input_affine are exclusive — "
            "express ImageNet normalization as the affine "
            "(1/std, -mean/std) instead"
        )
    x = pixels.astype(jnp.float32)
    if pixels.dtype == jnp.uint8:
        x = x * (1.0 / 255.0)

    if train and augment is not None:
        if augment.random_crop and x.shape[1] > image_size:
            key, sub = jax.random.split(key)
            x = _random_crops(x, image_size, sub)
        else:
            x = _resize_batch(x, image_size)
        if augment.horizontal_flip:
            key, sub = jax.random.split(key)
            flip = jax.random.bernoulli(sub, 0.5, (x.shape[0], 1, 1, 1))
            x = jnp.where(flip, x[:, :, ::-1, :], x)
        if augment.brightness or augment.contrast or augment.saturation:
            key, sub = jax.random.split(key)
            x = _color_jitter(x, sub, augment)
    else:
        x = _resize_batch(x, image_size)

    if normalize_imagenet:
        mean = jnp.asarray(IMAGENET_MEAN, jnp.float32)
        std = jnp.asarray(IMAGENET_STD, jnp.float32)
        x = (x - mean) / std
    elif input_affine is not None:
        scale, offset = normalize_affine(input_affine)
        x = x * jnp.asarray(scale, jnp.float32) + jnp.asarray(
            offset, jnp.float32)
    return x


def make_preprocess_fn(
    image_size: int,
    train: bool,
    augment: AugmentConfig | None = None,
    normalize_imagenet: bool = False,
    layout: str = "hwc",
    pallas: str = "auto",
    out_dtype: str | None = None,
    space_to_depth: bool = False,
    input_affine: tuple | None = None,
):
    """Close over static config → ``fn(pixels, key) -> f32 NHWC batch``
    suitable for fusion inside the jitted train/eval step.

    ``layout="planar"`` accepts [B, C, S, S] arenas (the native decoder's
    planar output). On TPU backends the augmented-train planar path runs
    the Pallas fused kernel (ops/pallas/preprocess_kernel.py — one VMEM
    pass for cast+crop+flip+affine, ~2.6x the jnp path's throughput,
    docs/PERF.md); other paths transpose to NHWC and use the jnp
    reference implementation. ``pallas``: "auto" | "on" | "off".

    ``space_to_depth`` (models with ``stem="s2d"``): the Pallas kernel
    emits the 2x2 space-to-depth layout directly at the store (free —
    same selection-matmul FLOPs); non-kernel paths keep emitting plain
    NHWC, which the model transforms itself.
    """
    if layout not in ("hwc", "planar"):
        raise ValueError(f"layout must be hwc|planar, got {layout!r}")
    if pallas not in ("auto", "on", "off"):
        raise ValueError(f"pallas must be auto|on|off, got {pallas!r}")
    input_affine = normalize_affine(input_affine)
    if normalize_imagenet and input_affine is not None:
        raise ValueError(
            "normalize_imagenet and input_affine are exclusive"
        )

    use_pallas = layout == "planar" and (
        pallas == "on"
        or (
            pallas == "auto"
            and train
            and augment is not None
            and jax.default_backend() != "cpu"
        )
    )

    if layout == "hwc":
        def fn(pixels: jnp.ndarray, key: jax.Array | None = None):
            return preprocess_batch(
                pixels, key, image_size=image_size, train=train,
                augment=augment, normalize_imagenet=normalize_imagenet,
                input_affine=input_affine,
            )

        return fn

    if use_pallas:
        from skin_image_analysis_tpu.ops.pallas.preprocess_kernel import (
            preprocess_planar_batch,
        )

        odt = None if out_dtype is None else jnp.dtype(out_dtype)

        def fn(pixels: jnp.ndarray, key: jax.Array | None = None,
               rows: jnp.ndarray | None = None):
            return preprocess_planar_batch(
                pixels, key, image_size=image_size, train=train,
                augment=augment, normalize_imagenet=normalize_imagenet,
                out_dtype=odt, rows=rows, space_to_depth=space_to_depth,
                input_affine=input_affine,
            )

        # the train step may pass the whole device arena + per-step row
        # indices so the kernel's grid DMA does the batch gather itself
        fn.supports_rows = True
        return fn

    def fn(pixels: jnp.ndarray, key: jax.Array | None = None):
        # planar jnp fallback (CPU tests, eval resize path): NCHW → NHWC
        # transpose fuses into the elementwise chain under jit
        return preprocess_batch(
            jnp.transpose(pixels, (0, 2, 3, 1)), key,
            image_size=image_size, train=train, augment=augment,
            normalize_imagenet=normalize_imagenet,
            input_affine=input_affine,
        )

    return fn
