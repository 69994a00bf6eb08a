"""Import Keras-3 ``.keras`` model artifacts into this framework.

The reference's TF pipeline trains a transfer model — cell 70 of
jgi_ham_2018_tf.ipynb builds ``keras.applications.Xception(include_top=
False)`` → GlobalAveragePooling2D → Dense(num_classes, softmax), with
ResNet50V2/MobileNetV2/EfficientNetV2/VGG19 as commented alternatives —
and cell 75 saves it as ``skin_cancer_xception_model.keras``. This
module converts such artifacts into our experiment format
(``session_model.msgpack`` + ``train_config.json``) so every CLI here —
``tone_bias_test``/``tone_bias_serve``/``tone_bias_export``/continued
training — consumes them directly, the same way ``migrate/reference.py``
imports the torch ``session_model.pth``. Supported backbones: every
keras-compatible family registered here (xception, resnet50/101/152_v2,
efficientnet_b0-b7, efficientnet_v2_b0-b3/s/m/l, vgg16/19,
mobilenet_v2).

Two format facts shape the design:

- Keras 3 stores ``model.weights.h5`` groups under *structural* names
  (``separable_conv2d_7`` — class name + build counter), NOT the layer
  names the converter mappings need (``block1_conv1``); the only robust
  reader is Keras itself, so this importer requires ``keras`` at import
  time (it is the format's owner; deploy sites without Keras use the
  converted ``.msgpack``).
- The notebook feeds raw 0-255 float images (its tf.data pipeline never
  rescales), while this framework's input pipeline feeds [0, 1]. Every
  in-model preprocessing stack (any sequence of ``Rescaling`` /
  ``Normalization`` layers) composes into one per-channel affine
  ``a·x + c``; a pure scale folds EXACTLY into the stem conv kernel
  (``W·(a·x) + b == (a·W)·x + b``; zero-padding maps 0→0 under a pure
  scale), and an offset that matches the ImageNet mean/std transform
  maps onto the pipeline's ``normalize_imagenet`` flag (bit-exact: the
  constants are shared), covering EfficientNetV2-B artifacts. Any other
  offset (e.g. EfficientNetV2-S/M/L's ``Rescaling(1/128, -1)``) cannot
  fold through the stem's zero padding — it rides as the pipeline's
  generic ``input_affine`` (DataConfig.input_affine), applied on the
  [0,1] floats exactly where the source model applied it.
"""

from __future__ import annotations

import json
import os
from typing import Any, Callable

import numpy as np

__all__ = [
    "KerasImportError",
    "compose_input_transform",
    "import_keras_experiment",
    "import_keras_model",
]


class KerasImportError(ValueError):
    """A .keras artifact this importer cannot faithfully convert."""


def _detect_family(
    all_names: list[str],
) -> list[tuple[str, Callable, tuple[str, ...]]]:
    """Candidate ``(registered model name, apply_keras_*_weights fn,
    stem kernel path)`` tuples from the layer-name fingerprint. Usually
    one candidate; EfficientNet-v1 b1/b2 share per-stage block counts
    and are disambiguated by the caller's shape-checked weight apply."""
    names = set(all_names)
    has_sep = any("_sepconv" in n for n in names)
    if "block1_conv1" in names and has_sep:
        from skin_image_analysis_tpu.models.xception import (
            apply_keras_xception_weights,
        )

        sep_blocks = {
            n.split("_")[0] for n in names
            if n.startswith("block") and "_sepconv" in n
        }
        middle = max(int(b[5:]) for b in sep_blocks) - 6
        variant = {8: "xception", 2: "xception_small"}.get(middle)
        if variant is None:
            raise KerasImportError(
                f"Xception with {middle} middle blocks has no "
                "registered equivalent (xception=8, xception_small=2)"
            )
        return [(variant, apply_keras_xception_weights,
                 ("params", "block1_conv1", "kernel"))]
    if "block5_conv3" in names and not has_sep:
        from skin_image_analysis_tpu.models.vgg import (
            apply_keras_vgg_weights,
        )

        variant = "vgg19" if "block5_conv4" in names else "vgg16"
        return [(variant, apply_keras_vgg_weights,
                 ("params", "block1_conv1", "kernel"))]
    if "conv2_block1_preact_bn" in names and "post_bn" in names:
        from skin_image_analysis_tpu.models.resnet_v2 import (
            _DEPTHS,
            apply_keras_resnet_v2_weights,
        )

        depths = tuple(
            max(int(n.split("_block")[1].split("_")[0])
                for n in names if n.startswith(f"conv{s}_block"))
            for s in (2, 3, 4, 5)
        )
        variant = {v: k for k, v in _DEPTHS.items()}.get(depths)
        if variant is None:
            raise KerasImportError(
                f"ResNet-V2 with stack depths {depths} has no "
                f"registered equivalent ({dict(_DEPTHS)})"
            )
        return [(variant, apply_keras_resnet_v2_weights,
                 ("params", "conv1_conv", "kernel"))]
    if "Conv_1_bn" in names and "expanded_conv_depthwise" in names:
        from skin_image_analysis_tpu.models.mobilenet import (
            apply_keras_mobilenet_v2_weights,
        )

        return [("mobilenet_v2", apply_keras_mobilenet_v2_weights,
                 ("params", "Conv1", "kernel"))]
    if "top_bn" in names and any("_dwconv2" in n for n in names):
        from skin_image_analysis_tpu.models.efficientnet_v2 import (
            _VARIANTS,
            apply_keras_efficientnet_v2_weights,
            block_counts,
        )

        counts = tuple(
            sum(1 for n in names
                if n.startswith(f"block{s}")
                and n.endswith("_project_conv"))
            for s in range(1, 8)
        )
        counts = tuple(x for x in counts if x)
        variant = next(
            (v for v in _VARIANTS if block_counts(v) == counts), None
        )
        if variant is None:
            raise KerasImportError(
                f"EfficientNetV2 with per-stage block counts {counts} "
                "has no registered equivalent (b0-b3, s, m, l)"
            )
        return [(variant, apply_keras_efficientnet_v2_weights,
                 ("params", "stem_conv", "kernel"))]
    if "top_bn" in names and any(n.endswith("_dwconv") for n in names):
        from skin_image_analysis_tpu.models.efficientnet import (
            _VARIANTS as _V1_VARIANTS,
            apply_keras_efficientnet_weights,
        )
        from skin_image_analysis_tpu.models.efficientnet import (
            block_counts as _v1_counts,
        )

        counts = tuple(
            sum(1 for n in names
                if n.startswith(f"block{s}")
                and n.endswith("_project_conv"))
            for s in range(1, 8)
        )
        cands = [v for v in _V1_VARIANTS if _v1_counts(v) == counts]
        if not cands:
            raise KerasImportError(
                f"EfficientNet (v1) with per-stage block counts "
                f"{counts} has no registered equivalent (b0-b7)"
            )
        # b1/b2 share counts: both returned, the caller's shape-checked
        # apply picks the one whose widths match
        return [(f"efficientnet_{v}", apply_keras_efficientnet_weights,
                 ("params", "stem_conv", "kernel")) for v in cands]
    raise KerasImportError(
        "unrecognized backbone — supported transfer families: Xception "
        "(the artifact jgi_ham_2018_tf.ipynb cell 75 saves), "
        "ResNet50/101/152V2, EfficientNet (b0-b7), EfficientNetV2 "
        "(b0-b3/s/m/l), VGG16/19, "
        f"MobileNetV2 (alpha=1); found layers {all_names[:8]}... — "
        "torch checkpoints import via cli/import_reference.py, raw "
        "backbone weight files via the models.* load_keras_*_weights "
        "converters"
    )


def compose_input_transform(
    pre_layers: list[tuple],
) -> tuple[np.ndarray, bool, tuple | None]:
    """Fold the model's preprocessing stack into this framework's input
    conventions: ``(per-channel stem fold, normalize_imagenet flag,
    input_affine)``.

    ``pre_layers`` lists the model's preprocessing layers in graph
    order: ``("rescaling", scale, offset)`` (scalar or per-channel) or
    ``("normalization", mean, variance)``. All are per-channel affine,
    so the whole stack composes to ``y = a·x_raw + c``; as a function of
    our pipeline's x01 = x_raw/255 that is ``(255a)·x01 + c``. Then:

    - offset-free (c == 0): fold the pure scale into the stem kernel;
    - c == -(255a)·mean_imagenet exactly (the EfficientNet-style
      ImageNet normalization): map onto the pipeline's
      ``normalize_imagenet`` flag (same constants, bit-exact) with the
      residual per-channel scale folded into the stem;
    - any other offset (e.g. EfficientNetV2-S/M/L's Rescaling(1/128,
      -1)) cannot fold through the stem conv's zero padding, so it is
      carried as the pipeline's generic ``input_affine`` (scale, offset)
      on the [0,1] floats (DataConfig.input_affine — applied bit-exactly
      where the source model applied it, before the first conv)."""
    a = np.full(3, 255.0)
    c = np.zeros(3)
    for layer in pre_layers:
        kind = layer[0]
        if kind == "rescaling":
            s = np.broadcast_to(
                np.asarray(layer[1], np.float64).ravel(), (3,))
            o = np.broadcast_to(
                np.asarray(layer[2], np.float64).ravel(), (3,))
            a, c = s * a, s * c + o
        elif kind == "normalization":
            m = np.broadcast_to(
                np.asarray(layer[1], np.float64).ravel(), (3,))
            std = np.sqrt(np.broadcast_to(
                np.asarray(layer[2], np.float64).ravel(), (3,)))
            a, c = a / std, (c - m) / std
        else:  # pragma: no cover - caller builds the tuples
            raise KerasImportError(f"unknown preprocessing layer {kind}")
    if np.allclose(c, 0.0, atol=1e-9):
        return a.astype(np.float32), False, None
    from skin_image_analysis_tpu.ops.preprocess import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    mean = np.asarray(IMAGENET_MEAN, np.float64)
    std = np.asarray(IMAGENET_STD, np.float64)
    if np.allclose(c, -a * mean, rtol=1e-6, atol=1e-9):
        return (a * std).astype(np.float32), True, None
    affine = (tuple(float(v) for v in a), tuple(float(v) for v in c))
    return np.ones(3, np.float32), False, affine


def _default_class_names(num_classes: int) -> list[str]:
    if num_classes == 2:
        return ["benign", "malignant"]
    if num_classes == 7:
        from skin_image_analysis_tpu.data.ham import DX_CLASSES

        return list(DX_CLASSES)
    return [f"class_{i}" for i in range(num_classes)]


def import_keras_model(
    path: str, image_size: int | None = None
) -> tuple[Any, dict, dict]:
    """Parse a ``.keras`` transfer artifact and return ``(model_cfg,
    variables, meta)`` where ``variables`` is the full ``{"params",
    "batch_stats"}`` dict matching ``build_model(model_cfg)`` exactly,
    with the 0-255 input convention folded into the stem kernel (module
    docstring). ``image_size`` overrides when the saved model's spatial
    dims are dynamic (cell 70 builds without an input_shape); a static
    input wins."""
    try:
        import keras
    except Exception as e:  # pragma: no cover - keras is baked in here
        raise KerasImportError(
            f"importing .keras artifacts requires keras: {e}"
        ) from e

    import jax
    import jax.numpy as jnp

    import flax

    from skin_image_analysis_tpu.config import ModelConfig
    from skin_image_analysis_tpu.models import build_model
    from skin_image_analysis_tpu.models.keras_io import read_live_model

    try:
        model = keras.saving.load_model(path, compile=False)
    except Exception as e:
        raise KerasImportError(f"{path}: not a loadable .keras: {e}") from e

    all_names = [layer.name for layer in model.layers]
    candidates = _detect_family(all_names)

    # transfer head: exactly one Dense
    dense = [l for l in model.layers
             if l.__class__.__name__ == "Dense" and l.get_weights()]
    if len(dense) != 1:
        raise KerasImportError(
            f"expected exactly one Dense head, found "
            f"{[l.name for l in dense]}"
        )
    head = dense[0]
    num_classes = int(head.get_weights()[0].shape[-1])

    # input convention: compose the in-model preprocessing stack (in
    # graph order) into a stem fold + pipeline-normalization flag
    pre_layers = []
    for l in model.layers:
        cls = l.__class__.__name__
        if cls == "Rescaling":
            pre_layers.append(
                ("rescaling", np.asarray(l.scale, np.float64),
                 np.asarray(getattr(l, "offset", 0.0) or 0.0,
                            np.float64)))
        elif cls == "Normalization":
            pre_layers.append(
                ("normalization", np.asarray(l.mean, np.float64),
                 np.asarray(l.variance, np.float64)))
    fold, normalize_imagenet, input_affine = compose_input_transform(
        pre_layers)

    shape = tuple(model.input.shape)  # (None, H, W, C)
    if len(shape) != 4 or (shape[3] not in (3, None)):
        raise KerasImportError(f"unsupported input shape {shape}")
    if shape[1] is not None:
        if shape[1] != shape[2]:
            raise KerasImportError(
                f"non-square input {shape} has no ModelConfig equivalent"
            )
        size = int(shape[1])
    else:
        size = int(image_size or 224)

    try:
        layer_names, table = read_live_model(model)
    except ValueError as e:
        raise KerasImportError(str(e)) from e
    # preprocessing layers are folded via compose_input_transform, not
    # mapped as weights
    backbone_names = [
        n for n in layer_names
        if n != head.name
        and not n.startswith(("rescaling", "normalization"))
    ]

    variables = cfg = None
    errors: list[str] = []
    for variant, apply_fn, stem_key in candidates:
        cfg = ModelConfig(
            name=variant, num_classes=num_classes, image_size=size,
            # parity contract with the source framework (same reasoning
            # as the .pth import): advertised-equal predictions need f32
            compute_dtype="float32",
        )
        flax_model = build_model(cfg)
        abstract = jax.eval_shape(
            lambda k, x: flax_model.init(k, x, train=False),
            jax.random.key(0),
            jnp.zeros((1, size, size, 3), jnp.float32),
        )
        consumed: set[str] = set()

        def weights_of(name: str) -> dict:
            consumed.add(name)
            return table[name]

        try:
            variables = apply_fn(backbone_names, weights_of, abstract)
            break
        except (KeyError, ValueError) as e:
            errors.append(f"{variant}: {e}")
    else:
        raise KerasImportError(
            "weight mapping failed for every candidate variant "
            "(width-scaled or non-standard model?): "
            + "; ".join(errors)
        )
    variables = flax.core.unfreeze(variables)
    variables = {k: dict(v) for k, v in variables.items()}

    leftovers = set(backbone_names) - consumed
    if leftovers:
        raise KerasImportError(
            f"weighted layers the {variant} mapping does not consume: "
            f"{sorted(leftovers)}"
        )

    # head Dense → Flax Dense_0 (keras kernel is already [in, out])
    flat = flax.traverse_util.flatten_dict(variables)
    hk, hb = table[head.name]["kernel"], table[head.name]["bias"]
    for key, val in ((("params", "Dense_0", "kernel"), hk),
                     (("params", "Dense_0", "bias"), hb)):
        if key not in flat:
            raise KerasImportError(f"model has no head at {key}")
        if tuple(flat[key].shape) != tuple(val.shape):
            raise KerasImportError(
                f"head {key}: {val.shape} vs {flat[key].shape} — the "
                "backbone feature width does not match"
            )
        flat[key] = jnp.asarray(val)

    if not np.allclose(fold, 1.0):
        # per input channel: W·(a⊙x) == (a⊙W)·x along the C_in axis
        flat[stem_key] = flat[stem_key] * jnp.asarray(
            fold.reshape(1, 1, 3, 1), jnp.float32)

    remaining = [k for k, v in flat.items()
                 if isinstance(v, jax.ShapeDtypeStruct)]
    if remaining:
        raise KerasImportError(
            f"unconverted model leaves: {remaining[:6]}"
        )
    variables = flax.traverse_util.unflatten_dict(flat)

    meta = {
        "backbone": variant,
        "num_classes": num_classes,
        "image_size": size,
        "input_scale_folded": (float(fold[0]) if np.allclose(fold, fold[0])
                               else [float(v) for v in fold]),
        "normalize_imagenet": normalize_imagenet,
        "input_affine": ([list(v) for v in input_affine]
                         if input_affine is not None else None),
        "head_layer": head.name,
        "param_count": int(sum(
            int(np.prod(v.shape))
            for v in flax.traverse_util.flatten_dict(
                variables["params"]).values()
        )),
    }
    return cfg, variables, meta


def import_keras_experiment(
    path: str,
    out_folder: str,
    class_names: list[str] | None = None,
    image_size: int | None = None,
) -> dict:
    """Convert a ``.keras`` artifact into an experiment folder every CLI
    here consumes (``session_model.msgpack`` + ``train_config.json``,
    the transfer trainers' layout, train/classify.py)."""
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    cfg, variables, meta = import_keras_model(path, image_size=image_size)
    names = list(class_names or _default_class_names(meta["num_classes"]))
    if len(names) != meta["num_classes"]:
        raise KerasImportError(
            f"{len(names)} class names for {meta['num_classes']} classes"
        )

    os.makedirs(out_folder, exist_ok=True)
    ckpt_lib.save_model(
        os.path.join(out_folder, ckpt_lib.MODEL_FILENAME),
        cfg, variables["params"], variables.get("batch_stats"),
    )
    with open(os.path.join(out_folder, "train_config.json"), "w") as f:
        json.dump(
            {
                # the source model's input convention is folded into the
                # stem weights; normalize_imagenet is True only when the
                # artifact embedded the ImageNet normalization stack
                # (EfficientNetV2-B) that our pipeline flag reproduces
                "data": {
                    "normalize_imagenet": meta["normalize_imagenet"],
                    **({"input_affine": meta["input_affine"]}
                       if meta["input_affine"] is not None else {}),
                },
                "class_names": names,
                "image_size": cfg.image_size,
                "imported_from": os.path.abspath(path),
                "keras_import": meta,
            },
            f, indent=2,
        )
    return {
        "model": ckpt_lib.MODEL_FILENAME,
        "class_names": names,
        **meta,
    }
