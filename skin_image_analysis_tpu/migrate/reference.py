"""Import the reference's trained ``session_model.pth`` checkpoints.

The reference deploys experiments as whole-module torch pickles
(``torch.save(model, 'session_model.pth')``, tone_bias_model.py:305-316;
written per run at tone_bias_train.py:443). A user switching to this
framework brings folders of those — this module converts them to our
``session_model.msgpack`` artifacts WITHOUT importing the reference's
code or executing the pickle (see :mod:`.torch_pickle`):

- the architecture is recovered from the pickled module graph (conv
  stack, kernel sizes, MLP widths, dropout rates, class count → a
  :class:`ModelConfig`), matching the SkinCancerListModel /
  SkinCancerModel family (tone_bias_model.py:56-299) and anything the
  HPO search space emits (tone_bias_optuna.py:123-173);
- weights map to the Flax tree: conv kernels OIHW→HWIO, linear kernels
  transposed, and the FIRST post-flatten Dense row-permuted from the
  reference's NCHW flatten order (c·H·W + h·W + w) to our NHWC order
  (h·W·C + w·C + c) — the layout change is absorbed entirely into the
  checkpoint so forward passes match numerically;
- ``model.class_names`` (tone_bias_model.py:62-64) travels into
  ``train_config.json`` for the serving/export surfaces.

:func:`import_reference_experiment` converts a whole reference results
folder (model + frozen split CSVs + epoch-record JSONs), producing an
experiment directory our test/analysis/serve/export CLIs consume as if
it had been trained here.
"""

from __future__ import annotations

import glob
import json
import os
import shutil
from typing import Any

import numpy as np

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.migrate.torch_pickle import (
    TorchPickleError,
    load_pth,
    named_modules,
    stub_kind,
)

__all__ = ["import_reference_model", "import_reference_experiment"]

_PASSIVE = {
    # parameter-free modules the family may contain, in any lowering
    "ReLU", "MaxPool2d", "Flatten", "LogSoftmax", "Dropout", "Dropout2d",
    "Sequential", "ModuleList", "Softmax", "Identity",
}


def _pair(value: Any) -> tuple[int, int]:
    if isinstance(value, (tuple, list)):
        return int(value[0]), int(value[1])
    return int(value), int(value)


def _conv_entry(path: str, stub: Any) -> dict:
    params = getattr(stub, "_parameters", {})
    weight = params.get("weight")
    if weight is None or weight.ndim != 4:
        raise TorchPickleError(f"{path}: Conv2d without a 4-D weight")
    kh, kw = weight.shape[2], weight.shape[3]
    if kh != kw:
        raise TorchPickleError(
            f"{path}: non-square conv kernel {kh}x{kw} is outside the "
            "SkinCancerListModel family"
        )
    stride = _pair(getattr(stub, "stride", 1))
    if stride != (1, 1):
        raise TorchPickleError(
            f"{path}: conv stride {stride} unsupported (family uses "
            "stride 1 + 2x2 max-pool)"
        )
    padding = getattr(stub, "padding", "same")
    same = padding == "same" or _pair(padding) == (kh // 2, kw // 2)
    if not same:
        raise TorchPickleError(
            f"{path}: conv padding {padding!r} is not SAME for k={kh}"
        )
    return {
        "path": path,
        "weight": weight,
        "bias": params.get("bias"),
        "kernel": kh,
        "in": weight.shape[1],
        "out": weight.shape[0],
    }


def _linear_entry(path: str, stub: Any) -> dict:
    params = getattr(stub, "_parameters", {})
    weight = params.get("weight")
    if weight is None or weight.ndim != 2:
        raise TorchPickleError(f"{path}: Linear without a 2-D weight")
    return {
        "path": path,
        "weight": weight,
        "bias": params.get("bias"),
        "in": weight.shape[1],
        "out": weight.shape[0],
    }


def _nhwc_flatten_permutation(c: int, h: int, w: int) -> np.ndarray:
    """For each NHWC-flatten row (h,w,c) the corresponding NCHW-flatten
    index c·H·W + h·W + w."""
    return np.arange(c * h * w).reshape(c, h, w).transpose(1, 2, 0).ravel()


def import_reference_model(
    path: str,
) -> tuple[ModelConfig, Any, list[str]]:
    """Parse a reference ``session_model.pth`` (whole-module pickle) and
    return ``(model_cfg, flax_params, class_names)``.

    The params tree matches ``build_model(model_cfg)`` exactly (verified
    structurally against ``jax.eval_shape`` of the model's init before
    returning) so the result feeds straight into ``save_model`` /
    the eval/serve/export surfaces.
    """
    root = load_pth(path)
    if isinstance(root, dict):
        raise TorchPickleError(
            f"{path}: this is a state_dict, not a whole-module pickle; "
            "the reference saves whole modules (tone_bias_model.py:305). "
            "For torchvision backbone state_dicts use "
            "models.resnet.load_torchvision_weights."
        )

    convs: list[dict] = []
    linears: list[dict] = []
    dropouts: list[float] = []
    for mod_path, stub in named_modules(root):
        kind = stub_kind(stub)
        params = getattr(stub, "_parameters", None)
        has_params = isinstance(params, dict) and any(
            v is not None for v in params.values()
        )
        if kind == "Conv2d":
            if linears:
                raise TorchPickleError(
                    f"{mod_path}: conv after linear layers is outside "
                    "the SkinCancerListModel family"
                )
            convs.append(_conv_entry(mod_path, stub))
        elif kind == "Linear":
            linears.append(_linear_entry(mod_path, stub))
        elif kind in ("Dropout", "Dropout2d"):
            dropouts.append(float(getattr(stub, "p", 0.5)))
        elif has_params:
            raise TorchPickleError(
                f"{mod_path}: parameterized module {kind} is outside the "
                "SkinCancerListModel family (BatchNorm backbones load "
                "via models.resnet / models.xception converters)"
            )
        elif kind not in _PASSIVE and mod_path:
            # unknown but parameter-free containers (custom wrappers)
            # are harmless — walk through them
            pass

    if not convs or len(linears) < 1:
        raise TorchPickleError(
            f"{path}: expected a conv stack + linear head, found "
            f"{len(convs)} convs / {len(linears)} linears"
        )
    for prev, nxt in zip(convs, convs[1:]):
        if nxt["in"] != prev["out"]:
            raise TorchPickleError(
                f"{nxt['path']}: conv in-channels {nxt['in']} do not "
                f"chain from {prev['path']} out-channels {prev['out']}"
            )
    rest_kernels = {c["kernel"] for c in convs[1:]}
    if len(rest_kernels) > 1:
        raise TorchPickleError(
            f"{path}: mixed non-first conv kernels {sorted(rest_kernels)}"
        )

    # geometry: first linear input = C_last * (S / 2^n_convs)^2
    c_last = convs[-1]["out"]
    flat_in = linears[0]["in"]
    if flat_in % c_last:
        raise TorchPickleError(
            f"{path}: flatten dim {flat_in} not divisible by final conv "
            f"channels {c_last}"
        )
    hw = flat_in // c_last
    side = int(round(hw ** 0.5))
    if side * side != hw:
        raise TorchPickleError(
            f"{path}: flatten spatial size {hw} is not square"
        )
    image_size = side * (2 ** len(convs))

    hidden = linears[:-1]
    head = linears[-1]
    for prev, nxt in zip(linears, linears[1:]):
        if nxt["in"] != prev["out"]:
            raise TorchPickleError(
                f"{nxt['path']}: linear in-features {nxt['in']} do not "
                f"chain from {prev['path']} out-features {prev['out']}"
            )
    if dropouts and len(dropouts) not in (1, len(hidden)):
        raise TorchPickleError(
            f"{path}: {len(dropouts)} dropout layers for {len(hidden)} "
            "hidden linears"
        )

    cfg = ModelConfig(
        name="skin_cancer_list",
        conv_features=tuple(c["out"] for c in convs),
        first_kernel=convs[0]["kernel"],
        kernel=(convs[1]["kernel"] if len(convs) > 1 else 3),
        linear_features=tuple(l["out"] for l in hidden),
        dropout=tuple(dropouts) if dropouts else (0.0,),
        num_classes=head["out"],
        image_size=image_size,
        in_channels=convs[0]["in"],
        # the import's contract is numeric parity with the f32 torch
        # module — serve/audit the imported weights in float32 (bf16,
        # the training default, flips near-0.5 p_malignant calls);
        # users can opt back into bf16 for throughput explicitly
        compute_dtype="float32",
    )

    def dense(entry: dict, perm: np.ndarray | None = None) -> dict:
        kernel = np.ascontiguousarray(entry["weight"].T.astype(np.float32))
        if perm is not None:
            kernel = kernel[perm]
        bias = entry["bias"]
        if bias is None:
            bias = np.zeros((entry["out"],), np.float32)
        return {"kernel": kernel, "bias": bias.astype(np.float32)}

    params: dict[str, Any] = {}
    for i, conv in enumerate(convs):
        bias = conv["bias"]
        if bias is None:
            bias = np.zeros((conv["out"],), np.float32)
        params[f"ConvBlock_{i}"] = {
            "Conv_0": {
                # OIHW -> HWIO
                "kernel": np.ascontiguousarray(
                    conv["weight"].transpose(2, 3, 1, 0).astype(np.float32)
                ),
                "bias": bias.astype(np.float32),
            }
        }
    perm = _nhwc_flatten_permutation(c_last, side, side)
    for j, lin in enumerate(hidden):
        params[f"MlpBlock_{j}"] = {
            "Dense_0": dense(lin, perm if j == 0 else None)
        }
    params["Dense_0"] = dense(head, perm if not hidden else None)

    _check_structure(cfg, params, path)

    class_names = getattr(root, "class_names", None)
    if not isinstance(class_names, (list, tuple)) or not all(
        isinstance(c, str) for c in class_names
    ):
        class_names = ["benign", "malignant"]
    return cfg, params, list(class_names)


def _check_structure(cfg: ModelConfig, params: Any, path: str) -> None:
    """Shape-only init of the target model (no compile, no device) and
    exact tree/shape comparison with the imported params."""
    import jax
    import jax.numpy as jnp
    from flax import traverse_util

    from skin_image_analysis_tpu.models.cnn import build_model

    model = build_model(cfg)
    expect = jax.eval_shape(
        model.init,
        jax.random.PRNGKey(0),
        jnp.zeros((1, cfg.image_size, cfg.image_size, cfg.in_channels),
                  jnp.float32),
    )["params"]
    want = {
        k: v.shape for k, v in traverse_util.flatten_dict(expect).items()
    }
    got = {
        k: np.shape(v) for k, v in traverse_util.flatten_dict(params).items()
    }
    if want != got:
        missing = sorted(set(want) - set(got))
        extra = sorted(set(got) - set(want))
        wrong = sorted(
            k for k in set(want) & set(got) if want[k] != got[k]
        )
        raise TorchPickleError(
            f"{path}: imported params do not match the rebuilt model: "
            f"missing={missing} extra={extra} shape-mismatch="
            f"{[(k, got[k], want[k]) for k in wrong]}"
        )


def import_reference_experiment(
    src_folder: str, out_folder: str, model_name: str = "session_model.pth"
) -> dict:
    """Convert a whole reference results folder into one of ours:

    - ``session_model.pth`` → ``session_model.msgpack`` (+ a
      ``train_config.json`` carrying the pickled class names);
    - the frozen split CSVs and every ``*.json`` epoch-record file copy
      over verbatim (same filenames — the analysis layer stitches them
      by timestamp exactly as it does for native runs).

    Returns a summary dict (architecture, params, files copied).
    """
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

    pth = os.path.join(src_folder, model_name)
    if not os.path.exists(pth):
        raise TorchPickleError(f"{pth}: no model file in {src_folder}")
    cfg, params, class_names = import_reference_model(pth)

    os.makedirs(out_folder, exist_ok=True)
    ckpt_lib.save_model(
        os.path.join(out_folder, ckpt_lib.MODEL_FILENAME), cfg, params
    )
    with open(os.path.join(out_folder, "train_config.json"), "w") as f:
        json.dump(
            {
                "class_names": class_names,
                "image_size": cfg.image_size,
                "imported_from": os.path.abspath(pth),
            },
            f, indent=2,
        )

    copied: list[str] = []
    for name in ("session_train.csv", "session_test.csv"):
        src = os.path.join(src_folder, name)
        if os.path.exists(src):
            shutil.copy2(src, os.path.join(out_folder, name))
            copied.append(name)
    for src in sorted(glob.glob(os.path.join(src_folder, "*.json"))):
        name = os.path.basename(src)
        dst = os.path.join(out_folder, name)
        if not os.path.exists(dst):
            shutil.copy2(src, dst)
            copied.append(name)

    n_params = sum(
        int(np.prod(np.shape(v)))
        for v in _flat_values(params)
    )
    return {
        "model": ckpt_lib.MODEL_FILENAME,
        "conv_features": list(cfg.conv_features),
        "first_kernel": cfg.first_kernel,
        "kernel": cfg.kernel,
        "linear_features": list(cfg.linear_features),
        "dropout": list(cfg.dropout),
        "num_classes": cfg.num_classes,
        "image_size": cfg.image_size,
        "class_names": class_names,
        "param_count": n_params,
        "copied": copied,
    }


def _flat_values(tree: Any):
    if isinstance(tree, dict):
        for v in tree.values():
            yield from _flat_values(v)
    else:
        yield tree
