#!/usr/bin/env python
"""Explainability CLI — reference surface (tone_bias_explain.py:44-211)::

    python cli/tone_bias_explain.py <image root> <experiment folder>
        [--method ig|saliency|smoothgrad|gradcam] [--n-images N] [--steps N]

Loads the experiment's test split + model, attributes the first N test
images at their predicted class, and saves original/heat/blended triptychs
to ``<experiment>/explain/``. Unlike the reference (separate conda env,
CPU-forced Captum, 3-batch cap at batch 2), this runs on the accelerator
with the whole image batch attributed in one compiled program.
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv, {"method": "ig", "n-images": 6, "steps": 200},
        bool_flags={"best", "bench"},
    )
    if len(positional) != 2:
        print("Usage: <root directory of ISIC images> <experiment folder> "
              "[--method ig|saliency|smoothgrad|gradientshap|occlusion|gradcam] [--n-images N] [--steps N] [--bench]")
        return 1
    root, folder = positional
    method = opts["method"]
    n_images = opts["n-images"]
    n_steps = opts["steps"]

    import jax  # noqa: E402
    import jax.numpy as jnp  # noqa: E402

    from skin_image_analysis_tpu.data import LesionTable  # noqa: E402
    from skin_image_analysis_tpu.data.loader import HostImageStore  # noqa: E402
    from skin_image_analysis_tpu.explain import (  # noqa: E402
        grad_cam,
        integrated_gradients,
        saliency,
        smoothgrad,
    )
    from skin_image_analysis_tpu.explain.viz import (  # noqa: E402
        visualize_attribution_triptych,
    )
    from skin_image_analysis_tpu.models.cnn import build_model  # noqa: E402
    from skin_image_analysis_tpu.train import checkpoint as ckpt_lib  # noqa: E402

    test_df = pd.read_csv(os.path.join(folder, "session_test.csv"), index_col=0)
    from skin_image_analysis_tpu.cli._common import model_file

    model_cfg, loaded = ckpt_lib.load_model(
        model_file(folder, best=opts["best"])
    )
    params, batch_stats = ckpt_lib.split_variables(loaded)
    variables = {"params": params}
    if batch_stats is not None:
        variables["batch_stats"] = batch_stats
    model = build_model(model_cfg)
    table = LesionTable(test_df.head(n_images), root)
    store = HostImageStore(table, canonical_size=model_cfg.image_size)

    x01 = jnp.asarray(store.images.astype(np.float32) / 255.0)
    x = x01
    # honor the folder's model-input convention (ImageNet-normalized
    # transfer runs, imported artifacts with a generic affine) — the
    # attributions/forwards run on the model's input; the triptych keeps
    # rendering the [0,1] image
    from skin_image_analysis_tpu.cli._common import input_convention
    from skin_image_analysis_tpu.ops.preprocess import (
        IMAGENET_MEAN,
        IMAGENET_STD,
    )

    norm, affine = input_convention(folder)
    if norm:
        x = (x - jnp.asarray(IMAGENET_MEAN)) / jnp.asarray(IMAGENET_STD)
    elif affine is not None:
        x = x * jnp.asarray(affine[0]) + jnp.asarray(affine[1])
    log_probs = model.apply(variables, x, train=False)
    probs = np.exp(np.asarray(log_probs))  # softmax via exp of log-probs
    preds = jnp.argmax(log_probs, axis=-1)

    if batch_stats is None:
        apply_fn = model.apply
    else:
        # shim: gradient methods differentiate w.r.t. params only; merge
        # the (constant) BN statistics into every apply
        def apply_fn(v, *args, **kw):
            return model.apply({**v, "batch_stats": batch_stats}, *args, **kw)

    def compute():
        if method == "ig":
            return integrated_gradients(apply_fn, params, x, preds,
                                        n_steps=n_steps)
        elif method == "saliency":
            return saliency(apply_fn, params, x, preds)
        elif method == "smoothgrad":
            return smoothgrad(apply_fn, params, x, preds, jax.random.key(0))
        elif method == "gradientshap":
            from skin_image_analysis_tpu.explain import gradient_shap

            return gradient_shap(
                apply_fn, params, x, preds, jax.random.key(0),
                n_steps=n_steps
            )
        elif method == "occlusion":
            from skin_image_analysis_tpu.explain import occlusion_map

            patch = max(4, x.shape[1] // 7)
            occ = np.asarray(
                occlusion_map(apply_fn, params, x, preds,
                              patch_size=patch, stride=max(2, patch // 2))
            )
            return jax.image.resize(
                jnp.asarray(occ)[..., None],
                (occ.shape[0], x.shape[1], x.shape[2], 1),
                method="bilinear",
            )
        elif method == "gradcam":
            from skin_image_analysis_tpu.explain import grad_cam_gap_head

            if batch_stats is None and hasattr(model, "conv_features"):
                cam = np.asarray(grad_cam(model, params, x, preds))
            else:
                cam = np.asarray(grad_cam_gap_head(model, variables, x,
                                                   preds))
            # upsample heatmap to image size, single channel
            return jax.image.resize(
                jnp.asarray(cam)[..., None],
                (cam.shape[0], x.shape[1], x.shape[2], 1),
                method="bilinear",
            )
        raise SystemExit(f"unknown method {method!r}")

    if opts["bench"]:
        # through the remote relay block_until_ready returns early —
        # the np.asarray readback is the only reliable fence, and the
        # fetched attribution is what a user actually consumes
        import json as _json
        import time as _time

        t0 = _time.perf_counter()
        attr = np.asarray(compute())
        compile_s = _time.perf_counter() - t0
        iters = 3
        t0 = _time.perf_counter()
        for _ in range(iters):
            attr = np.asarray(compute())
        batch_s = (_time.perf_counter() - t0) / iters
        print(_json.dumps({
            "method": method, "n_images": int(n_images),
            "steps": int(n_steps), "image_size": model_cfg.image_size,
            "model": model_cfg.name,
            "compile_s": round(compile_s - batch_s, 1),
            "s_per_batch": round(batch_s, 3),
            "img_per_min": round(n_images / batch_s * 60, 1),
        }), flush=True)
    else:
        attr = compute()

    out_dir = os.path.join(folder, "explain")
    os.makedirs(out_dir, exist_ok=True)
    attr = np.asarray(attr)
    for i in range(len(table)):
        inst = table.instance(i)
        pred_name = table.class_names[int(preds[i])]
        title = (
            f"{inst['image_name']} pred={pred_name} "
            f"p={probs[i][int(preds[i])]:.2f} actual={inst['benign_malignant']} "
            f"tone={inst['skin_tone']}"
        )
        path = os.path.join(out_dir, f"{method}_{inst['image_name']}.png")
        visualize_attribution_triptych(
            np.asarray(x01[i]), attr[i], title=title, save_path=path
        )
        print(f"wrote {path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
