#!/usr/bin/env python
"""Training/inference throughput for the transfer-model families
(ResNet-50, Xception — the reference's CNNTrial.py / jgi_ham_2018_tf
backbones) on the real chip, through the production step machinery
(train.step.make_train_step / make_eval_step, bf16 compute, BN state).

Usage: python tools/bench_models.py [--freeze] [--scan K] [--int8]
       [model ...]
       (default models: resnet50 xception; --freeze benches the
       frozen-backbone transfer step — head-only backward; --scan K
       benches the classify trainer's production pipeline instead:
       uint8 canonical arena + crop/flip/ImageNet preprocess, per-batch
       vs K-steps-per-dispatch scanned programs
       (train.classify steps_per_dispatch); --int8 benches the SERVING
       programs instead — bf16 build_infer_fn vs the int8
       post-training-quantized program (serve/quantize.py), uint8
       pixels in, per-dispatch)

Prints one line per model: fwd+bwd step ms, train img/s/chip, eval
img/s/chip. Fences with value readbacks (block_until_ready returns
early through the axon relay)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv: list[str]) -> int:
    freeze = "--freeze" in argv
    int8_mode = "--int8" in argv
    argv = [a for a in argv if a not in ("--freeze", "--int8")]
    scan_k = 0
    if "--scan" in argv:
        i = argv.index("--scan")
        try:
            scan_k = int(argv[i + 1])
        except (IndexError, ValueError):
            print("usage: bench_models.py [--freeze] [--scan K] [model ...]"
                  " (--scan requires an integer)")
            return 1
        del argv[i : i + 2]
    names = argv or ["resnet50", "xception"]
    batch = int(os.environ.get("BENCH_BATCH", "128"))
    image = int(os.environ.get("BENCH_IMAGE", "224"))  # 512/1024 sweeps

    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import make_eval_step, make_train_step

    rng = np.random.default_rng(0)
    pixels = jnp.asarray(
        rng.normal(0.0, 1.0, (batch, image, image, 3)), jnp.float32
    )
    labels = jnp.asarray(rng.integers(0, 2, batch), jnp.int32)
    base = {
        "pixels": pixels,
        "label": labels,
        "row_id": jnp.arange(batch, dtype=jnp.int32),
        "valid": jnp.ones((batch,), bool),
    }

    pre_t = pre_e = None
    arena = None
    if scan_k:
        from skin_image_analysis_tpu.ops.preprocess import (
            AugmentConfig,
            make_preprocess_fn,
        )
        from skin_image_analysis_tpu.train.step import (
            make_multi_eval_step,
            make_multi_train_step,
        )

        canonical = 256
        pre_t = make_preprocess_fn(
            image, train=True,
            augment=AugmentConfig(random_crop=True, horizontal_flip=True),
            normalize_imagenet=True,
        )
        pre_e = make_preprocess_fn(image, train=False,
                                   normalize_imagenet=True)
        arena = jnp.asarray(
            rng.integers(0, 255, (batch, canonical, canonical, 3)),
            jnp.uint8,
        )
        base = dict(base)
        base["pixels"] = arena  # per-batch path: same uint8 + preprocess
        idx = jnp.tile(jnp.arange(batch, dtype=jnp.int32)[None],
                       (scan_k, 1))
        lbl = jnp.tile(labels[None], (scan_k, 1))
        vld = jnp.ones((scan_k, batch), bool)

    for name in names:
        cfg = ModelConfig(name=name, image_size=image,
                          compute_dtype="bfloat16", freeze_backbone=freeze)
        state, _ = create_train_state(
            cfg, OptimConfig(learning_rate=1e-3, optimizer="adamw"),
            jax.random.key(0), batch_size=batch,
        )
        if int8_mode:
            _bench_int8(name, cfg, state, batch, image, rng)
            continue
        step = make_train_step(preprocess_fn=pre_t)
        estep = make_eval_step(preprocess_fn=pre_e)

        t0 = time.perf_counter()
        state, m = step(state, base)
        float(m["loss"])
        compile_s = time.perf_counter() - t0

        iters = 10
        t0 = time.perf_counter()
        for _ in range(iters):
            state, m = step(state, base)
        float(m["loss"])
        train_ms = (time.perf_counter() - t0) / iters * 1e3

        out = estep(state.params, state.apply_fn, base,
                    batch_stats=state.batch_stats)
        np.asarray(out["pred"])  # readback fence (tiny i32 vector)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = estep(state.params, state.apply_fn, base,
                        batch_stats=state.batch_stats)
        np.asarray(out["pred"])
        eval_ms = (time.perf_counter() - t0) / iters * 1e3

        n_params = sum(x.size for x in jax.tree.leaves(state.params))
        tag = f"{name}+freeze" if freeze else name
        # analytic contraction FLOPs (jaxpr walk — the ACTUAL executed
        # dot/conv MACs, no device compile) -> MFU at the measured rate;
        # train ~ 3x forward, eval = forward (bench.py convention)
        from skin_image_analysis_tpu.utils.flops import (
            forward_flops_per_img,
        )

        fwd_flops = forward_flops_per_img(cfg)
        peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
        train_mfu = (batch / train_ms * 1e3) * 3.0 * fwd_flops / peak
        eval_mfu = (batch / eval_ms * 1e3) * fwd_flops / peak
        print(
            f"{tag}: params={n_params / 1e6:.1f}M compile={compile_s:.1f}s "
            f"train {train_ms:.1f} ms/step ({batch / train_ms * 1e3:,.0f} "
            f"img/s/chip, mfu {train_mfu:.3f})  eval {eval_ms:.1f} ms "
            f"({batch / eval_ms * 1e3:,.0f} img/s/chip, mfu {eval_mfu:.3f})"
            f"  fwd {fwd_flops / 1e9:.2f} GFLOP/img  B={batch}@{image}"
        )

        if scan_k:
            # scanned programs: K steps / K eval batches per dispatch
            # (the warm 1-step compile above also makes these scans
            # compile fast through the relay — docs/PERF.md §Cold start)
            mstep = make_multi_train_step(scan_k, preprocess_fn=pre_t)
            meval = make_multi_eval_step(scan_k, preprocess_fn=pre_e)
            state, m = mstep(state, arena, idx, lbl, vld)
            float(m["loss"][0])
            iters = max(2, 10 // scan_k)
            t0 = time.perf_counter()
            for _ in range(iters):
                state, m = mstep(state, arena, idx, lbl, vld)
            float(m["loss"][0])
            scan_train_ms = (
                (time.perf_counter() - t0) / (iters * scan_k) * 1e3
            )
            out = meval(state.params, state.apply_fn, arena, idx, idx,
                        vld, state.batch_stats)
            np.asarray(out["pred"])
            t0 = time.perf_counter()
            for _ in range(iters):
                out = meval(state.params, state.apply_fn, arena, idx,
                            idx, vld, state.batch_stats)
            np.asarray(out["pred"])
            scan_eval_ms = (
                (time.perf_counter() - t0) / (iters * scan_k) * 1e3
            )
            print(
                f"{tag} scan-of-{scan_k}: train {scan_train_ms:.1f} "
                f"ms/step ({batch / scan_train_ms * 1e3:,.0f} img/s/chip)"
                f"  eval {scan_eval_ms:.1f} ms "
                f"({batch / scan_eval_ms * 1e3:,.0f} img/s/chip)"
            )
    return 0


def _bench_int8(name, cfg, state, batch, image, rng):
    """Serving comparison: the bf16 inference program vs the int8
    post-training-quantized one (serve/quantize.py), both uint8 pixels →
    eval preprocess → forward → {log_probs, pred, p_malignant}."""
    import time

    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.serve.export import build_infer_fn
    from skin_image_analysis_tpu.serve.quantize import (
        build_infer_fn_quantized,
        quantize_model,
    )

    pixels = jnp.asarray(
        rng.integers(0, 255, (batch, image, image, 3)), jnp.uint8)
    calib = rng.integers(0, 255, (64, image, image, 3)).astype(np.uint8)
    norm = name not in ("skin_cancer_list", "skin_cancer")

    t0 = time.perf_counter()
    qtree = quantize_model(cfg, state.params, calib,
                           normalize_imagenet=norm,
                           batch_stats=state.batch_stats)
    calib_s = time.perf_counter() - t0
    q_bytes = sum(op["kernel_q"].nbytes for op in qtree["ops"]
                  if "kernel_q" in op)
    f_bytes = 4 * sum(x.size for x in jax.tree.leaves(state.params))

    results = {}
    for tag, fn in (
        ("bf16", build_infer_fn(cfg, state.params, state.batch_stats,
                                normalize_imagenet=norm)),
        ("int8", build_infer_fn_quantized(qtree)),
    ):
        jfn = jax.jit(fn)
        t0 = time.perf_counter()
        out = jfn(pixels)
        np.asarray(out["pred"])  # readback fence (tiny i32 vector)
        compile_s = time.perf_counter() - t0
        iters = 20
        t0 = time.perf_counter()
        for _ in range(iters):
            out = jfn(pixels)
        np.asarray(out["pred"])
        ms = (time.perf_counter() - t0) / iters * 1e3
        results[tag] = ms
        print(f"{name} serve[{tag}]: {ms:.2f} ms/batch "
              f"({batch / ms * 1e3:,.0f} img/s/chip) "
              f"compile={compile_s:.1f}s B={batch}@{image}")
    print(f"{name} int8/bf16 speedup: "
          f"{results['bf16'] / results['int8']:.2f}x  weights "
          f"{f_bytes / 1e6:.1f} -> {q_bytes / 1e6:.1f} MB "
          f"(calib {calib_s:.1f}s)")


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1:]))
