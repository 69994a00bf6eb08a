#!/usr/bin/env python
"""Headline benchmark: training throughput (images/sec/chip) on a
HAM-2018-style workload — the production SkinCancerListModel at 224x224,
through the production hot path: planar uint8 device arena, Pallas fused
preprocess + augmentation inside the step, pool-phase-packed first conv
block + selector-VJP pools, bf16 compute with both adam moments stored
bf16 (OptimConfig moment_dtype + nu_dtype, exposed on the train CLI), and
multi-step dispatch (train.step.make_multi_train_step — the same program
run_training uses with DataConfig.steps_per_dispatch).

Baseline: the reference trains at ~6 img/s on Apple M2 Max MPS (derived in
SURVEY.md §6 from tone_bias_train.py:336 / tone_bias_dataset.py:607:
2,536 imgs at ~7 min/epoch). ``vs_baseline`` = ours / 6.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np


def _train_flops_per_img(model_cfg, image_size: int) -> float:
    """Analytic training FLOPs per image for the flagship conv stack
    (contraction terms only — elementwise/pool/optimizer work is not
    counted, so the returned MFU is the honest 'useful matmul FLOPs'
    form). Forward: 2 MACs/FLOP over each conv and dense; training ≈
    3x forward (activation + weight gradient matmuls). docs/PERF.md's
    XLA cost-model figure (1.024 TFLOP at B=256 → 4.0 GFLOP/img)
    cross-checks this within its fusion double-counting."""
    s = image_size
    c_in = 3
    fwd = 0.0
    for i, c_out in enumerate(model_cfg.conv_features):
        k = model_cfg.first_kernel if i == 0 else model_cfg.kernel
        fwd += 2.0 * s * s * c_out * k * k * c_in  # SAME stride-1 conv
        s //= 2  # 2x2 pool
        c_in = c_out
    feats = s * s * c_in
    for width in model_cfg.linear_features:
        fwd += 2.0 * feats * width
        feats = width
    fwd += 2.0 * feats * model_cfg.num_classes
    return 3.0 * fwd


def main() -> int:
    from skin_image_analysis_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.ops.preprocess import (
        AugmentConfig,
        make_preprocess_fn,
    )
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import (
        make_multi_train_step,
        make_train_step,
    )

    # BENCH_BATCH / BENCH_K env overrides exist for sweeps; the defaults
    # are the measured-best operating point on v5e.
    batch_size = int(os.environ.get("BENCH_BATCH", "256"))
    image_size = 224
    canonical = 256
    k = int(os.environ.get("BENCH_K", "32"))  # steps per dispatch
    # (same-window ladder: k=16 11,688 vs k=32 11,917 img/s (+2.0%) —
    # DataConfig.steps_per_dispatch; CLI default stays 8 because small
    # cohorts (~10 batches/epoch) would waste k-padding)
    arena_n = 2048
    n_devices = len(jax.devices())

    from skin_image_analysis_tpu.models.cnn import stem_wants_s2d

    stem = os.environ.get("BENCH_STEM", "auto")  # auto|phase|s2d sweeps
    model_cfg = ModelConfig(compute_dtype="bfloat16", stem=stem)
    state, _ = create_train_state(
        model_cfg,
        OptimConfig(learning_rate=1e-5, moment_dtype="bfloat16",
                    nu_dtype="bfloat16"),
        jax.random.key(0),
        batch_size=batch_size,
    )
    pre = make_preprocess_fn(
        image_size, train=True,
        augment=AugmentConfig(brightness=0.1, contrast=0.1, saturation=0.1),
        layout="planar", pallas="on", out_dtype="bfloat16",
        space_to_depth=stem_wants_s2d(model_cfg),
    )
    multi_step = make_multi_train_step(k, preprocess_fn=pre)

    rng = np.random.default_rng(0)
    # decode-once planar uint8 arena, committed to HBM exactly once — the
    # production data path (train/loop.py device_cache)
    arena = jax.device_put(
        jnp.asarray(
            rng.integers(0, 255, (arena_n, 3, canonical, canonical)),
            jnp.uint8,
        )
    )
    labels_all = rng.integers(0, 2, arena_n).astype(np.int32)

    def super_step_args(seed):
        r = np.random.default_rng(seed)
        idx = r.integers(0, arena_n, (k, batch_size)).astype(np.int32)
        return (
            jnp.asarray(idx),
            jnp.asarray(labels_all[idx]),
            jnp.ones((k, batch_size), bool),
        )

    # Compile ORDER matters through the remote relay (docs/PERF.md §Cold
    # start): the scan-of-k program compiled COLD measures 500 to >900 s
    # (timeouts in degraded windows), but ~11-20 s when the 1-step train
    # program compiled immediately before in the same process. Warm the
    # 1-step program first, exactly as run_training does.
    one_step = make_train_step(preprocess_fn=pre)
    warm_state = jax.tree.map(
        lambda x: x.copy() if hasattr(x, "copy") else x, state
    )
    warm_batch = {
        "pixels": jnp.asarray(
            rng.integers(0, 255, (batch_size, 3, canonical, canonical)),
            jnp.uint8,
        ),
        "label": jnp.zeros((batch_size,), jnp.int32),
        "row_id": jnp.zeros((batch_size,), jnp.int32),
        "valid": jnp.ones((batch_size,), bool),
    }
    warm_state, m1 = one_step(warm_state, warm_batch)
    float(m1["loss"])
    del warm_state, warm_batch

    args = super_step_args(1)
    # warmup / compile; sync via value readback (block_until_ready returns
    # early through the axon relay, so a host readback is the only
    # reliable fence)
    for _ in range(2):
        state, metrics = multi_step(state, arena, *args)
    float(metrics["loss"][-1])

    iters = 6  # super-steps per window (6 * k train steps)
    best = float("inf")
    for w in range(2):  # two timed windows; keep the better (less jitter)
        start = time.perf_counter()
        for i in range(iters):
            state, metrics = multi_step(state, arena, *super_step_args(w * iters + i))
        float(metrics["loss"][-1])  # forces completion of the whole chain
        best = min(best, time.perf_counter() - start)
    elapsed = best

    imgs_per_sec = batch_size * k * iters / elapsed
    per_chip = imgs_per_sec / n_devices
    baseline = 6.0  # reference img/s (SURVEY.md §6)
    # MFU anchor: contraction FLOPs per image vs the chip's bf16 peak
    # (v5e ≈ 197 TFLOP/s bf16; override for other chip classes)
    flops_per_img = _train_flops_per_img(model_cfg, image_size)
    peak = float(os.environ.get("BENCH_PEAK_TFLOPS", "197")) * 1e12
    print(
        json.dumps(
            {
                "metric": "train_images_per_sec_per_chip",
                "value": round(per_chip, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(per_chip / baseline, 2),
                "model_flops_per_img": round(flops_per_img),
                "mfu": round(per_chip * flops_per_img / peak, 4),
                "peak_tflops_assumed": peak / 1e12,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
