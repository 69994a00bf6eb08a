#!/usr/bin/env python
"""Dump + summarize the optimized HLO of the production train step.

xprof hangs through the axon relay (docs/PERF.md), so fusion-boundary
analysis happens on the compiled module text instead: this prints every
top-level instruction of the entry computation whose output tensor is
large, sorted by bytes, with its opcode — the HBM writes the step performs.
Reading the list against the hand roofline shows which materializations
XLA kept that the design intended to fuse away.

Usage: python tools/hlo_dump.py [fwd|fwdbwd|step] [--batch-size N]
       [--out /tmp/step.hlo]
"""

from __future__ import annotations

import argparse
import re
import sys


_DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1, "u8": 1,
    "pred": 1, "s64": 8, "u64": 8, "f64": 8, "s16": 2, "u16": 2,
}


def tensor_bytes(shape_str: str) -> int:
    """bytes of one 'dtype[d0,d1,...]' shape string (0 for tuples/tokens)."""
    m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
    if not m:
        return 0
    dt, dims = m.groups()
    if dt not in _DTYPE_BYTES:
        return 0
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * _DTYPE_BYTES[dt]


def summarize(hlo_text: str, top: int = 40) -> list[tuple[int, str, str]]:
    """(bytes, opcode, line-head) for instructions that materialize:
    ENTRY plus loop/branch bodies — fusion bodies (not materialized)
    are skipped."""
    rows = []
    include = False
    for line in hlo_text.splitlines():
        if line.startswith("ENTRY "):
            include = True
            continue
        if line.startswith("%"):  # new computation definition
            include = not line.startswith("%fused_computation")
            continue
        if include and line.startswith("}"):
            include = False
        if not include:
            continue
        m = re.match(
            r"\s+(%?[\w.\-]+)\s*=\s*"
            r"((?:\w+\[[^\]]*\](?:\{[^}]*\})?|\([^=]*?\)))\s*"
            r"([\w\-]+)\(",
            line,
        )
        if not m:
            continue
        name, shape, op = m.groups()
        # sum every dtype[dims] in the (possibly tuple) shape string
        nbytes = sum(tensor_bytes(s)
                     for s in re.findall(r"\w+\[[\d,]*\]", shape))
        if op in ("parameter", "constant", "get-tuple-element", "tuple"):
            continue
        rows.append((nbytes, op, line.strip()[:160]))
    rows.sort(reverse=True)
    return rows[:top]


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("stage", nargs="?", default="fwdbwd",
                   choices=["fwd", "fwdbwd", "step", "multi"])
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--out", default="")
    p.add_argument("--top", type=int, default=40)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.ops.preprocess import (
        AugmentConfig, make_preprocess_fn,
    )
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import make_train_step

    B, canonical, image_size = args.batch_size, 256, 224
    model_cfg = ModelConfig(compute_dtype="bfloat16")
    state, _ = create_train_state(
        model_cfg, OptimConfig(learning_rate=1e-5, moment_dtype="bfloat16"),
        jax.random.key(0), batch_size=B,
    )
    pre = make_preprocess_fn(
        image_size, train=True,
        augment=AugmentConfig(brightness=0.1, contrast=0.1, saturation=0.1),
        layout="planar", pallas="on", out_dtype="bfloat16",
    )
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(
            rng.integers(0, 255, (B, 3, canonical, canonical)), jnp.uint8),
        "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
        "row_id": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), bool),
    }

    if args.stage == "step":
        fn = make_train_step(preprocess_fn=pre)
        lowered = fn.lower(state, batch)
    elif args.stage == "multi":
        from skin_image_analysis_tpu.train.step import make_multi_train_step

        k = 8
        arena_n = 512
        arena = jnp.zeros((arena_n, 3, canonical, canonical), jnp.uint8)
        idx = jnp.zeros((k, B), jnp.int32)
        lb = jnp.zeros((k, B), jnp.int32)
        vd = jnp.ones((k, B), bool)
        fn = make_multi_train_step(k, preprocess_fn=pre)
        lowered = fn.lower(state, arena, idx, lb, vd)
    else:
        key = jax.random.key(1)

        def loss_fn(params, px, key):
            pixels = pre(px, key)
            log_probs = state.apply_fn(
                {"params": params}, pixels, train=True,
                rngs={"dropout": key},
            )
            picked = jnp.take_along_axis(
                log_probs, batch["label"][:, None], axis=-1)[:, 0]
            return -jnp.mean(picked)

        if args.stage == "fwd":
            fn = jax.jit(loss_fn)
        else:
            fn = jax.jit(jax.value_and_grad(loss_fn))
        lowered = fn.lower(state.params, batch["pixels"], key)

    compiled = lowered.compile()
    text = compiled.as_text()
    if args.out:
        with open(args.out, "w") as f:
            f.write(text)
        print(f"wrote {len(text)} bytes to {args.out}", file=sys.stderr)

    total = 0
    for nbytes, op, head in summarize(text, args.top):
        total += nbytes
        print(f"{nbytes / 1e6:10.1f} MB  {op:<12} {head}")
    print(f"\n(top-{args.top} output bytes total: {total / 1e9:.2f} GB)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
