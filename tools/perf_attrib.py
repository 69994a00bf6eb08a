#!/usr/bin/env python
"""Perf attribution rig for the production train step.

xprof hangs through the axon remote relay in this environment, so this is
the replacement: host-side micro-timing of separately jitted sub-programs
with value-readback fences (``jax.block_until_ready`` returns early through
the relay; only a host readback is a reliable fence), plus XLA's own
compiled cost model.

Stages (select by name on argv; default runs the cheap core set):

  step     production train step (B, 224^2, fused augment), per-dispatch
  scan     K train steps chained inside ONE program (lax.scan) -> isolates
           per-dispatch overhead: overhead = t(step) - t(scan)/K
  stepp    production step with the planar Pallas preprocess (+ prep/
           fwdp/fwdbwdp sub-programs)
  fwd      forward + loss only (no grad)
  fwdbwd   value_and_grad (no optimizer update)
  opt      optimizer update only (fixed grads)
  pre      preprocess (uint8 -> augmented f32) only
  blocks   per-layer forward timings (conv blocks / flatten+MLP)
  pools2   fused relu+pool selector-VJP vs stock pool micro-bench
  pconv0   fused Pallas phase-conv0 vs the XLA phase-packed lowering
  donate   production step with vs without donate_argnums (buffer
           aliasing contribution; measured parity — docs/PERF.md)
  cost     XLA cost_analysis of the compiled full step (flops, bytes)

Every distinct program costs ~30-90s to compile through the relay; the
default set is chosen to answer "where do the 33 ms go" with the fewest
programs. Results print as one JSON line per stage.

Usage:  python tools/perf_attrib.py [stage ...] [--batch-size N] [--iters N]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from functools import partial

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _fence(x) -> float:
    """Force completion of the async chain by reading ONE value back.
    The slice happens on device — ``np.asarray(leaf)`` would fetch the
    whole tensor over the ~100 MB/s link, which for a 200 MB activation
    costs 1000x the program being timed."""
    import jax

    leaf = jax.tree.leaves(x)[0]
    if hasattr(leaf, "device"):  # jax array: slice on device
        return float(leaf.reshape(-1)[0])
    return float(np.asarray(leaf).reshape(-1)[0])


def _time_call(fn, make_args, iters: int, warmup: int = 2) -> float:
    """Median-of-3-windows ms per call. ``make_args()`` returns fresh args
    (needed when the callee donates)."""
    args = make_args()
    for _ in range(warmup):
        out = fn(*args)
        args = _rebind(out, args)
    _fence(out)
    times = []
    for _ in range(3):
        args0 = make_args()
        start = time.perf_counter()
        a = args0
        for _ in range(iters):
            out = fn(*a)
            a = _rebind(out, a)
        _fence(out)
        times.append((time.perf_counter() - start) / iters * 1e3)
    return sorted(times)[1]


def _rebind(out, args):
    """If the first output looks like the first arg (state chaining), thread
    it; else reuse args (non-donating fns)."""
    if isinstance(out, tuple) and type(out[0]) is type(args[0]):
        return (out[0],) + tuple(args[1:])
    return args


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("stages", nargs="*",
                   default=["step", "scan", "fwd", "fwdbwd", "opt", "pre"])
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--iters", type=int, default=20)
    p.add_argument("--scan-len", type=int, default=16)
    p.add_argument("--moments", default="", help="adam moment dtype override")
    p.add_argument("--pre-dtype", default="",
                   help="Pallas preprocess output dtype (stepp stages)")
    p.add_argument("--image-size", type=int, default=224,
                   help="model input H=W (canonical decode = max(256, this)"
                        " — matches the train CLI's rule)")
    p.add_argument("--model", default="skin_cancer_list",
                   help="registry family to attribute (step/scan/fwd/"
                        "fwdbwd/opt/pre are model-generic; blocks/"
                        "pools2/pconv0/stepp are flagship-only)")
    args = p.parse_args()
    stages = args.stages or ["step", "scan", "fwd", "fwdbwd", "opt", "pre"]

    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.ops.preprocess import (
        AugmentConfig, make_preprocess_fn,
    )
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import make_train_step

    B, image_size = args.batch_size, args.image_size
    canonical = max(256, image_size)
    results: dict[str, float] = {}

    flagship_only = {"blocks", "pools2", "pconv0", "stepp"}
    if args.model != "skin_cancer_list" and flagship_only & set(stages):
        raise SystemExit(
            f"stages {sorted(flagship_only & set(stages))} probe the "
            "flagship's layer structure; rerun them without "
            f"--model {args.model}"
        )
    model_cfg = ModelConfig(name=args.model, compute_dtype="bfloat16",
                            image_size=image_size)
    state, model = create_train_state(
        model_cfg,
        OptimConfig(learning_rate=1e-5,
                    moment_dtype=args.moments or None),
        jax.random.key(0),
        batch_size=B,
    )
    pre = make_preprocess_fn(
        image_size, train=True,
        augment=AugmentConfig(brightness=0.1, contrast=0.1, saturation=0.1),
    )
    rng = np.random.default_rng(0)
    batch = {
        "pixels": jnp.asarray(
            rng.integers(0, 255, (B, canonical, canonical, 3)), jnp.uint8),
        "label": jnp.asarray(rng.integers(0, 2, B), jnp.int32),
        "row_id": jnp.arange(B, dtype=jnp.int32),
        "valid": jnp.ones((B,), bool),
    }
    batch = jax.device_put(batch)
    state = jax.device_put(state)

    def fresh_state():
        return jax.tree.map(lambda x: x.copy() if hasattr(x, "copy") else x,
                            state)

    def emit(name, ms, note=""):
        results[name] = ms
        print(json.dumps({"stage": name, "ms": round(ms, 3),
                          "img_per_s": round(B / ms * 1e3, 1),
                          "note": note}), flush=True)

    # ---- full production step, per-dispatch ----
    if "step" in stages or "scan" in stages:
        step = make_train_step(preprocess_fn=pre)

    # ---- production step with the planar Pallas preprocess ----
    if "stepp" in stages:
        from skin_image_analysis_tpu.ops.preprocess import AugmentConfig
        pre_p = make_preprocess_fn(
            image_size, train=True,
            augment=AugmentConfig(
                brightness=0.1, contrast=0.1, saturation=0.1),
            layout="planar", pallas="on",
            out_dtype=args.pre_dtype or None,
        )
        batch_p = dict(batch)
        batch_p["pixels"] = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (B, 3, canonical, canonical)), jnp.uint8)
        batch_p = jax.device_put(batch_p)
        step_p = make_train_step(preprocess_fn=pre_p)
        ms = _time_call(step_p, lambda: (fresh_state(), batch_p), args.iters)
        emit("stepp", ms, "planar batch + Pallas fused preprocess in-step")

        @jax.jit
        def pre_p_only(px, key):
            out = pre_p(px, key)
            return jnp.sum(out[:, ::64, ::64, :])

        key = jax.random.key(2)
        ms = _time_call(
            pre_p_only, lambda: (batch_p["pixels"], key), args.iters)
        emit("prep", ms, "Pallas fused preprocess standalone")

        @jax.jit
        def fwd_p(params, px, key):
            pixels = pre_p(px, key)
            log_probs = state.apply_fn(
                {"params": params}, pixels, train=True,
                rngs={"dropout": key},
            )
            picked = jnp.take_along_axis(
                log_probs, batch["label"][:, None], axis=-1)[:, 0]
            return -jnp.mean(picked)

        ms = _time_call(
            fwd_p, lambda: (state.params, batch_p["pixels"], key),
            args.iters)
        emit("fwdp", ms, "planar pre + fwd + loss (production)")

        @jax.jit
        def fwdbwd_p(params, px, key):
            def loss_fn(p):
                pixels = pre_p(px, key)
                log_probs = state.apply_fn(
                    {"params": p}, pixels, train=True,
                    rngs={"dropout": key},
                )
                picked = jnp.take_along_axis(
                    log_probs, batch["label"][:, None], axis=-1)[:, 0]
                return -jnp.mean(picked)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            # grads MUST be program outputs or XLA dead-code-eliminates
            # the whole backward (burned once: fwdbwdp == fwdp)
            return loss, grads

        def run_p(params, px, key):
            loss, _grads = fwdbwd_p(params, px, key)
            return loss

        ms = _time_call(
            run_p, lambda: (state.params, batch_p["pixels"], key),
            args.iters)
        emit("fwdbwdp", ms, "planar pre + fwd + bwd (production)")

    if "step" in stages:
        ms = _time_call(step, lambda: (fresh_state(), batch), args.iters)
        emit("step", ms, "production train step, one dispatch per step")

    # ---- K steps inside one program ----
    if "scan" in stages:
        K = args.scan_len

        # inline step body (same math as make_train_step — the shared
        # _loss_and_metrics core, so it is model-generic) so scan traces it
        from skin_image_analysis_tpu.train.step import _loss_and_metrics

        def one_step(s, _):
            step_rng = jax.random.fold_in(s.rng, s.step)
            dropout_rng, aug_rng = jax.random.split(step_rng)
            grad_fn = jax.value_and_grad(
                partial(_loss_and_metrics, s.apply_fn), has_aux=True)
            (loss, (_c, _n, new_stats)), grads = grad_fn(
                s.params, s.batch_stats, batch, dropout_rng, None,
                pre, aug_rng)
            s = s.apply_gradients(grads)
            if new_stats is not None:
                s = s.replace(batch_stats=new_stats)
            return s, loss

        @partial(jax.jit, donate_argnums=(0,))
        def scan_steps(s):
            s, losses = jax.lax.scan(one_step, s, None, length=K)
            return s, losses[-1]

        ms = _time_call(scan_steps, lambda: (fresh_state(),), max(args.iters // 4, 3))
        emit("scan", ms / K, f"{K} steps in one program; per-step ms")

    # ---- forward only ----
    if "fwd" in stages or "fwdbwd" in stages:
        from skin_image_analysis_tpu.train.step import _loss_and_metrics

    if "fwd" in stages:
        @jax.jit
        def fwd(params, bstats, b, key):
            loss, _aux = _loss_and_metrics(
                state.apply_fn, params, bstats, b, key, None, pre, key)
            return loss

        key = jax.random.key(1)
        ms = _time_call(
            fwd, lambda: (state.params, state.batch_stats, batch, key),
            args.iters)
        emit("fwd", ms, "preprocess + forward + loss")

    # ---- forward + backward ----
    if "fwdbwd" in stages:
        @jax.jit
        def fwdbwd(params, bstats, b, key):
            grad_fn = jax.value_and_grad(
                partial(_loss_and_metrics, state.apply_fn), has_aux=True)
            (loss, _aux), grads = grad_fn(params, bstats, b, key, None,
                                          pre, key)
            return loss, grads

        key = jax.random.key(1)

        def run(params, bstats, b, key):
            loss, grads = fwdbwd(params, bstats, b, key)
            return loss

        ms = _time_call(
            run, lambda: (state.params, state.batch_stats, batch, key),
            args.iters)
        emit("fwdbwd", ms, "preprocess + forward + backward (no update)")

    # ---- optimizer update only ----
    if "opt" in stages:
        grads = jax.tree.map(jnp.ones_like, state.params)
        grads = jax.device_put(grads)

        @partial(jax.jit, donate_argnums=(0,))
        def opt_only(s, g):
            return s.apply_gradients(g), s.step

        n_par = sum(x.size for x in jax.tree.leaves(state.params))
        ms = _time_call(opt_only, lambda: (fresh_state(), grads), args.iters)
        emit("opt", ms, f"adam update, {n_par / 1e6:.1f}M params")

    # ---- preprocess only ----
    if "pre" in stages:
        @jax.jit
        def pre_only(px, key):
            out = pre(px, key)
            return jnp.sum(out[:, ::64, ::64, :])  # tiny reduction keeps it alive

        key = jax.random.key(2)
        ms = _time_call(pre_only, lambda: (batch["pixels"], key), args.iters)
        emit("pre", ms, "uint8 crop/flip/jitter/normalize")

    # ---- per-block fwd and fwd+bwd ----
    if "blocks" in stages:
        from skin_image_analysis_tpu.models.cnn import ConvBlock

        p = state.params
        rngx = np.random.default_rng(3)

        def rand(shape):
            return jnp.asarray(
                rngx.standard_normal(shape, np.float32), jnp.bfloat16)

        # (input side, in_ch, out_ch, kernel) per conv block — spatial
        # sides follow --image-size (s, s/2, s/4), as in the model
        s0 = image_size
        block_shapes = [
            (s0, 3, 32, 7), (s0 // 2, 32, 64, 3), (s0 // 4, 64, 128, 3),
        ]

        for i, (s_in, c_in, c_out, k) in enumerate(block_shapes):
            xin = rand((B, s_in, s_in, c_in))
            blk = ConvBlock(features=c_out, kernel=k)
            bp = {"params": p[f"ConvBlock_{i}"]}

            @jax.jit
            def blk_fwd(a, bp=bp, blk=blk):
                return jnp.sum(blk.apply(bp, a).astype(jnp.float32))

            ms = _time_call(blk_fwd, lambda xin=xin: (xin,), args.iters)
            emit(f"conv{i}_fwd", ms)

            @jax.jit
            def blk_fwdbwd(bp, a, blk=blk):
                def f(bp, a):
                    return jnp.sum(blk.apply(bp, a).astype(jnp.float32))

                loss, (gp, gx) = jax.value_and_grad(f, argnums=(0, 1))(bp, a)
                return loss + jnp.sum(gx.astype(jnp.float32)[:, ::37, ::37, :])

            ms = _time_call(
                blk_fwdbwd, lambda bp=bp, xin=xin: (bp, xin), args.iters)
            emit(f"conv{i}_fwdbwd", ms, "grads wrt params AND input")

        # max-pool alone (fwd+bwd) at each post-conv shape — isolates the
        # SelectAndScatter backward
        import flax.linen as nn

        for s_io, c in [(image_size, 32), (image_size // 2, 64),
                        (image_size // 4, 128)]:
            xin = rand((B, s_io, s_io, c))

            @jax.jit
            def pool_fwdbwd(a):
                def f(a):
                    y = nn.max_pool(a, (2, 2), strides=(2, 2))
                    return jnp.sum(y.astype(jnp.float32))

                loss, gx = jax.value_and_grad(f)(a)
                return loss + jnp.sum(gx.astype(jnp.float32)[:, ::37, ::37, :])

            ms = _time_call(pool_fwdbwd, lambda xin=xin: (xin,), args.iters)
            emit(f"pool{s_io}x{c}_fwdbwd", ms)

        # MLP stack (flatten -> 512 -> 256 -> head) fwd+bwd
        flat = rand((B, (s0 // 8) ** 2 * 128))
        mlp_params = {k: v for k, v in p.items() if not k.startswith("Conv")}

        @jax.jit
        def mlp_fwdbwd(mp, a):
            def f(mp, a):
                h = a
                import flax.linen as nn_
                from skin_image_analysis_tpu.models.cnn import MlpBlock
                for j in range(2):
                    h = MlpBlock(
                        features=(512, 256)[j], dropout=0.5
                    ).apply({"params": mp[f"MlpBlock_{j}"]}, h, train=False)
                h = nn_.Dense(2).apply({"params": mp["Dense_0"]}, h)
                return jnp.sum(nn_.log_softmax(h.astype(jnp.float32)))

            loss, gp = jax.value_and_grad(f)(mp, a)
            return loss

        ms = _time_call(
            mlp_fwdbwd, lambda: (mlp_params, flat), args.iters)
        emit("mlp_fwdbwd", ms, "flatten MLP + head, grads wrt params")

    # ---- pool variant micro-bench ----
    if "pools2" in stages:
        import flax.linen as nn

        from skin_image_analysis_tpu.ops.pooling import relu_max_pool_2x2

        rngx = np.random.default_rng(5)

        for s_io, c in [(image_size, 32), (image_size // 2, 64),
                        (image_size // 4, 128)]:
            xin = jnp.asarray(
                rngx.standard_normal((B, s_io, s_io, c), np.float32),
                jnp.bfloat16)

            @jax.jit
            def fused_fwd(a):
                return jnp.sum(
                    relu_max_pool_2x2(a).astype(jnp.float32)[:, ::37, ::37, :])

            ms = _time_call(fused_fwd, lambda xin=xin: (xin,), args.iters)
            emit(f"fusedpool{s_io}x{c}_fwd", ms)

            @jax.jit
            def fused_fwdbwd(a):
                def f(a):
                    return jnp.sum(relu_max_pool_2x2(a).astype(jnp.float32))

                loss, gx = jax.value_and_grad(f)(a)
                return loss + jnp.sum(gx.astype(jnp.float32)[:, ::37, ::37, :])

            ms = _time_call(fused_fwdbwd, lambda xin=xin: (xin,), args.iters)
            emit(f"fusedpool{s_io}x{c}_fwdbwd", ms)

            @jax.jit
            def stock_fwd(a):
                y = nn.max_pool(nn.relu(a), (2, 2), strides=(2, 2))
                return jnp.sum(y.astype(jnp.float32)[:, ::37, ::37, :])

            ms = _time_call(stock_fwd, lambda xin=xin: (xin,), args.iters)
            emit(f"stockpool{s_io}x{c}_fwd", ms)

    # ---- fused phase-conv0 Pallas kernel vs XLA packed path ----
    if "pconv0" in stages:
        if image_size != 224:
            raise SystemExit(
                "pconv0 compares the record 224-pinned Pallas phase-conv0 "
                "kernel (ops/pallas/convblock_kernel.py); rerun without "
                f"--image-size {image_size} or drop the pconv0 stage"
            )
        from skin_image_analysis_tpu.ops.pallas.convblock_kernel import (
            fused_phase_conv0,
        )
        from skin_image_analysis_tpu.ops.pooling import (
            phase_packed_conv_block,
        )

        rngx = np.random.default_rng(7)
        xp = jnp.asarray(
            rngx.standard_normal((B, 3, 224, 224), np.float32))
        xh = jnp.transpose(xp, (0, 2, 3, 1)).astype(jnp.bfloat16)
        w = jnp.asarray(
            rngx.standard_normal((7, 7, 3, 32), np.float32) * 0.1)
        bias = jnp.zeros((32,), jnp.float32)

        @jax.jit
        def pallas_fwd(xp, w, bias):
            return jnp.sum(
                fused_phase_conv0(xp, w, bias).astype(jnp.float32)
                [:, ::37, ::37, :])

        ms = _time_call(pallas_fwd, lambda: (xp, w, bias), args.iters)
        emit("pconv0_fwd", ms, "fused Pallas phase-conv0 fwd")

        @jax.jit
        def pallas_fwdbwd(xp, w, bias):
            def f(w, bias):
                return jnp.sum(
                    fused_phase_conv0(xp, w, bias).astype(jnp.float32))

            loss, g = jax.value_and_grad(f, argnums=(0, 1))(w, bias)
            return loss + jnp.sum(g[0].astype(jnp.float32))

        ms = _time_call(pallas_fwdbwd, lambda: (xp, w, bias), args.iters)
        emit("pconv0_fwdbwd", ms, "fused Pallas fwd + dW/db (no dx)")

        @jax.jit
        def xla_fwd(xh, w, bias):
            return jnp.sum(
                phase_packed_conv_block(
                    xh, w.astype(jnp.bfloat16), bias.astype(jnp.bfloat16)
                ).astype(jnp.float32)[:, ::37, ::37, :])

        ms = _time_call(xla_fwd, lambda: (xh, w, bias), args.iters)
        emit("xconv0_fwd", ms, "XLA phase-packed fwd (current prod)")

        @jax.jit
        def xla_fwdbwd(xh, w, bias):
            def f(w, bias):
                return jnp.sum(
                    phase_packed_conv_block(
                        xh, w.astype(jnp.bfloat16),
                        bias.astype(jnp.bfloat16)).astype(jnp.float32))

            loss, g = jax.value_and_grad(f, argnums=(0, 1))(w, bias)
            return loss + jnp.sum(g[0].astype(jnp.float32))

        ms = _time_call(xla_fwdbwd, lambda: (xh, w, bias), args.iters)
        emit("xconv0_fwdbwd", ms, "XLA phase-packed fwd + dW/db")

    # ---- donation / buffer-aliasing contribution ----
    if "donate" in stages:
        # The round-3 candidate list's item (b) — "donated-buffer
        # aliasing of the dW accumulators" — has no user-level knob
        # beyond donate_argnums: grads/dW are program-internal buffers
        # XLA already reuses, and donating the state is what lets the
        # adam update write params/moments in place instead of
        # allocating a second 51.4M-param set + copy. This stage
        # measures exactly that: the production planar step jitted WITH
        # and WITHOUT donate_argnums.
        pre_d = make_preprocess_fn(
            image_size, train=True,
            augment=AugmentConfig(
                brightness=0.1, contrast=0.1, saturation=0.1),
            layout="planar", pallas="on", out_dtype="bfloat16",
        )
        batch_d = dict(batch)
        batch_d["pixels"] = jnp.asarray(
            np.random.default_rng(0).integers(
                0, 255, (B, 3, canonical, canonical)), jnp.uint8)
        batch_d = jax.device_put(batch_d)

        step_don = make_train_step(preprocess_fn=pre_d)
        ms = _time_call(step_don, lambda: (fresh_state(), batch_d),
                        args.iters)
        emit("step_donated", ms, "production step, donate_argnums=(0,)")

        from skin_image_analysis_tpu.train.step import _loss_and_metrics

        def step_nodon(s, b):
            step_rng = jax.random.fold_in(s.rng, s.step)
            dropout_rng, aug_rng = jax.random.split(step_rng)
            grad_fn = jax.value_and_grad(
                partial(_loss_and_metrics, s.apply_fn), has_aux=True)
            (loss, (correct, count, _)), grads = grad_fn(
                s.params, s.batch_stats, b, dropout_rng, None,
                pre_d, aug_rng)
            s = s.apply_gradients(grads)
            return s, {"loss": loss, "correct": correct, "count": count}

        step_nodon = jax.jit(step_nodon)  # NO donate_argnums
        ms = _time_call(step_nodon, lambda: (fresh_state(), batch_d),
                        args.iters)
        emit("step_undonated", ms, "same program, state NOT donated")

    # ---- XLA cost model ----
    if "cost" in stages:
        step2 = make_train_step(preprocess_fn=pre)
        lowered = step2.lower(fresh_state(), batch)
        compiled = lowered.compile()
        ca = compiled.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        keep = {k: v for k, v in ca.items()
                if k in ("flops", "bytes accessed", "transcendentals",
                         "optimal_seconds")
                or k.startswith("bytes accessed")}
        print(json.dumps(
            {"stage": "cost", **{k: float(v) for k, v in keep.items()}}
        ), flush=True)

    if results:
        print(json.dumps({"stage": "summary", "batch_size": B, **{
            k: round(v, 3) for k, v in results.items()}}), flush=True)
    return 0


if __name__ == "__main__":
    import sys
    sys.exit(main())
