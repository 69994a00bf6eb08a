"""Train-step semantics: learning happens, padding is inert, state donation
round-trips (reference loop: tone_bias_train.py:99-171)."""

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
from skin_image_analysis_tpu.train import create_train_state, make_train_step
from skin_image_analysis_tpu.train.step import make_eval_step

SMALL = ModelConfig(
    conv_features=(8, 16),
    linear_features=(32,),
    dropout=(0.1,),
    image_size=32,
    compute_dtype="float32",
)


def _toy_batch(rng, n=16, size=32):
    labels = rng.integers(0, 2, n).astype(np.int32)
    # mean-separable images: label 1 bright, label 0 dark
    pixels = rng.normal(0, 0.05, (n, size, size, 3)).astype(np.float32)
    pixels += labels[:, None, None, None] * 0.8 + 0.1
    return {
        "pixels": jnp.asarray(pixels),
        "label": jnp.asarray(labels),
        "row_id": jnp.arange(n, dtype=jnp.int32),
        "valid": jnp.ones((n,), bool),
    }


def test_loss_decreases():
    rng = np.random.default_rng(0)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=1e-3), jax.random.key(0), batch_size=4
    )
    step = make_train_step()
    batch = _toy_batch(rng)
    losses = []
    for _ in range(30):
        state, metrics = step(state, batch)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0] * 0.5, losses[::10]


def test_padding_is_inert():
    """A batch with padded rows must give the same loss/metrics as the
    unpadded batch."""
    rng = np.random.default_rng(1)
    batch = _toy_batch(rng, n=8)
    padded = {
        "pixels": jnp.concatenate([batch["pixels"], jnp.full((4, 32, 32, 3), 9.0)]),
        "label": jnp.concatenate([batch["label"], jnp.zeros((4,), jnp.int32)]),
        "row_id": jnp.concatenate([batch["row_id"], -jnp.ones((4,), jnp.int32)]),
        "valid": jnp.concatenate([batch["valid"], jnp.zeros((4,), bool)]),
    }
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    step = make_train_step()
    state1, m1 = step(state, batch)
    # re-create state (donated)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    state2, m2 = step(state, padded)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]), rtol=1e-5)
    assert int(m1["correct"]) == int(m2["correct"])
    assert int(m1["count"]) == int(m2["count"]) == 8


def test_eval_step():
    rng = np.random.default_rng(2)
    state, model = create_train_state(
        SMALL, OptimConfig(), jax.random.key(0), batch_size=4
    )
    batch = _toy_batch(rng, n=8)
    ev = make_eval_step()
    out = ev(state.params, state.apply_fn, batch)
    assert out["pred"].shape == (8,)
    assert out["log_probs"].shape == (8, 2)
    assert (np.asarray(out["row_id"]) == np.arange(8)).all()


def test_class_weighted_loss():
    rng = np.random.default_rng(3)
    batch = _toy_batch(rng, n=8)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    stepw = make_train_step(class_weights=(2.96221865, 0.60153444))
    _, mw = stepw(state, batch)
    state, _ = create_train_state(
        SMALL, OptimConfig(learning_rate=0.0), jax.random.key(0), batch_size=4
    )
    stepu = make_train_step()
    _, mu = stepu(state, batch)
    assert float(mw["loss"]) != float(mu["loss"])


def test_lr_schedules():
    """StepLR-equivalent schedules (OptimConfig.lr_schedule): staircase
    decay by gamma every step_size optimizer steps, cosine horizon, and
    linear warmup prefix."""
    import numpy as np

    from skin_image_analysis_tpu.config import OptimConfig
    from skin_image_analysis_tpu.train.state import make_lr

    lr = make_lr(OptimConfig(learning_rate=1e-2, lr_schedule="step",
                             lr_step_size=4, lr_gamma=0.1))
    assert np.isclose(float(lr(0)), 1e-2)
    assert np.isclose(float(lr(3)), 1e-2)
    assert np.isclose(float(lr(4)), 1e-3)
    assert np.isclose(float(lr(8)), 1e-4)

    lr = make_lr(OptimConfig(learning_rate=1.0, lr_schedule="cosine",
                             lr_decay_steps=10))
    assert float(lr(0)) == 1.0 and float(lr(10)) < 1e-6

    lr = make_lr(OptimConfig(learning_rate=1.0, lr_warmup_steps=10))
    assert float(lr(0)) == 0.0
    assert np.isclose(float(lr(5)), 0.5)
    assert np.isclose(float(lr(20)), 1.0)

    assert make_lr(OptimConfig(learning_rate=2e-5)) == 2e-5
    import pytest

    with pytest.raises(ValueError, match="unknown lr_schedule"):
        make_lr(OptimConfig(lr_schedule="bogus"))
    # missing sizes must raise, not silently decay every step
    with pytest.raises(ValueError, match="lr_step_size"):
        make_lr(OptimConfig(lr_schedule="step"))
    with pytest.raises(ValueError, match="lr_decay_steps"):
        make_lr(OptimConfig(lr_schedule="cosine"))


def test_step_schedule_trains():
    """A scheduled optimizer steps without error and the LR actually
    changes the update magnitude across the decay boundary."""
    import jax
    import jax.numpy as jnp

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import make_train_step

    cfg = ModelConfig(conv_features=(4,), linear_features=(8,),
                      dropout=(0.0,), image_size=8, compute_dtype="float32")
    state, _ = create_train_state(
        cfg, OptimConfig(optimizer="sgd", learning_rate=0.1,
                         lr_schedule="step", lr_step_size=2, lr_gamma=0.1),
        jax.random.key(0), batch_size=4,
    )
    batch = {
        "pixels": jnp.ones((4, 8, 8, 3), jnp.float32) * 0.5,
        "label": jnp.array([0, 1, 0, 1], jnp.int32),
        "row_id": jnp.arange(4, dtype=jnp.int32),
        "valid": jnp.ones((4,), bool),
    }
    step = make_train_step()

    def delta(s):
        before = jax.tree.leaves(s.params)[0].copy()
        s2, _ = step(s, batch)
        after = jax.tree.leaves(s2.params)[0]
        return s2, float(jnp.abs(after - before).max())

    state, d0 = delta(state)   # steps 0,1 at lr=0.1; steps 2+ at 0.01
    state, d1 = delta(state)
    state, d2 = delta(state)
    state, d3 = delta(state)
    # update magnitude drops ~10x after the boundary (gradients are
    # smooth here, so the LR dominates the scale change)
    assert d2 < d1 * 0.5 and d3 < d1 * 0.5


def test_multi_step_matches_sequential_steps():
    """make_multi_train_step(k) must be numerically identical to k
    sequential make_train_step calls on the same batches (same RNG
    folding, same gather, same update)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import (
        make_multi_train_step,
        make_train_step,
    )

    cfg = ModelConfig(conv_features=(4,), linear_features=(8,),
                      dropout=(0.0,), image_size=8, compute_dtype="float32")
    rng = np.random.default_rng(0)
    arena = jnp.asarray(rng.integers(0, 255, (32, 8, 8, 3)), jnp.uint8)
    labels = rng.integers(0, 2, 32).astype(np.int32)
    k, bs = 3, 4
    idx = rng.integers(0, 32, (k, bs)).astype(np.int32)
    lab = labels[idx]
    valid = np.ones((k, bs), bool)

    def fresh():
        state, _ = create_train_state(
            cfg, OptimConfig(learning_rate=1e-2), jax.random.key(0),
            batch_size=bs,
        )
        return state

    # path A: one scanned program
    multi = make_multi_train_step(k)
    sa, ma = multi(fresh(), arena, jnp.asarray(idx), jnp.asarray(lab),
                   jnp.asarray(valid))

    # path B: k sequential dispatches
    step = make_train_step()
    sb = fresh()
    losses = []
    for i in range(k):
        batch = {
            "pixels": arena[idx[i]],
            "label": jnp.asarray(lab[i]),
            "row_id": jnp.asarray(idx[i]),
            "valid": jnp.asarray(valid[i]),
        }
        sb, m = step(sb, batch)
        losses.append(float(m["loss"]))

    np.testing.assert_allclose(np.asarray(ma["loss"]), np.asarray(losses),
                               rtol=1e-6)
    for la, lb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-6)

    # inert (all-invalid) steps change nothing
    sa2, _ = multi(
        sa, arena, jnp.asarray(idx), jnp.asarray(lab),
        jnp.zeros_like(jnp.asarray(valid)),
    )
    for la, lb in zip(jax.tree.leaves(sa2.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb), atol=1e-6)
    assert int(sa2.step) == int(sb.step)


def test_lowp_adam_matches_f32_adam():
    """_scale_by_adam_lowp(bf16) must track optax.adam(f32) closely and
    store BOTH moments narrow (optax's own mu_dtype leaves nu f32 —
    docs/PERF.md)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from skin_image_analysis_tpu.config import OptimConfig
    from skin_image_analysis_tpu.train.state import make_optimizer

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.standard_normal((32, 16)), jnp.float32),
        "b": jnp.asarray(rng.standard_normal(16), jnp.float32),
    }
    lowp = make_optimizer(
        OptimConfig(learning_rate=1e-2, moment_dtype="bfloat16",
                    nu_dtype="bfloat16")
    )
    ref = optax.adam(1e-2)
    s_l, s_r = lowp.init(params), ref.init(params)
    p_l = p_r = params
    for i in range(5):
        g = jax.tree.map(
            lambda p: jnp.asarray(
                rng.standard_normal(p.shape), jnp.float32),
            params,
        )
        u_l, s_l = lowp.update(g, s_l, p_l)
        u_r, s_r = ref.update(g, s_r, p_r)
        p_l = optax.apply_updates(p_l, u_l)
        p_r = optax.apply_updates(p_r, u_r)
    # both moments stored narrow (lr folds into the transform, so the
    # state IS the ScaleByAdamState — no chain wrapper)
    adam_state = s_l
    assert adam_state.mu["w"].dtype == jnp.bfloat16
    assert adam_state.nu["w"].dtype == jnp.bfloat16
    # parameters track the f32 reference to bf16-moment resolution
    for k in params:
        np.testing.assert_allclose(
            np.asarray(p_l[k]), np.asarray(p_r[k]), atol=5e-3
        )

    # moment_dtype ALONE keeps optax semantics: mu narrows, nu stays
    # f32 (small (1-b2)*g^2 increments must stay representable on long
    # runs) and the opt_state keeps optax.adam's chain structure so
    # pre-lowp checkpoints restore without migration
    safe = make_optimizer(
        OptimConfig(learning_rate=1e-2, moment_dtype="bfloat16")
    )
    s_safe = safe.init(params)
    adam_part = s_safe[0]
    assert isinstance(s_safe, tuple)
    assert adam_part.mu["w"].dtype == jnp.bfloat16
    assert adam_part.nu["w"].dtype == jnp.float32


def test_multi_step_matches_sequential_with_lr_schedule():
    """Schedule-position parity: with lr_schedule='step' on, the scanned
    multi-step program (INCLUDING an inert padded tail super-step) must
    produce bit-comparable params to the same batches run sequentially —
    inert steps advance neither the params nor the schedule counter, so
    LR position cannot depend on whether multi-step dispatch was enabled
    or how much k-padding the cohort size produced."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import (
        make_multi_train_step,
        make_train_step,
    )

    cfg = ModelConfig(conv_features=(4,), linear_features=(8,),
                      dropout=(0.0,), image_size=8, compute_dtype="float32")
    # the schedule decays mid-run (step 3 of 5): any position drift
    # between the two paths changes the LR of the later updates
    optim = OptimConfig(
        learning_rate=1e-2, lr_schedule="step", lr_step_size=3,
        lr_gamma=0.1,
    )
    rng = np.random.default_rng(1)
    arena = jnp.asarray(rng.integers(0, 255, (32, 8, 8, 3)), jnp.uint8)
    labels = rng.integers(0, 2, 32).astype(np.int32)
    k, bs, n_real = 3, 4, 5  # 2 super-steps; the 6th scan step is inert
    idx = rng.integers(0, 32, (n_real, bs)).astype(np.int32)
    lab = labels[idx]

    def fresh():
        state, _ = create_train_state(
            cfg, optim, jax.random.key(0), batch_size=bs
        )
        return state

    # path A: two scanned programs, tail padded with an inert step
    # (exactly BatchIterator.super_batches' padding)
    idx_p = np.concatenate([idx, np.zeros((1, bs), np.int32)])
    lab_p = np.concatenate([lab, np.zeros((1, bs), np.int32)])
    vd_p = np.concatenate(
        [np.ones((n_real, bs), bool), np.zeros((1, bs), bool)]
    )
    multi = make_multi_train_step(k)
    sa = fresh()
    for s in range(0, n_real + 1, k):
        sa, _ = multi(
            sa, arena, jnp.asarray(idx_p[s:s + k]),
            jnp.asarray(lab_p[s:s + k]), jnp.asarray(vd_p[s:s + k]),
        )

    # path B: n_real sequential dispatches
    step = make_train_step()
    sb = fresh()
    for i in range(n_real):
        sb, _ = step(sb, {
            "pixels": arena[idx[i]],
            "label": jnp.asarray(lab[i]),
            "row_id": jnp.asarray(idx[i]),
            "valid": jnp.ones(bs, bool),
        })

    assert int(sa.step) == int(sb.step) == n_real
    for la, lb in zip(jax.tree.leaves(sa.params), jax.tree.leaves(sb.params)):
        np.testing.assert_allclose(np.asarray(la), np.asarray(lb),
                                   atol=1e-7)


def test_multi_eval_matches_per_batch_eval(synth_root):
    """The scanned eval program (make_multi_eval_step over the device
    arena) must produce the identical prediction set — including padded
    tail batches and row_id joins — as per-batch eval dispatches."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from skin_image_analysis_tpu.config import ModelConfig, OptimConfig
    from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata
    from skin_image_analysis_tpu.data.loader import (
        BatchIterator,
        HostImageStore,
    )
    from skin_image_analysis_tpu.ops.preprocess import make_preprocess_fn
    from skin_image_analysis_tpu.train.evaluate import collect_predictions
    from skin_image_analysis_tpu.train.state import create_train_state
    from skin_image_analysis_tpu.train.step import (
        make_eval_step,
        make_multi_eval_step,
    )

    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    store = HostImageStore(table, canonical_size=36, workers=2)
    arena = store.to_device()
    pre = make_preprocess_fn(32, train=False)
    loader = BatchIterator(
        store, 16, shuffle=False, drop_remainder=False, seed=0,
        prefetch=0, device_arena=arena,
    )
    cfg = ModelConfig(conv_features=(4,), linear_features=(8,),
                      dropout=(0.0,), image_size=32,
                      compute_dtype="float32")
    state, _ = create_train_state(
        cfg, OptimConfig(), jax.random.key(0), batch_size=4
    )

    base = collect_predictions(
        state.params, state.apply_fn, loader,
        eval_step=make_eval_step(preprocess_fn=pre),
    )
    k = 2  # 48 rows / B=16 = 3 batches -> 2 super-batches, 1 padded
    scanned = collect_predictions(
        state.params, state.apply_fn, loader,
        multi_eval=make_multi_eval_step(k, preprocess_fn=pre),
        arena=arena, eval_k=k,
    )
    order_a = np.argsort(base["row_id"])
    order_b = np.argsort(scanned["row_id"])
    np.testing.assert_array_equal(
        base["row_id"][order_a], scanned["row_id"][order_b]
    )
    np.testing.assert_array_equal(
        base["pred"][order_a], scanned["pred"][order_b]
    )
    np.testing.assert_allclose(
        base["score_malignant"][order_a],
        scanned["score_malignant"][order_b], rtol=1e-6,
    )


def test_nu_dtype_rejected_for_non_adam():
    """nu_dtype (the both-moments-bf16 bench mode) is implemented only
    for plain adam; silently ignoring it for adamw/rmsprop/sgd would let
    the user believe they enabled it (review finding, round 3)."""
    import pytest

    from skin_image_analysis_tpu.config import OptimConfig
    from skin_image_analysis_tpu.train.state import make_optimizer

    for opt in ("adamw", "rmsprop", "sgd"):
        with pytest.raises(ValueError, match="nu_dtype"):
            make_optimizer(
                OptimConfig(optimizer=opt, learning_rate=1e-3,
                            nu_dtype="bfloat16")
            )
    # f32 nu_dtype is a no-op and stays allowed everywhere
    make_optimizer(
        OptimConfig(optimizer="adamw", learning_rate=1e-3,
                    nu_dtype="float32")
    )
