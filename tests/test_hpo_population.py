"""Padded super-network HPO populations (hpo/population.py): a trial
embedded in the padded network must be EXACTLY the unpadded model, padded
weights must stay zero through training, and waves must train K trials
with distinct hyper-parameters in one program."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.hpo.population import (
    PAD_WIDTH,
    WaveSkeleton,
    init_trial_params,
    max_population,
    train_wave,
    trial_param_masks,
)
from skin_image_analysis_tpu.models.cnn import build_model

SKEL = WaveSkeleton(n_conv=1, n_linear=2, optimizer="adam",
                    image_size=16, compute_dtype="float32")


def _extract_active(skel, params, conv_w, lin_w):
    """Slice the active sub-network out of padded params into the exact
    (unpadded) model's param tree."""
    spatial = skel.flatten_spatial()
    out = {}
    cin = 3
    for i in range(skel.conv_count):
        k = params[f"ConvBlock_{i}"]["Conv_0"]
        out[f"ConvBlock_{i}"] = {"Conv_0": {
            "kernel": k["kernel"][:, :, :cin, : conv_w[i]],
            "bias": k["bias"][: conv_w[i]],
        }}
        cin = conv_w[i]
    # dense0 input rows: flatten orders (h, w, c) with c fastest
    rows = (np.arange(spatial)[:, None] * PAD_WIDTH
            + np.arange(conv_w[-1])).ravel()
    d0 = params["MlpBlock_0"]["Dense_0"]
    out["MlpBlock_0"] = {"Dense_0": {
        "kernel": d0["kernel"][rows][:, : lin_w[0]],
        "bias": d0["bias"][: lin_w[0]],
    }}
    for j in range(1, skel.n_linear):
        d = params[f"MlpBlock_{j}"]["Dense_0"]
        out[f"MlpBlock_{j}"] = {"Dense_0": {
            "kernel": d["kernel"][: lin_w[j - 1], : lin_w[j]],
            "bias": d["bias"][: lin_w[j]],
        }}
    h = params["Dense_0"]
    out["Dense_0"] = {
        "kernel": h["kernel"][: lin_w[-1], :],
        "bias": h["bias"],
    }
    return out


def test_padded_trial_equals_unpadded_model():
    conv_w, lin_w = np.array([5, 7]), np.array([6, 4])
    params = init_trial_params(
        SKEL, jax.random.key(0),
        jnp.asarray(conv_w, jnp.int32), jnp.asarray(lin_w, jnp.int32),
    )
    padded_model = build_model(SKEL.padded_model_config())
    exact_model = build_model(ModelConfig(
        conv_features=tuple(int(w) for w in conv_w),
        linear_features=tuple(int(w) for w in lin_w),
        dropout=(0.5, 0.5), image_size=16, compute_dtype="float32",
    ))
    exact_params = _extract_active(SKEL, params, conv_w, lin_w)
    x = jax.random.uniform(jax.random.key(1), (3, 16, 16, 3))
    got = padded_model.apply({"params": params}, x, train=False)
    want = exact_model.apply({"params": exact_params}, x, train=False)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               atol=1e-5, rtol=1e-5)


def test_init_respects_active_fans():
    """Xavier std uses active fans: a narrow trial's first conv weights
    have the std of the narrow model, not the padded one."""
    conv_w, lin_w = np.array([16, 16]), np.array([16, 16])
    params = init_trial_params(
        SKEL, jax.random.key(2),
        jnp.asarray(conv_w, jnp.int32), jnp.asarray(lin_w, jnp.int32),
    )
    k = np.asarray(params["ConvBlock_0"]["Conv_0"]["kernel"])[:, :, :3, :16]
    fan_in, fan_out = 49 * 3, 49 * 16
    expect = np.sqrt(2.0 / (fan_in + fan_out))
    assert abs(k.std() / expect - 1) < 0.15
    # padded region is exactly zero
    assert np.all(np.asarray(params["ConvBlock_0"]["Conv_0"]["kernel"])[:, :, :, 16:] == 0)


def test_masks_match_widths():
    conv_w = jnp.asarray([5, 7], jnp.int32)
    lin_w = jnp.asarray([6, 4], jnp.int32)
    masks = trial_param_masks(SKEL, conv_w, lin_w)
    k1 = np.asarray(masks["ConvBlock_1"]["Conv_0"]["kernel"])
    assert k1[0, 0, 4, 6] == 1 and k1[0, 0, 5, 6] == 0 and k1[0, 0, 4, 7] == 0
    head = np.asarray(masks["Dense_0"]["kernel"])
    assert head[3, 1] == 1 and head[4, 0] == 0


def _tiny_data(n=96, size=16, seed=0):
    rng = np.random.default_rng(seed)
    labels = rng.integers(0, 2, n).astype(np.int32)
    pixels = (
        rng.integers(0, 40, (n, size, size, 3))
        + labels[:, None, None, None] * 120
    ).astype(np.uint8)
    return pixels, labels


def test_train_wave_learns_and_stays_masked():
    pixels, labels = _tiny_data()
    conv_w = np.array([[8, 8], [12, 16], [16, 8], [8, 16]])
    lin_w = np.array([[8, 8], [16, 8], [8, 16], [16, 16]])
    drops = np.array([[0.2, 0.2], [0.3, 0.4], [0.5, 0.2], [0.25, 0.35]])
    lrs = np.array([3e-3, 1e-3, 3e-4, 1e-3])
    out = train_wave(
        SKEL, conv_w, lin_w, drops, lrs,
        pixels[:64], labels[:64], pixels[64:], labels[64:],
        epochs=3, batch_size=8, seed=0,
    )
    assert out["accuracy_history"].shape == (3, 4)
    # separable-by-brightness toy data: the better trials should beat chance
    assert out["final_accuracy"].max() > 0.6


def test_wave_padded_weights_stay_zero():
    """Gradient masking keeps every padded weight at exactly zero after
    training — the equivalence invariant."""
    from skin_image_analysis_tpu.hpo import population as pop

    pixels, labels = _tiny_data()
    conv_w = np.array([[4, 4]])
    lin_w = np.array([[4, 4]])
    drops = np.array([[0.2, 0.2]])
    lrs = np.array([1e-2])

    # reach into train_wave's internals via a short re-run with 1 epoch,
    # checking masks post-hoc through a fresh init + manual step
    skel = SKEL
    params = init_trial_params(
        skel, jax.random.key(0),
        jnp.asarray(conv_w[0], jnp.int32), jnp.asarray(lin_w[0], jnp.int32),
    )
    model = build_model(skel.padded_model_config())
    import optax

    tx = optax.scale_by_adam()
    opt = tx.init(params)

    def loss(p, x, y, key):
        lp = model.apply({"params": p}, x, train=True,
                         rngs={"dropout": key},
                         dropout_rates=jnp.asarray(drops[0]))
        return -jnp.mean(jnp.take_along_axis(lp, y[:, None], -1))

    x = jnp.asarray(pixels[:8], jnp.float32) / 255.0
    y = jnp.asarray(labels[:8])
    masks = trial_param_masks(
        skel, jnp.asarray(conv_w[0], jnp.int32), jnp.asarray(lin_w[0], jnp.int32)
    )
    for step in range(3):
        g = jax.grad(loss)(params, x, y, jax.random.key(step))
        g = jax.tree.map(lambda a, m: a * m, g, masks)
        u, opt = tx.update(g, opt)
        params = jax.tree.map(lambda w, uu, m: w - 1e-2 * uu * m,
                              params, u, masks)
    k = np.asarray(params["ConvBlock_1"]["Conv_0"]["kernel"])
    assert np.all(k[:, :, 4:, :] == 0) and np.all(k[:, :, :, 4:] == 0)
    assert np.any(k[:, :, :4, :4] != 0)


def test_optimizer_kinds():
    pixels, labels = _tiny_data(n=48)
    for opt in ("rmsprop", "sgd"):
        skel = WaveSkeleton(n_conv=1, n_linear=2, optimizer=opt,
                            image_size=16, compute_dtype="float32")
        out = train_wave(
            skel,
            np.array([[8, 8]]), np.array([[8, 8]]),
            np.array([[0.2, 0.2]]), np.array([1e-3]),
            pixels[:32], labels[:32], pixels[32:], labels[32:],
            epochs=1, batch_size=8, seed=0,
        )
        assert out["accuracy_history"].shape == (1, 1)
    with pytest.raises(ValueError, match="unknown optimizer"):
        train_wave(
            WaveSkeleton(1, 2, "bogus", 16, "float32"),
            np.array([[8, 8]]), np.array([[8, 8]]),
            np.array([[0.2, 0.2]]), np.array([1e-3]),
            pixels[:32], labels[:32], pixels[32:], labels[32:],
            epochs=1, batch_size=8,
        )


def test_max_population_caps_by_memory():
    small = WaveSkeleton(n_conv=5, n_linear=2, optimizer="adam")
    big = WaveSkeleton(n_conv=1, n_linear=2, optimizer="adam")
    assert max_population(small) >= max_population(big)
    assert max_population(big) >= 1
    assert max_population(small) <= 32


def test_run_wave_study_full_space():
    """Rolling-lane wave study: full search space, TPE-compatible param
    records, median-prune bookkeeping, trials target respected, freed
    lanes refilled with fresh same-skeleton trials (compute accounting
    in stats)."""
    from skin_image_analysis_tpu.config import HpoConfig
    from skin_image_analysis_tpu.hpo.wave import run_wave_study

    pixels, labels = _tiny_data(n=120, size=16, seed=1)
    cfg = HpoConfig(trials=10, sample_size=90, batch_size=8, epochs=2,
                    n_train_examples=48, n_valid_examples=24,
                    population=3, seed=0)
    study, stats = run_wave_study(
        pixels, labels, cfg, image_size=16, compute_dtype="float32",
        verbose=False,
    )
    assert len(study.trials) >= cfg.trials
    assert stats["waves"] >= 2
    # completed trials reuse freed lanes: with epochs=2 every trial
    # completes fast, so refills must have happened
    assert stats["refills"] >= 1
    assert stats["lane_epochs"] >= stats["live_lane_epochs"] > 0
    for t in study.trials:
        # complete parameter vectors (skeleton + widths + dropout + lr)
        assert "n_conv_layers" in t.params and "lr" in t.params
        n_lin = t.params["n_linear_layers"]
        assert all(f"dropout_{j}" in t.params for j in range(n_lin))
        assert t.state in ("COMPLETE", "PRUNED")
        assert t.intermediate_values  # per-epoch reports happened
    assert study.best_trial.value is not None


def test_rolling_lane_refill_trains_independently():
    """A refilled lane must host a genuinely fresh trial: its own
    sample, its own params (the merge re-initializes the lane), and a
    recorded outcome for BOTH the evicted and the refilled trial."""
    from skin_image_analysis_tpu.config import HpoConfig
    from skin_image_analysis_tpu.hpo.wave import run_wave_study

    pixels, labels = _tiny_data(n=100, size=16, seed=3)
    cfg = HpoConfig(trials=4, sample_size=60, batch_size=8, epochs=1,
                    n_train_examples=32, n_valid_examples=16,
                    population=2, seed=1)
    study, stats = run_wave_study(
        pixels, labels, cfg, image_size=16, compute_dtype="float32",
        verbose=False,
    )
    assert len(study.trials) >= 4
    done = [t for t in study.trials if t.state == "COMPLETE"]
    assert len(done) >= 4  # epochs=1: everyone completes
    # every completed trial reported exactly its epochs
    for t in done:
        assert len(t.intermediate_values) == 1


def test_wave_early_stop_when_all_pruned():
    """If the callback reports no live trials, the wave stops before
    running all epochs."""
    pixels, labels = _tiny_data(n=64)
    calls = []

    def cb(epoch, accs):
        calls.append(epoch)
        return False  # everyone pruned immediately

    out = train_wave(
        SKEL, np.array([[8, 8]]), np.array([[8, 8]]),
        np.array([[0.2, 0.2]]), np.array([1e-3]),
        pixels[:48], labels[:48], pixels[48:], labels[48:],
        epochs=5, batch_size=8, seed=0, epoch_callback=cb,
    )
    assert calls == [0]
    assert out["accuracy_history"].shape[0] == 1


def test_wave_deadline_closes_live_trials():
    """When the study time budget expires mid-wave, the rolling loop
    must stop and record every live trial (PRUNED) instead of training
    the wave out — no dangling RUNNING trials, bounded overshoot."""
    import time as _time

    from skin_image_analysis_tpu.config import HpoConfig
    from skin_image_analysis_tpu.hpo.wave import run_wave_study

    pixels, labels = _tiny_data(n=100, size=16, seed=5)
    # ~1.5 s budget: the first wave starts, the deadline lands inside it
    cfg = HpoConfig(trials=50, time_limit_hours=1.5 / 3600,
                    sample_size=60, batch_size=8, epochs=50,
                    n_train_examples=32, n_valid_examples=16,
                    population=2, seed=2)
    t0 = _time.time()
    study, stats = run_wave_study(
        pixels, labels, cfg, image_size=16, compute_dtype="float32",
        verbose=False,
    )
    assert len(study.trials) >= 2
    for t in study.trials:
        assert t.state in ("COMPLETE", "PRUNED")  # nothing dangling
    # overshoot bounded by ~one epoch + teardown, not 2*epochs
    assert _time.time() - t0 < 60


def test_wave_study_cohort_smaller_than_sample_size():
    """A cohort below sample_size (the reference protocol's 300) must
    still run the sweep: the validation microbatch clamps to the rows
    available instead of erroring (the HPO CLI on a 60-image cohort with
    batch 32 previously raised a misleading 'sample_size too small')."""
    from skin_image_analysis_tpu.config import HpoConfig
    from skin_image_analysis_tpu.hpo.wave import run_wave_study

    pixels, labels = _tiny_data(n=52, size=16, seed=9)
    cfg = HpoConfig(trials=2, sample_size=300, batch_size=32, epochs=2,
                    population=2, seed=3)
    study, stats = run_wave_study(
        pixels, labels, cfg, image_size=16, compute_dtype="float32",
        verbose=False,
    )
    assert len(study.trials) >= 2
    for t in study.trials:
        assert t.state in ("COMPLETE", "PRUNED")

    # a cohort that cannot even fill one train batch raises the
    # accurate message
    import pytest

    tiny_px, tiny_lb = _tiny_data(n=20, size=16, seed=9)
    with pytest.raises(ValueError, match="cohort of 20 rows"):
        run_wave_study(
            tiny_px, tiny_lb,
            HpoConfig(trials=2, sample_size=300, batch_size=32,
                      epochs=1, population=2),
            image_size=16, compute_dtype="float32", verbose=False,
        )
