"""HPO engine: sampling, pruning protocol, replay, search space, and the
vmap-parallel population (reference protocol: tone_bias_optuna.py)."""

import numpy as np
import pytest

from skin_image_analysis_tpu.config import ModelConfig
from skin_image_analysis_tpu.hpo import (
    MedianPruner,
    RandomSampler,
    TrialPruned,
    TrialReplay,
    best_hyperparameters,
    create_best_model_config,
    create_study,
    define_isic_model,
)
from skin_image_analysis_tpu.hpo.parallel import train_population


def test_study_optimize_quadratic():
    study = create_study("maximize", sampler=RandomSampler(0))

    def objective(trial):
        x = trial.suggest_float("x", -5.0, 5.0)
        return -(x - 2.0) ** 2

    study.optimize(objective, n_trials=50)
    assert len(study.completed_trials) == 50
    assert abs(study.best_params["x"] - 2.0) < 1.5
    assert study.best_value <= 0.0


def test_median_pruner_protocol():
    """Trials reporting below the running median get pruned (the
    report/should_prune protocol of tone_bias_optuna.py:282-286)."""
    study = create_study(
        "maximize",
        sampler=RandomSampler(1),
        pruner=MedianPruner(n_startup_trials=3),
    )
    counter = {"n": 0}

    def objective(trial):
        good = counter["n"] < 5  # first 5 good, rest bad
        counter["n"] += 1
        for epoch in range(5):
            value = (0.9 if good else 0.1) + 0.01 * epoch
            trial.report(value, epoch)
            if trial.should_prune():
                raise TrialPruned()
        return value

    study.optimize(objective, n_trials=12)
    assert len(study.pruned_trials) > 0
    assert len(study.completed_trials) + len(study.pruned_trials) == 12
    assert study.best_value > 0.8


def test_log_uniform_sampling_range():
    s = RandomSampler(0)
    vals = [s.sample_float(1e-5, 1e-1, log=True) for _ in range(200)]
    assert min(vals) >= 1e-5 and max(vals) <= 1e-1
    # log-uniform: ~half the mass below the geometric mean 1e-3
    frac_small = sum(v < 1e-3 for v in vals) / len(vals)
    assert 0.3 < frac_small < 0.7


def test_define_isic_model_bounds():
    study = create_study(sampler=RandomSampler(42))
    for _ in range(10):
        trial = study.ask()
        model_cfg, optim_cfg = define_isic_model(trial, image_size=64)
        assert 2 <= len(model_cfg.conv_features) <= 7
        assert all(16 <= f <= 256 for f in model_cfg.conv_features)
        assert 2 <= len(model_cfg.linear_features) <= 5
        assert all(0.2 <= d <= 0.5 for d in model_cfg.dropout)
        assert optim_cfg.optimizer in ("adam", "rmsprop", "sgd")
        assert 1e-5 <= optim_cfg.learning_rate <= 1e-1
        study.tell(trial, 0.5)


def test_trial_replay_roundtrip():
    params = best_hyperparameters()
    model_cfg, optim_cfg = define_isic_model(TrialReplay(params))
    assert model_cfg.conv_features == (192, 172, 22, 86)
    assert model_cfg.linear_features == (227, 80, 86)
    assert optim_cfg.optimizer == "adam"
    assert optim_cfg.learning_rate == pytest.approx(0.03627331743927454)


def test_create_best_model_config():
    model_cfg, _ = create_best_model_config(image_size=32, compute_dtype="float32")
    assert model_cfg.image_size == 32


def test_trial_replay_missing_key_raises():
    with pytest.raises(KeyError):
        define_isic_model(TrialReplay({"first_conv_out": 32}))


def test_vmap_population():
    """4 stacked trials with different lrs train in one program; a sane lr
    must beat a divergent one on the separable toy data."""
    rng = np.random.default_rng(0)
    n, size = 96, 16
    labels = rng.integers(0, 2, n).astype(np.int32)
    pixels = (rng.normal(0, 0.05, (n, size, size, 3)) +
              labels[:, None, None, None] * 0.7 + 0.15)
    pixels = (np.clip(pixels, 0, 1) * 255).astype(np.uint8)
    model_cfg = ModelConfig(
        conv_features=(4,), linear_features=(8,), dropout=(0.1,),
        image_size=size, compute_dtype="float32",
    )
    out = train_population(
        model_cfg,
        learning_rates=np.array([1e-2, 1e-3, 1e-4, 10.0]),
        train_pixels=pixels[:64], train_labels=labels[:64],
        valid_pixels=pixels[64:], valid_labels=labels[64:],
        epochs=6, batch_size=16, seed=0,
    )
    assert out["accuracy_history"].shape == (6, 4)
    accs = out["final_accuracy"]
    assert max(accs[0], accs[1]) > 0.8
    assert max(accs[0], accs[1]) >= accs[3]


def test_vmap_population_mesh_sharded():
    """Population sharded over the 8-device data axis must match the
    unsharded result (same trials, same data, same seeds)."""
    import jax

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from skin_image_analysis_tpu.config import MeshConfig
    from skin_image_analysis_tpu.parallel.mesh import create_mesh

    rng = np.random.default_rng(3)
    n, size = 64, 8
    labels = rng.integers(0, 2, n).astype(np.int32)
    pixels = (rng.random((n, size, size, 3)) * 255).astype(np.uint8)
    model_cfg = ModelConfig(
        conv_features=(4,), linear_features=(8,), dropout=(0.1,),
        image_size=size, compute_dtype="float32",
    )
    lrs = np.geomspace(1e-4, 1e-2, 8)
    kwargs = dict(
        train_pixels=pixels[:48], train_labels=labels[:48],
        valid_pixels=pixels[48:], valid_labels=labels[48:],
        epochs=2, batch_size=16, seed=0,
    )
    mesh = create_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    sharded = train_population(model_cfg, lrs, mesh=mesh, **kwargs)
    plain = train_population(model_cfg, lrs, **kwargs)
    np.testing.assert_allclose(
        sharded["accuracy_history"], plain["accuracy_history"], atol=1e-6
    )


def test_tpe_beats_random_on_quadratic():
    """TPE should concentrate samples near the optimum and out-search
    random sampling on a smooth 2-D objective (same budget, seeds avg)."""
    from skin_image_analysis_tpu.hpo.tpe import TPESampler

    def objective(trial):
        x = trial.suggest_float("x", -10.0, 10.0)
        y = trial.suggest_float("y", -10.0, 10.0)
        return -(x - 3.0) ** 2 - (y + 2.0) ** 2

    def best_of(sampler_cls, seed):
        study = create_study("maximize", sampler=sampler_cls(seed))
        study.optimize(objective, n_trials=60)
        return study.best_value

    tpe = np.mean([best_of(TPESampler, s) for s in range(4)])
    rand = np.mean([best_of(RandomSampler, s) for s in range(4)])
    assert tpe >= rand  # same budget, better (or equal) optimum


def test_tpe_categorical_and_conditional():
    from skin_image_analysis_tpu.hpo.tpe import TPESampler

    def objective(trial):
        kind = trial.suggest_categorical("kind", ["a", "b"])
        if kind == "a":
            x = trial.suggest_float("xa", 0.0, 1.0)
            return x  # best: kind=a, xa→1
        x = trial.suggest_float("xb", 0.0, 1.0)
        return 0.2 * x

    study = create_study("maximize", sampler=TPESampler(0, n_startup_trials=8))
    study.optimize(objective, n_trials=60)
    assert study.best_trial.params["kind"] == "a"
    assert study.best_value > 0.8


def test_tpe_respects_bounds_log():
    from skin_image_analysis_tpu.hpo.tpe import TPESampler

    def objective(trial):
        lr = trial.suggest_float("lr", 1e-5, 1e-1, log=True)
        assert 1e-5 <= lr <= 1e-1
        n = trial.suggest_int("n", 1, 6)
        assert 1 <= n <= 6
        return -abs(math_log10(lr) + 3.0)  # optimum at 1e-3

    def math_log10(v):
        import math

        return math.log10(v)

    study = create_study("maximize", sampler=TPESampler(1))
    study.optimize(objective, n_trials=50)
    assert 1e-4 < study.best_trial.params["lr"] < 1e-2
