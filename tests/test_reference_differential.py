"""Differential parity against the LITERAL reference source.

Every other parity test in this suite checks our code against
re-implemented formulas or against torch modules that *mimic* the
reference.  This file imports the actual modules from
``/root/reference/src`` and asserts:

(a) ``metrics.fairness.analyse_predictions`` returns a dict EQUAL
    (same keys, same insertion order, bit-equal floats) to the
    reference ``tone_bias_test.analyse_predictions``
    (tone_bias_test.py:240-561) on synthetic instance cohorts,
    including zero-TP / zero-TN edge cases — and that where the
    reference *crashes* (empty group → ZeroDivisionError,
    tone_bias_test.py:327-333) we return the documented zero-guards
    instead (ARCHITECTURE.md §Known divergences).
(b) the literal ``tone_bias_model.SkinCancerListModel``
    (tone_bias_model.py:56-152), saved with ``torch.save`` exactly as
    the reference does (tone_bias_model.py:305-338), round-trips
    through ``migrate.reference.import_reference_model`` to a Flax
    model with forward parity on fixed inputs.
(c) replaying hyper-parameter dicts through the reference
    ``tone_bias_optuna.define_isic_model`` (tone_bias_optuna.py:123-173)
    and through ``hpo.space.define_isic_model`` yields the same
    architecture (conv widths/kernels, linear widths, dropout rates,
    flatten geometry, head size), including the TRIALS=100 winning
    configuration (tone_bias_optuna.py:96-110).

The reference tree is UNTRUSTED third-party content: we import only the
three named modules, never execute their ``main()``/CLI paths, and stub
their unavailable heavyweight deps (skimage, torchvision, optuna) with
empty placeholder modules — none of the functions under test touch
them.  All reference stdout is swallowed.
"""

import contextlib
import importlib
import io
import math
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF_SRC = "/root/reference/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_SRC), reason="reference tree not present"
)


# --------------------------------------------------------------------------
# Loading the reference modules
# --------------------------------------------------------------------------

_REF_MODULES = ("tone_bias_test", "tone_bias_model", "tone_bias_optuna",
                "tone_bias_dataset")


def _stub_module(name, **attrs):
    mod = types.ModuleType(name)
    for key, value in attrs.items():
        setattr(mod, key, value)
    return mod


@pytest.fixture(scope="module")
def ref():
    """Import the literal reference modules once, with unavailable deps
    stubbed out. Returns a namespace with .test/.model/.optuna."""
    import matplotlib

    matplotlib.use("Agg")

    added = {}

    def add_stub(name, mod):
        if name not in sys.modules:
            sys.modules[name] = mod
            added[name] = mod

    # skimage: imported at module top, unused by the functions under test
    add_stub("skimage", _stub_module("skimage"))
    # torchvision: the reference uses it only for display/transforms we
    # never call
    tv = _stub_module("torchvision")
    tv.utils = _stub_module("torchvision.utils")
    tv.datasets = _stub_module("torchvision.datasets")
    tv.transforms = _stub_module("torchvision.transforms")
    add_stub("torchvision", tv)
    add_stub("torchvision.utils", tv.utils)
    add_stub("torchvision.datasets", tv.datasets)
    add_stub("torchvision.transforms", tv.transforms)
    # optuna: tone_bias_optuna imports the sampler machinery at top;
    # define_isic_model/TrialDummy never touch it
    optuna_mod = _stub_module("optuna")
    trial_mod = _stub_module("optuna.trial")
    trial_mod.TrialState = type("TrialState", (), {})
    optuna_mod.trial = trial_mod
    add_stub("optuna", optuna_mod)
    add_stub("optuna.trial", trial_mod)

    sys.path.insert(0, REF_SRC)
    try:
        mods = {}
        with contextlib.redirect_stdout(io.StringIO()):
            for name in _REF_MODULES:
                mods[name] = importlib.import_module(name)
    finally:
        sys.path.remove(REF_SRC)

    ns = types.SimpleNamespace(
        test=mods["tone_bias_test"],
        model=mods["tone_bias_model"],
        optuna=mods["tone_bias_optuna"],
    )
    yield ns
    for name in list(_REF_MODULES) + list(added):
        sys.modules.pop(name, None)


# --------------------------------------------------------------------------
# (a) metric-layer parity
# --------------------------------------------------------------------------


def _cohort(seed, n, p_dark=0.4, p_malignant=0.3, p_correct=0.8,
            tones=("dark", "light")):
    """Synthetic instance dicts in the exact shape predict_with_instance
    emits (tone_bias_test.py:161-237)."""
    rng = np.random.default_rng(seed)
    instances = {}
    for i in range(n):
        label = "malignant" if rng.random() < p_malignant else "benign"
        if rng.random() < p_correct:
            pred = label
        else:
            pred = "benign" if label == "malignant" else "malignant"
        instances[int(i)] = {
            "prediction": pred,
            "benign_malignant": label,
            "skin_tone": tones[0] if rng.random() < p_dark else tones[-1],
            "sex": "female" if rng.random() < 0.5 else "male",
            "control": "poor" if rng.random() < 0.5 else "rich",
            "age": int(rng.integers(18, 90)),
        }
    return instances


def _assert_same_dict(ours, theirs, path="result"):
    """Exact equality: key set, key insertion ORDER, and bit-equal
    values (floats compared with ==, no tolerance)."""
    assert list(ours.keys()) == list(theirs.keys()), (
        f"{path}: key order differs\nours:   {list(ours)}\n"
        f"theirs: {list(theirs)}"
    )
    for key in theirs:
        mine, other = ours[key], theirs[key]
        if isinstance(other, dict):
            _assert_same_dict(mine, other, f"{path}[{key!r}]")
        else:
            assert type(mine) is type(other) or (
                isinstance(mine, (int, float))
                and isinstance(other, (int, float))
            ), f"{path}[{key!r}]: type {type(mine)} vs {type(other)}"
            assert mine == other, (
                f"{path}[{key!r}]: {mine!r} != {other!r}"
            )
            if isinstance(other, float):
                # == treats -0.0 == 0.0; pin the bit pattern too
                assert math.copysign(1.0, mine) == math.copysign(1.0, other)


_COHORTS = [
    # balanced random cohort
    dict(seed=11, n=400),
    # tiny cohort, strongly imbalanced groups
    dict(seed=23, n=16, p_dark=0.15, p_malignant=0.6, p_correct=0.6),
    # zero-TP: the model never predicts malignant correctly
    dict(seed=37, n=120, p_malignant=0.25, p_correct=0.0),
    # all-positive predictions (zero TN path, recall=1 branches)
    dict(seed=41, n=90, p_malignant=1.0, p_correct=1.0),
]


@pytest.mark.parametrize("spec", _COHORTS)
def test_analyse_predictions_bit_equal(ref, spec):
    from skin_image_analysis_tpu.metrics import fairness

    instances = _cohort(**spec)
    if spec.get("p_correct") == 0.0:
        # make it a literal zero-TP cohort: predict benign everywhere
        for inst in instances.values():
            inst["prediction"] = "benign"
    with contextlib.redirect_stdout(io.StringIO()):
        theirs = ref.test.analyse_predictions(dict(instances))
    ours = fairness.analyse_predictions(dict(instances))
    _assert_same_dict(ours, theirs)


def test_disparate_impact_analysis_bit_equal(ref):
    from skin_image_analysis_tpu.metrics import fairness

    instances = _cohort(seed=5, n=250)
    dark = ref.test.filter(instances, "skin_tone", "dark")
    light = ref.test.filter(instances, "skin_tone", "light")
    assert dark == fairness.filter_instances(instances, "skin_tone", "dark")
    with contextlib.redirect_stdout(io.StringIO()):
        theirs = ref.test.disparate_impact_analysis(dark, light)
    ours = fairness.disparate_impact_analysis(dark, light)
    _assert_same_dict(ours, theirs)


def test_confusion_matrix_partition_bit_equal(ref):
    from skin_image_analysis_tpu.metrics import fairness

    instances = _cohort(seed=7, n=300)
    theirs = ref.test.confusion_matrix(dict(instances))
    ours = fairness.confusion_matrix(dict(instances))
    for mine, other in zip(ours, theirs):
        assert mine == other


def test_empty_group_documented_divergence(ref):
    """The one intentional divergence: an all-light cohort crashes the
    reference (dark_prevalence divides by len(dark_instances)=0,
    tone_bias_test.py:527-530); ours zero-guards. Assert BOTH behaviors
    so the divergence stays documented-and-true."""
    from skin_image_analysis_tpu.metrics import fairness

    instances = _cohort(seed=13, n=60, p_dark=0.0)
    assert all(i["skin_tone"] == "light" for i in instances.values())
    with contextlib.redirect_stdout(io.StringIO()):
        with pytest.raises(ZeroDivisionError):
            ref.test.analyse_predictions(dict(instances))
    ours = fairness.analyse_predictions(dict(instances))
    assert ours["dark"] == 0
    tone = ours["tone_di_results"]
    assert tone["min_count"] == 0
    assert tone["selection_rate_min"] == 0.0
    assert tone["di"] == 0.0


# --------------------------------------------------------------------------
# (b) model-layer parity: the literal torch module through the migrator
# --------------------------------------------------------------------------


def test_skin_cancer_list_model_forward_parity(ref, tmp_path):
    """Literal SkinCancerListModel → torch.save (the reference's own
    save path, tone_bias_model.py:305-338) → import_reference_model →
    Flax forward parity at the reference's native 224x224."""
    import jax.numpy as jnp

    from skin_image_analysis_tpu.migrate.reference import (
        import_reference_model,
    )
    from skin_image_analysis_tpu.models import build_model

    torch.manual_seed(0)
    m = ref.model.SkinCancerListModel(["benign", "malignant"])
    pth = str(tmp_path / "session_model.pth")
    torch.save(m, pth)

    cfg, params, class_names = import_reference_model(pth)
    assert class_names == ["benign", "malignant"]
    assert cfg.conv_features == (32, 64, 128)
    assert cfg.first_kernel == 7 and cfg.kernel == 3
    assert cfg.linear_features == (512, 256)
    assert cfg.image_size == 224
    assert cfg.compute_dtype == "float32"

    model = build_model(cfg)
    rng = np.random.default_rng(17)
    x = rng.uniform(0, 1, (1, 224, 224, 3)).astype(np.float32)
    ours = np.asarray(model.apply({"params": params}, jnp.asarray(x),
                                  train=False))
    m.eval()
    with torch.no_grad():
        theirs = m(torch.tensor(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(ours, theirs, atol=2e-5, rtol=1e-4)
    # both are log-softmax over 2 classes
    np.testing.assert_allclose(np.exp(ours).sum(axis=1), 1.0, atol=1e-5)


# --------------------------------------------------------------------------
# (c) search-space replay parity
# --------------------------------------------------------------------------


def _torch_arch(seq):
    """Flatten a reference nn.Sequential into a comparable description."""
    convs, linears, dropouts = [], [], []
    for layer in seq:
        name = type(layer).__name__
        if name == "Conv2d":
            convs.append(
                (layer.in_channels, layer.out_channels,
                 layer.kernel_size[0])
            )
        elif name == "Linear":
            linears.append((layer.in_features, layer.out_features))
        elif name == "Dropout":
            dropouts.append(layer.p)
    return convs, linears, dropouts


def _ref_space_params(rng):
    """A random point in the reference's search grammar, in the
    reference's own parameter naming."""
    n_conv = int(rng.integers(1, 7))
    n_linear = int(rng.integers(2, 6))
    params = {
        "n_conv_layers": n_conv,
        "n_units_l0": int(rng.integers(16, 257)),
        "n_linear_layers": n_linear,
    }
    for i in range(n_conv):
        params[f"n_units_conv_l{i}"] = int(rng.integers(16, 257))
    for i in range(n_linear):
        params[f"n_units_linear_l{i}"] = int(rng.integers(16, 257))
        params[f"dropout_l{i}"] = float(rng.uniform(0.2, 0.5))
    return params


def _assert_arch_match(ref_ns, ref_params, model_cfg):
    """Build the reference torch model from ref_params and compare its
    architecture with our ModelConfig."""
    trial = ref_ns.optuna.TrialDummy(dict(ref_params))
    with contextlib.redirect_stdout(io.StringIO()):
        seq = ref_ns.optuna.define_isic_model(2, trial)
    convs, linears, dropouts = _torch_arch(seq)

    assert tuple(c[1] for c in convs) == model_cfg.conv_features
    assert convs[0][2] == model_cfg.first_kernel == 7
    assert all(c[2] == model_cfg.kernel == 3 for c in convs[1:])
    # hidden linears + head
    assert tuple(l[1] for l in linears[:-1]) == model_cfg.linear_features
    assert linears[-1][1] == model_cfg.num_classes == 2
    assert tuple(dropouts) == pytest.approx(model_cfg.dropout)
    # flatten geometry: the reference tracks image_size//=2 per pool
    # (tone_bias_optuna.py:138-161); our model must meet the same
    # first-linear fan-in
    size = model_cfg.image_size
    for _ in range(len(convs)):
        size //= 2
    assert linears[0][0] == convs[-1][1] * size * size


def test_replay_winning_config_architecture(ref):
    """The TRIALS=100 winner (tone_bias_optuna.py:96-110) replayed in
    both frameworks gives the same architecture, and the reference's
    literal constants map onto our best_hyperparameters()."""
    from skin_image_analysis_tpu.hpo.replay import reference_params_to_ours
    from skin_image_analysis_tpu.hpo.space import (
        best_hyperparameters,
        create_best_model_config,
    )

    with contextlib.redirect_stdout(io.StringIO()):
        ref_trial = ref.optuna.create_best_hyperparameters()
    ref_params = dict(ref_trial.hyperparameters)

    mapped = reference_params_to_ours(ref_params)
    assert mapped == best_hyperparameters()

    model_cfg, optim_cfg = create_best_model_config(compute_dtype="float32")
    _assert_arch_match(ref, ref_params, model_cfg)
    assert optim_cfg.optimizer == "adam"
    assert optim_cfg.learning_rate == ref_params["lr"]


@pytest.mark.parametrize("seed", [101, 202, 303, 404, 505])
def test_replay_random_configs_architecture(ref, seed):
    from skin_image_analysis_tpu.hpo.replay import reference_params_to_ours
    from skin_image_analysis_tpu.hpo.space import define_isic_model
    from skin_image_analysis_tpu.hpo.study import TrialReplay

    rng = np.random.default_rng(seed)
    ref_params = _ref_space_params(rng)
    ours = reference_params_to_ours(ref_params)
    ours.setdefault("optimizer", "adam")
    ours.setdefault("lr", 1e-3)
    model_cfg, _ = define_isic_model(
        TrialReplay(ours), classes=2, image_size=224,
        compute_dtype="float32",
    )
    _assert_arch_match(ref, ref_params, model_cfg)


def test_confusion_matrix_sanity_error_both_ways(ref):
    """An instance whose prediction is outside {benign, malignant}
    falls through every branch; BOTH implementations raise the same
    partition-sum ValueError (tone_bias_test.py:269-272)."""
    from skin_image_analysis_tpu.metrics import fairness

    instances = _cohort(seed=3, n=8)
    instances[0] = dict(instances[0], prediction="unknown")
    with pytest.raises(ValueError):
        ref.test.confusion_matrix(dict(instances))
    with pytest.raises(ValueError):
        fairness.confusion_matrix(dict(instances))
