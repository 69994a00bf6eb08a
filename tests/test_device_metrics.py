"""On-device metric reductions must be bit-identical to the host path."""

import numpy as np

import jax.numpy as jnp

from skin_image_analysis_tpu.metrics import analyse_predictions
from skin_image_analysis_tpu.metrics.device import (
    analyse_predictions_device,
    grouped_confusion,
)
from tests.fixtures import random_instances

CODE = {
    "skin_tone": {"light": 0, "dark": 1},
    "sex": {"male": 0, "female": 1},
    "control": {"poor": 0, "rich": 1},
}


def _to_arrays(instances, pad=17):
    n = len(instances)
    idx = sorted(instances)
    preds = np.array(
        [1 if instances[i]["prediction"] == "malignant" else 0 for i in idx],
        np.int32,
    )
    labels = np.array(
        [1 if instances[i]["benign_malignant"] == "malignant" else 0 for i in idx],
        np.int32,
    )
    groups = {
        attr: np.array([CODE[attr][instances[i][attr]] for i in idx], np.int32)
        for attr in CODE
    }
    valid = np.ones(n, bool)
    # add padding rows that must not affect anything
    preds = np.concatenate([preds, np.ones(pad, np.int32)])
    labels = np.concatenate([labels, np.ones(pad, np.int32)])
    groups = {
        a: np.concatenate([g, np.zeros(pad, np.int32)]) for a, g in groups.items()
    }
    valid = np.concatenate([valid, np.zeros(pad, bool)])
    return (
        jnp.asarray(preds),
        jnp.asarray(labels),
        {a: jnp.asarray(g) for a, g in groups.items()},
        jnp.asarray(valid),
    )


def test_grouped_confusion_hand():
    preds = jnp.asarray([1, 0, 1, 0, 1], jnp.int32)
    labels = jnp.asarray([1, 0, 0, 1, 1], jnp.int32)
    group = jnp.asarray([0, 0, 1, 1, -1], jnp.int32)
    valid = jnp.asarray([True, True, True, True, True])
    out = np.asarray(grouped_confusion(preds, labels, group, valid))
    # group 0: (tp,tn,fp,fn) = (1,1,0,0); group 1: (0,0,1,1); code -1 dropped
    np.testing.assert_array_equal(out, [[1, 1, 0, 0], [0, 0, 1, 1]])


def test_device_matches_host_exactly(rng):
    instances = random_instances(rng, 257)
    host = analyse_predictions(instances)
    preds, labels, groups, valid = _to_arrays(instances)
    dev = analyse_predictions_device(preds, labels, groups, valid)
    assert host == dev  # bit-identical, including all nested floats


def test_device_handles_missing_group(rng):
    instances = random_instances(rng, 100)
    preds, labels, groups, valid = _to_arrays(instances, pad=0)
    # knock out some sex codes → those rows leave the gender grouping only
    sex = np.asarray(groups["sex"]).copy()
    sex[:10] = -1
    groups["sex"] = jnp.asarray(sex)
    dev = analyse_predictions_device(preds, labels, groups, valid)
    assert dev["male"] + dev["female"] == 90
    assert dev["total"] == 100


def test_device_matches_host_fuzz(rng):
    """Bit-equality of host and device fairness paths across many random
    cohorts, including missing groups and heavy padding."""
    for trial in range(25):
        n = int(rng.integers(3, 400))
        instances = random_instances(rng, n)
        # randomly blank out a group entirely sometimes
        if trial % 5 == 0:
            for inst in instances.values():
                inst["skin_tone"] = "light"
        host = analyse_predictions(instances)
        preds, labels, groups, valid = _to_arrays(
            instances, pad=int(rng.integers(0, 40))
        )
        dev = analyse_predictions_device(preds, labels, groups, valid)
        assert host == dev, f"trial {trial} (n={n})"
