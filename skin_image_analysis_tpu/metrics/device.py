"""On-device fairness reductions.

The reference computes every fairness number by looping over Python
instance dicts on the host (tone_bias_test.py:240-445). Here the same
statistics are integer confusion counts computed as one fused segment-sum
over the whole (padded) eval set on the TPU — O(N) elementwise work on the
VPU, no host loop — and only the final handful of integers crosses back to
the host, where :func:`skin_image_analysis_tpu.metrics.fairness.di_from_counts`
turns them into the exact reference metric dict. Because the counts are
integers, the resulting floats are bit-identical to the host path.

Group encoding comes from data.dataset.GROUP_VOCABS:
skin_tone light=0/dark=1, sex male=0/female=1, control poor=0/rich=1;
code -1 marks a missing attribute (excluded from that grouping, matching
the reference's filter-by-value semantics).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.metrics.fairness import di_from_counts

# (min, maj) group codes per audited attribute, mirroring the reference's
# argument order: DI(dark|light), DI(female|male), DI(poor|rich)
# (tone_bias_test.py:537-542).
DI_GROUPS = {
    "skin_tone": (1, 0),
    "sex": (1, 0),
    "control": (0, 1),
}


@partial(jax.jit, static_argnames=("n_groups",))
def grouped_confusion(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    group_code: jnp.ndarray,
    valid: jnp.ndarray,
    n_groups: int = 2,
) -> jnp.ndarray:
    """Per-group confusion counts ``[n_groups, 4]`` ordered (tp, tn, fp, fn).

    Positive class = label 1 (malignant). Rows with ``valid == False`` or
    ``group_code < 0`` fall into a discard bucket.
    """
    # cell: tp=0, tn=1, fp=2, fn=3
    cell = jnp.where(
        (preds == 1) & (labels == 1), 0,
        jnp.where((preds == 0) & (labels == 0), 1,
                  jnp.where((preds == 1) & (labels == 0), 2, 3)),
    )
    ok = valid & (group_code >= 0)
    idx = jnp.where(ok, group_code * 4 + cell, n_groups * 4)
    counts = jax.ops.segment_sum(
        jnp.ones_like(idx, jnp.int32), idx, num_segments=n_groups * 4 + 1
    )
    return counts[: n_groups * 4].reshape(n_groups, 4)


@jax.jit
def overall_counts(preds, labels, valid):
    """(correct, total) over valid rows."""
    correct = jnp.sum((preds == labels) & valid)
    total = jnp.sum(valid)
    return jnp.stack([correct, total])


def analyse_predictions_device(
    preds: jnp.ndarray,
    labels: jnp.ndarray,
    group_codes: dict[str, jnp.ndarray],
    valid: jnp.ndarray,
) -> dict:
    """The full per-epoch fairness record, reduced on device.

    Output schema matches ``metrics.fairness.analyse_predictions``
    (reference: tone_bias_test.py:546-561) exactly.
    """
    cm = {
        attr: np.asarray(
            grouped_confusion(preds, labels, codes, valid)
        )
        for attr, codes in group_codes.items()
    }
    corr_tot = np.asarray(overall_counts(preds, labels, valid))
    correct, total = int(corr_tot[0]), int(corr_tot[1])

    def di(attr: str) -> dict:
        mn, mj = DI_GROUPS[attr]
        a, b = cm[attr][mn], cm[attr][mj]
        return di_from_counts(
            int(a[0]), int(a[1]), int(a[2]), int(a[3]),
            int(b[0]), int(b[1]), int(b[2]), int(b[3]),
        )

    tone, sex, control = cm["skin_tone"], cm["sex"], cm["control"]
    return {
        "correct": correct,
        "total": total,
        "accuracy": correct / total,
        "dark": int(tone[1].sum()),
        "light": int(tone[0].sum()),
        "male": int(sex[0].sum()),
        "female": int(sex[1].sum()),
        "tone_di_results": di("skin_tone"),
        "gender_di_results": di("sex"),
        "control_di_results": di("control"),
    }
