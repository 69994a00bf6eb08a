"""ROC AUC — new capability over the reference.

The reference never computes AUC (metrics are argmax-decision counts only,
see tone_bias_test.py; BASELINE.json's north star adds it). Implemented as
the Mann-Whitney U statistic with midrank tie handling — numerically equal
to sklearn's ``roc_auc_score`` — in two forms: a numpy host version and a
jit-able sort-based device version (static shapes, runs fine under pjit).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def roc_auc(labels: np.ndarray, scores: np.ndarray) -> float:
    """Host AUC. ``labels`` in {0,1} (1 = positive/malignant), ``scores``
    any monotone score for the positive class (e.g. exp(log_prob[:, 1]))."""
    labels = np.asarray(labels)
    scores = np.asarray(scores, dtype=np.float64)
    n_pos = int(labels.sum())
    n_neg = labels.size - n_pos
    if n_pos == 0 or n_neg == 0:
        return float("nan")
    order = np.argsort(scores, kind="mergesort")
    ranks = np.empty(scores.size, dtype=np.float64)
    sorted_scores = scores[order]
    # midranks for ties
    i = 0
    while i < scores.size:
        j = i
        while j + 1 < scores.size and sorted_scores[j + 1] == sorted_scores[i]:
            j += 1
        ranks[order[i : j + 1]] = 0.5 * (i + j) + 1.0
        i = j + 1
    rank_sum_pos = ranks[labels == 1].sum()
    u = rank_sum_pos - n_pos * (n_pos + 1) / 2.0
    return float(u / (n_pos * n_neg))


@jax.jit
def roc_auc_device(labels: jnp.ndarray, scores: jnp.ndarray,
                   valid: jnp.ndarray | None = None) -> jnp.ndarray:
    """On-device AUC over a fixed-size (optionally padded) array.

    Uses midranks via double argsort with tie correction computed from
    segment boundaries; padded rows (valid=False) are pushed out of both
    classes so they never contribute.
    """
    labels = labels.astype(jnp.float32)
    if valid is not None:
        v = valid.astype(jnp.float32)
        labels = labels * v
        pos_mask = (labels > 0) & valid
        neg_mask = (labels == 0) & valid
        # Push invalid scores to -inf so they rank lowest consistently.
        scores = jnp.where(valid, scores, -jnp.inf)
    else:
        pos_mask = labels > 0
        neg_mask = labels == 0

    n = scores.shape[0]
    order = jnp.argsort(scores)
    sorted_scores = scores[order]

    # midrank computation: for each element, rank = (first_idx + last_idx)/2 + 1
    # over its tie group in the sorted order.
    idx = jnp.arange(n)
    new_group = jnp.concatenate(
        [jnp.ones((1,), bool), sorted_scores[1:] != sorted_scores[:-1]]
    )
    group_id = jnp.cumsum(new_group) - 1
    first_idx = jax.ops.segment_min(idx, group_id, num_segments=n)[group_id]
    last_idx = jax.ops.segment_max(idx, group_id, num_segments=n)[group_id]
    midranks_sorted = 0.5 * (first_idx + last_idx).astype(jnp.float32) + 1.0
    ranks = jnp.zeros((n,), jnp.float32).at[order].set(midranks_sorted)

    n_pos = jnp.sum(pos_mask.astype(jnp.float32))
    n_neg = jnp.sum(neg_mask.astype(jnp.float32))
    rank_sum_pos = jnp.sum(jnp.where(pos_mask, ranks, 0.0))
    if valid is not None:
        # Invalid rows all rank below every valid row (-inf scores), shifting
        # each positive's rank up by n_invalid; remove that uniform offset.
        n_invalid = n - jnp.sum(valid.astype(jnp.float32))
        rank_sum_pos = rank_sum_pos - n_pos * n_invalid
    u = rank_sum_pos - n_pos * (n_pos + 1.0) / 2.0
    denom = n_pos * n_neg
    return jnp.where(denom > 0, u / denom, jnp.nan)
