"""Loss functions.

The reference pairs a LogSoftmax head with ``nn.NLLLoss``
(tone_bias_model.py:126-129,:301-303) and uses class-weighted
CrossEntropyLoss in the ToneClassifier (CNNTrial.py:95-96). Both are plain
jnp reductions here — XLA fuses them into the backward pass.
"""

from __future__ import annotations

import jax.numpy as jnp


def nll_loss(
    log_probs: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Negative log-likelihood over log-probabilities.

    Matches torch ``NLLLoss``: unweighted → mean of ``-log_p[label]``;
    weighted → ``sum(w[y_i] * loss_i) / sum(w[y_i])``.
    """
    picked = jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    losses = -picked
    if class_weights is None:
        return jnp.mean(losses)
    w = jnp.asarray(class_weights)[labels]
    return jnp.sum(w * losses) / jnp.sum(w)


def cross_entropy_loss(
    logits: jnp.ndarray,
    labels: jnp.ndarray,
    class_weights: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Softmax cross-entropy from raw logits (ToneClassifier path)."""
    log_probs = logits - jnp.max(logits, axis=-1, keepdims=True)
    log_probs = log_probs - jnp.log(
        jnp.sum(jnp.exp(log_probs), axis=-1, keepdims=True)
    )
    return nll_loss(log_probs, labels, class_weights)
