"""Seeded randomness discipline.

The reference uses unseeded global RNG everywhere (``np.random.choice`` for
the control column at tone_bias_dataset.py:218, unseeded ``df.sample`` for
shuffles/undersampling). Here every random decision flows from one root
seed: numpy draws through a ``np.random.Generator``, device-side draws
through split ``jax.random`` keys. This makes training runs, dataset splits,
and the fairness placebo column reproducible end to end.
"""

from __future__ import annotations

import numpy as np

import jax


def np_rng(seed: int | None) -> np.random.Generator:
    """A numpy Generator; unseeded (OS entropy) when seed is None."""
    return np.random.default_rng(seed)


class KeyChain:
    """Sequential splitter over a root JAX PRNG key.

    Usage::

        keys = KeyChain(seed=0)
        params_key = keys.next()       # one-off keys
        dropout_key = keys.next("dropout")  # named fold for stability
    """

    def __init__(self, seed: int = 0):
        self._key = jax.random.key(seed)
        self._count = 0

    def next(self, name: str | None = None) -> jax.Array:
        if name is not None:
            return jax.random.fold_in(self._key, _stable_hash(name))
        self._count += 1
        self._key, sub = jax.random.split(self._key)
        return sub


def _stable_hash(name: str) -> int:
    """Deterministic 31-bit hash (``hash()`` is salted per process)."""
    h = 0
    for ch in name.encode():
        h = (h * 131 + ch) % (2**31 - 1)
    return h
