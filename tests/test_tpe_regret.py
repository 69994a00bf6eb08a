"""TPE sampler quality regression (hpo/tpe.py vs random search).

The full 100-trial x 20-seed benchmark lives in tools/bench_tpe.py with
committed artifacts (tpe_regret_100_20{,_pruned}.json); this is the CI
guard at a budget that runs in seconds. It pins the claim the HPO engine
makes — the from-scratch TPE searches BETTER than random on the ISIC
space's structure (tone_bias_optuna.py:298 used Optuna's TPE) — and the
round-4 pruner-interaction fix (pruned trials feed the densities at
their last intermediate value)."""

import numpy as np

from tools.bench_tpe import run_one


def _mean_final(sampler: str, seeds: int, trials: int,
                prune: bool) -> np.ndarray:
    return np.asarray(
        [run_one(sampler, s, trials, prune)[-1] for s in range(seeds)]
    )


def test_tpe_beats_random_on_surrogate():
    seeds, trials = 10, 60
    tpe = _mean_final("tpe", seeds, trials, prune=False)
    rnd = _mean_final("random", seeds, trials, prune=False)
    diff = tpe - rnd
    # paired over seeds: TPE must win on average AND on most seeds
    assert diff.mean() > 0.005, (tpe.mean(), rnd.mean())
    assert (diff > 0).sum() >= seeds * 0.6


def test_tpe_beats_random_under_median_pruner():
    """The round-4 regression: COMPLETE-only history under a median
    pruner reduced TPE to random parity (tpe_regret_100_20_pruned.json
    before the fix). Pruned-trial observations must keep it separated."""
    seeds, trials = 10, 60
    tpe = _mean_final("tpe", seeds, trials, prune=True)
    rnd = _mean_final("random", seeds, trials, prune=True)
    diff = tpe - rnd
    assert diff.mean() > 0.005, (tpe.mean(), rnd.mean())
    assert (diff > 0).sum() >= seeds * 0.6
