#!/usr/bin/env python
"""TPE-vs-random A/B on the REAL objective (not the surrogate).

``tools/bench_tpe.py`` validates the from-scratch TPE sampler against
random search on an analytic surrogate of the ISIC search space — fast,
but surrogate-to-real transfer is assumed. This tool closes that gap:
the same A/B protocol over REAL trials — every candidate architecture
is actually trained (hpo/wave.py rolling-lane supernet waves, the same
machinery behind the committed ``optuna_*_tpu_*.json`` hardware
artifacts) on the hard synthetic tone cohort (the
``optuna_100_10_tpu_32_300.json`` recipe: base_gap=30, noise=60,
label_noise=0.15 — accuracy spreads stay informative instead of
saturating). The reference's own anchor is Optuna's TPE on real trials
(tone_bias_optuna.py:298-299).

Both samplers x all seeds run IN ONE PROCESS so the padded-supernet
wave programs compile once and are reused by every subsequent study
(same geometry → same jit cache); through the axon relay that turns
20 x ~N-trial sweeps from hours of recompiles into minutes.

Usage::

    python tools/bench_tpe_real.py [--trials 64] [--seeds 10]
        [--wave 8] [--image-size 32] [--epochs 10] [--out PATH]

Writes ``tpe_real_<trials>_<seeds>.json`` (best-so-far curves + final
checkpoints + seed win counts) and prints a one-line JSON summary.
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from skin_image_analysis_tpu.config import HpoConfig
from skin_image_analysis_tpu.hpo.study import (
    RandomSampler,
    TrialState,
    create_study,
)
from skin_image_analysis_tpu.hpo.tpe import TPESampler
from skin_image_analysis_tpu.hpo.wave import run_wave_study


def hard_cohort(n: int = 1200, image_size: int = 48, seed: int = 11,
                base_gap: int = 30, noise: int = 60,
                label_noise: float = 0.15):
    """In-memory version of the hard synthetic tone cohort
    (tests/fixtures.make_synthetic_dataset with the HPO-artifact
    parameters): label signal = mean brightness with in-class spread
    ``noise`` and ``label_noise`` flipped appearances."""
    rng = np.random.default_rng(seed)
    labels = (rng.random(n) < 0.4).astype(np.int32)  # 1 = malignant
    appear = labels.astype(bool)
    flip = rng.random(n) < label_noise
    appear = appear ^ flip
    mid = 120
    base = np.where(appear, mid - base_gap // 2, mid + base_gap // 2)
    pixels = (
        rng.integers(0, noise, (n, image_size, image_size, 3))
        + base[:, None, None, None]
    ).astype(np.uint8)
    return pixels, labels


def best_so_far_curve(study, n_trials: int) -> list[float]:
    """Best COMPLETE value after each told trial, aligned to n_trials
    (pruned trials advance the curve without improving it)."""
    told = [t for t in sorted(study.trials, key=lambda t: t.number)
            if t.state in (TrialState.COMPLETE, TrialState.PRUNED)]
    curve: list[float] = []
    best = 0.0
    for t in told:
        if t.state == TrialState.COMPLETE and t.value is not None:
            best = max(best, float(t.value))
        curve.append(best)
    # align across runs (waves may finish a couple over/under budget)
    curve = curve[:n_trials]
    while len(curve) < n_trials:
        curve.append(best)
    return curve


def _ci90(values: np.ndarray) -> tuple[float, float]:
    m = float(values.mean())
    se = float(values.std(ddof=1) / math.sqrt(len(values)))
    return m - 1.645 * se, m + 1.645 * se


def main(argv: list[str]) -> int:
    trials, seeds, wave, image_size, epochs = 64, 10, 8, 32, 10
    width_max = 256  # reference protocol upper bound; shrink for smokes
    sample_size = 300
    label_noise, base_gap, noise_px = 0.15, 30, 60
    out = None
    i = 0
    while i < len(argv):
        if argv[i] == "--trials":
            trials = int(argv[i + 1]); i += 1
        elif argv[i] == "--seeds":
            seeds = int(argv[i + 1]); i += 1
        elif argv[i] == "--wave":
            wave = int(argv[i + 1]); i += 1
        elif argv[i] == "--image-size":
            image_size = int(argv[i + 1]); i += 1
        elif argv[i] == "--epochs":
            epochs = int(argv[i + 1]); i += 1
        elif argv[i] == "--out":
            out = argv[i + 1]; i += 1
        elif argv[i] == "--width-max":
            width_max = int(argv[i + 1]); i += 1
        elif argv[i] == "--sample-size":
            sample_size = int(argv[i + 1]); i += 1
        elif argv[i] == "--label-noise":
            label_noise = float(argv[i + 1]); i += 1
        elif argv[i] == "--base-gap":
            base_gap = int(argv[i + 1]); i += 1
        elif argv[i] == "--noise-px":
            noise_px = int(argv[i + 1]); i += 1
        else:
            raise SystemExit(f"unknown arg {argv[i]}")
        i += 1

    pixels, labels = hard_cohort(
        image_size=image_size, base_gap=base_gap, noise=noise_px,
        label_noise=label_noise,
    )

    curves: dict[str, list[list[float]]] = {"random": [], "tpe": []}
    times: list[float] = []
    for seed in range(seeds):
        for name in ("random", "tpe"):
            cfg = HpoConfig(trials=trials, epochs=epochs, batch_size=32,
                            sample_size=sample_size, seed=seed)
            t0 = time.time()
            for attempt in (1, 2):
                try:
                    # fresh study per attempt: a retried study must not
                    # append onto a partially-told history
                    study = create_study(
                        "maximize",
                        sampler=(TPESampler(seed=seed) if name == "tpe"
                                 else RandomSampler(seed=seed)))
                    study, stats = run_wave_study(
                        pixels, labels, cfg, image_size=image_size,
                        study=study, wave_size=wave, verbose=False,
                        width_range=(min(16, width_max), width_max),
                    )
                    break
                except Exception as e:  # transient relay read errors
                    if attempt == 2 or "remote_compile" not in str(e):
                        raise
                    print(json.dumps({"seed": seed, "sampler": name,
                                      "retry": str(e)[:120]}), flush=True)
                    time.sleep(30)
            dt = time.time() - t0
            times.append(dt)
            curve = best_so_far_curve(study, trials)
            curves[name].append(curve)
            print(json.dumps({
                "seed": seed, "sampler": name, "final": curve[-1],
                "trials_told": len(study.trials), "wall_s": round(dt, 1),
            }), flush=True)

    checkpoints = sorted({10, 25, trials // 2, trials}
                         & set(range(1, trials + 1)))
    result: dict = {
        "protocol": "real trials (hpo/wave.py supernet waves) on the "
                    "hard synthetic tone cohort",
        "trials": trials, "seeds": seeds, "wave": wave,
        "image_size": image_size, "epochs": epochs,
        "sample_size": sample_size, "batch_size": 32,
        "cohort": {"base_gap": base_gap, "noise": noise_px,
                   "label_noise": label_noise},
        "samplers": {},
    }
    arrs = {k: np.asarray(v) for k, v in curves.items()}
    for name, rows in arrs.items():
        result["samplers"][name] = {
            "best_mean_curve": [round(float(v), 5)
                                for v in rows.mean(axis=0)],
            "checkpoints": {
                str(c): {
                    "mean": round(float(rows[:, c - 1].mean()), 5),
                    "ci90": [round(v, 5)
                             for v in _ci90(rows[:, c - 1])],
                }
                for c in checkpoints
            },
        }
    finals_r = arrs["random"][:, -1]
    finals_t = arrs["tpe"][:, -1]
    result["tpe_wins"] = int((finals_t > finals_r).sum())
    result["ties"] = int((finals_t == finals_r).sum())
    result["mean_final_delta"] = round(float(
        (finals_t - finals_r).mean()), 5)
    result["mean_wall_s_per_study"] = round(float(np.mean(times)), 1)

    path = out or f"tpe_real_{trials}_{seeds}.json"
    with open(path, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps({
        "wrote": path, "tpe_wins": result["tpe_wins"],
        "ties": result["ties"],
        "mean_final_delta": result["mean_final_delta"],
        "tpe_final_mean": round(float(finals_t.mean()), 5),
        "random_final_mean": round(float(finals_r.mean()), 5),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
