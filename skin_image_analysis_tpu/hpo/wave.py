"""Wave-structured parallel HPO over the FULL reference search space.

The reference runs 100 independent Optuna trials as MPI ranks
(README.md:54) over a space that varies depth, per-layer width, dropout,
optimizer kind and lr (tone_bias_optuna.py:123-173,:239-241). vmap can
only stack same-shape programs, so this driver restructures the sweep
into *waves*:

1. each wave samples the architecture **skeleton** once — (n_conv_layers,
   n_linear_layers, optimizer) — through the study's sampler (TPE or
   random), so skeleton choice still adapts across waves;
2. the wave's K trials then sample everything else independently —
   per-layer widths, per-layer dropout rates, lr — and train **in
   lockstep as one padded super-network population**
   (hpo.population.train_wave): one XLA program per skeleton, K trials
   for ~the wall-clock of one;
3. every trial reports its per-epoch validation accuracy and is run
   through the median-pruner protocol (tone_bias_optuna.py:282-286) —
   in lockstep execution pruned trials ride along for free, so pruning
   here is bookkeeping parity (the reported history stops at the pruned
   epoch), not a compute saving.

K is auto-capped per skeleton by the padded parameter footprint
(hpo.population.max_population).
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

from skin_image_analysis_tpu.config import HpoConfig
from skin_image_analysis_tpu.hpo.population import (
    WaveSkeleton,
    max_population,
    train_wave,
)
from skin_image_analysis_tpu.hpo.space import MAX_EXTRA_CONV_LAYERS
from skin_image_analysis_tpu.hpo.study import Study, TrialState, create_study


def _sample_wave_trials(study: Study, skel_params: dict, k: int,
                        n_conv: int, n_linear: int):
    """Ask K trials; the first samples the skeleton (already done by the
    caller via ``skel_params``), the rest record it verbatim so TPE sees
    complete parameter vectors."""
    trials = []
    for _ in range(k):
        t = study.ask()
        t.params.update(skel_params)  # fixed for the wave, recorded for TPE
        t.suggest_int("first_conv_out", 16, 256)
        for j in range(n_conv):
            t.suggest_int(f"conv_out_{j}", 16, 256)
        for j in range(n_linear):
            t.suggest_int(f"linear_out_{j}", 16, 256)
        for j in range(n_linear):
            t.suggest_float(f"dropout_{j}", 0.2, 0.5)
        t.suggest_float("lr", 1e-5, 1e-1, log=True)
        trials.append(t)
    return trials


def run_wave_study(
    pixels: np.ndarray,
    labels: np.ndarray,
    cfg: HpoConfig = HpoConfig(),
    image_size: int | None = None,
    compute_dtype: str = "bfloat16",
    study: Study | None = None,
    wave_size: int | None = None,
    verbose: bool = True,
) -> tuple[Study, dict[str, Any]]:
    """Run ~cfg.trials trials as waves; returns (study, stats)."""
    if image_size is None:
        image_size = pixels.shape[1]
    study = study or create_study("maximize")
    max_pools = max(1, image_size.bit_length() - 1)
    max_extra = max(1, min(MAX_EXTRA_CONV_LAYERS, max_pools - 1))

    start = time.time()
    waves = 0
    deadline = start + cfg.time_limit_hours * 3600
    while len(study.trials) < cfg.trials and time.time() < deadline:
        # --- skeleton for this wave (through the sampler) ---
        probe = study.ask()
        n_conv = probe.suggest_int("n_conv_layers", 1, max_extra)
        n_linear = probe.suggest_int("n_linear_layers", 2, 5)
        optimizer = probe.suggest_categorical(
            "optimizer", ["adam", "rmsprop", "sgd"]
        )
        skel = WaveSkeleton(
            n_conv=n_conv, n_linear=n_linear, optimizer=optimizer,
            image_size=image_size, compute_dtype=compute_dtype,
        )
        skel_params = dict(probe.params)
        # the probe trial becomes the wave's first member
        k = min(
            wave_size or cfg.population or 8,
            max_population(skel, cfg.batch_size),
            cfg.trials - len(study.trials) + 1,
        )
        k = max(k, 1)
        # fill in the probe's own remaining params + K-1 more trials
        probe.suggest_int("first_conv_out", 16, 256)
        for j in range(n_conv):
            probe.suggest_int(f"conv_out_{j}", 16, 256)
        for j in range(n_linear):
            probe.suggest_int(f"linear_out_{j}", 16, 256)
        for j in range(n_linear):
            probe.suggest_float(f"dropout_{j}", 0.2, 0.5)
        probe.suggest_float("lr", 1e-5, 1e-1, log=True)
        rest = _sample_wave_trials(
            study, skel_params, k - 1, n_conv, n_linear
        )
        wave_trials = [probe] + rest

        conv_w = np.array(
            [[t.params["first_conv_out"]]
             + [t.params[f"conv_out_{j}"] for j in range(n_conv)]
             for t in wave_trials]
        )
        lin_w = np.array(
            [[t.params[f"linear_out_{j}"] for j in range(n_linear)]
             for t in wave_trials]
        )
        drops = np.array(
            [[t.params[f"dropout_{j}"] for j in range(n_linear)]
             for t in wave_trials]
        )
        lrs = np.array([t.params["lr"] for t in wave_trials])

        # --- wave data: reference get_isic() sample + 2/3-1/3 split ---
        rng = np.random.default_rng(cfg.seed + 31 * waves)
        n = min(cfg.sample_size, len(labels))
        idx = rng.permutation(len(labels))[:n]
        cut = int(2 / 3 * n)
        tr_idx, va_idx = idx[:cut], idx[cut:]

        # --- report / prune per epoch as the wave trains; if every trial
        # in the wave prunes, the wave itself stops early (lockstep
        # trials ride along for free only while at least one is alive)
        pruned_at: list[int | None] = [None] * len(wave_trials)

        def epoch_cb(epoch, accs):
            alive = False
            for ti, trial in enumerate(wave_trials):
                if pruned_at[ti] is not None:
                    continue
                trial.report(float(accs[ti]), epoch)
                if trial.should_prune():
                    pruned_at[ti] = epoch
                else:
                    alive = True
            return alive

        t0 = time.time()
        out = train_wave(
            skel, conv_w, lin_w, drops, lrs,
            pixels[tr_idx], labels[tr_idx],
            pixels[va_idx], labels[va_idx],
            epochs=cfg.epochs, batch_size=cfg.batch_size,
            train_limit=cfg.n_train_examples,
            valid_limit=cfg.n_valid_examples,
            seed=cfg.seed + waves,
            epoch_callback=epoch_cb,
        )
        wave_s = time.time() - t0
        history = out["accuracy_history"]  # [<=epochs, K]

        for ti, trial in enumerate(wave_trials):
            if pruned_at[ti] is None:
                study.tell(trial, float(history[-1, ti]),
                           TrialState.COMPLETE)
            else:
                study.tell(trial, float(history[pruned_at[ti], ti]),
                           TrialState.PRUNED)
        waves += 1
        if verbose:
            best = max(
                (t.value for t in study.completed_trials
                 if t.value is not None),
                default=float("nan"),
            )
            print(
                f"wave {waves}: skeleton=({n_conv}conv,{n_linear}lin,"
                f"{optimizer}) K={len(wave_trials)} {wave_s:.1f}s "
                f"best_so_far={best:.4f}"
            )

    stats = {
        "waves": waves,
        "trials": len(study.trials),
        "elapsed_s": time.time() - start,
    }
    return study, stats
