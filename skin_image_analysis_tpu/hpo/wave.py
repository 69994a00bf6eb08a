"""Wave-structured parallel HPO over the FULL reference search space.

The reference runs 100 independent Optuna trials as MPI ranks
(README.md:54) over a space that varies depth, per-layer width, dropout,
optimizer kind and lr (tone_bias_optuna.py:123-173,:239-241). vmap can
only stack same-shape programs, so this driver restructures the sweep
into *waves* of rolling lanes:

1. each wave samples the architecture **skeleton** once — (n_conv_layers,
   n_linear_layers, optimizer) — through the study's sampler (TPE or
   random), so skeleton choice still adapts across waves;
2. the wave's K lanes each host a trial sampling everything else
   independently — per-layer widths, per-layer dropout rates, lr, and its
   OWN 300-row data sample (the reference's per-trial get_isic()
   resample, tone_bias_optuna.py:175-231) — and train in lockstep as one
   padded super-network population (hpo.population): one XLA program per
   skeleton, K trials for ~the wall-clock of one;
3. every trial reports per-epoch validation accuracy through the
   median-pruner protocol (tone_bias_optuna.py:282-286). When a trial
   prunes (or completes), its lane is REFILLED mid-wave with a freshly
   sampled same-skeleton trial — re-initializing only that lane via a
   masked merge, no recompile — so pruning frees real compute, exactly
   what the reference's pruner does by freeing an MPI slot
   (tone_bias_optuna.py:282-299). Lanes with no refill budget ride along
   inert; the wave ends when every lane's trial is finished.

K is auto-capped per skeleton by the padded parameter footprint
(hpo.population.max_population).

With ``mesh=`` the wave's lane axis is sharded over the mesh's devices
(every per-lane array — params, optimizer state, widths, dropouts, lrs,
index gathers — carries a leading K axis, so a NamedSharding on that
axis turns the vmap-over-K programs into SPMD programs with zero
cross-lane collectives; the data pool is replicated). K lanes x N chips
is the full TPU-slice replacement for the reference's MPI ranks
(README.md:54): each chip hosts K/N padded-supernet trials.
"""

from __future__ import annotations

import time
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from skin_image_analysis_tpu.config import HpoConfig
from skin_image_analysis_tpu.hpo.population import (
    WaveSkeleton,
    _rolling_programs,
    default_microbatch,
    max_population,
)
from skin_image_analysis_tpu.hpo.space import MAX_EXTRA_CONV_LAYERS
from skin_image_analysis_tpu.hpo.study import (
    Study,
    Trial,
    TrialState,
    create_study,
)


def _suggest_non_skeleton(t, n_conv: int, n_linear: int,
                          width_range: tuple = (16, 256)):
    """Sample the per-lane parameters (widths, dropouts, lr) for a trial
    whose skeleton is already fixed."""
    lo, hi = width_range
    t.suggest_int("first_conv_out", lo, hi)
    for j in range(n_conv):
        t.suggest_int(f"conv_out_{j}", lo, hi)
    for j in range(n_linear):
        t.suggest_int(f"linear_out_{j}", lo, hi)
    for j in range(n_linear):
        t.suggest_float(f"dropout_{j}", 0.2, 0.5)
    t.suggest_float("lr", 1e-5, 1e-1, log=True)
    return t


def _lane_vectors(t, n_conv: int, n_linear: int):
    conv = [t.params["first_conv_out"]] + [
        t.params[f"conv_out_{j}"] for j in range(n_conv)
    ]
    lin = [t.params[f"linear_out_{j}"] for j in range(n_linear)]
    dr = [t.params[f"dropout_{j}"] for j in range(n_linear)]
    return conv, lin, dr, t.params["lr"]


def run_wave_study(
    pixels: np.ndarray,
    labels: np.ndarray,
    cfg: HpoConfig = HpoConfig(),
    image_size: int | None = None,
    compute_dtype: str = "bfloat16",
    study: Study | None = None,
    wave_size: int | None = None,
    mesh=None,
    verbose: bool = True,
    width_range: tuple = (16, 256),
) -> tuple[Study, dict[str, Any]]:
    """Run ~cfg.trials trials as rolling-lane waves; returns
    (study, stats). stats carries the compute accounting: lane_epochs
    (total lockstep epochs run x lanes), live_lane_epochs (epochs spent
    on un-finished trials) and refills (trials that reused a freed
    lane).

    ``mesh``: a `jax.sharding.Mesh` to shard the lane axis over — K is
    rounded to a multiple of the mesh's device count and every per-lane
    array is placed with a leading-axis NamedSharding (the data pool is
    replicated), so each device trains K/N of the wave's supernet trials
    with no cross-device collectives.

    ``width_range``: the per-layer width search interval. The default is
    the reference protocol's (16, 256) (tone_bias_optuna.py:133-169);
    the padded supernet width follows its upper bound, so a narrowed
    range (e.g. (8, 32) in the driver dry run) compiles proportionally
    faster while exercising the identical wave machinery."""
    if image_size is None:
        image_size = pixels.shape[1]
    study = study or create_study("maximize")
    max_pools = max(1, image_size.bit_length() - 1)
    max_extra = max(1, min(MAX_EXTRA_CONV_LAYERS, max_pools - 1))

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        n_dev = int(np.prod(list(mesh.shape.values())))
        lane_sh = NamedSharding(mesh, PartitionSpec(tuple(mesh.axis_names)))
        repl_sh = NamedSharding(mesh, PartitionSpec())
    else:
        n_dev, lane_sh, repl_sh = 1, None, None

    def _lane(x):
        """Per-lane array (leading K axis) → lane-sharded device array."""
        x = jnp.asarray(x)
        return jax.device_put(x, lane_sh) if lane_sh is not None else x

    # the whole cohort goes to the device ONCE; every trial's sample is
    # an index gather against this pool (replicated under a mesh)
    pool_px = jnp.asarray(pixels)
    pool_lb = jnp.asarray(labels.astype(np.int32))
    if repl_sh is not None:
        pool_px = jax.device_put(pool_px, repl_sh)
        pool_lb = jax.device_put(pool_lb, repl_sh)

    start = time.time()
    deadline = start + cfg.time_limit_hours * 3600
    waves = 0
    refills = 0
    lane_epochs = 0
    live_lane_epochs = 0

    n_sample = min(cfg.sample_size, len(labels))
    cut = int(2 / 3 * n_sample)

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
            pad_width=width_range[1],
        )
        skel_params = dict(probe.params)
        k = min(
            wave_size or cfg.population or 8,
            max_population(skel, cfg.batch_size),
            cfg.trials - len(study.trials) + 1,
        )
        k = max(k, 1)
        n_real = k
        if mesh is not None:
            # the lane axis shards over the mesh: K must divide evenly
            cap = max_population(skel, cfg.batch_size)
            if cap < n_dev:
                raise ValueError(
                    f"skeleton {skel} fits only {cap} padded lanes but "
                    f"the mesh has {n_dev} devices"
                )
            k = max(n_dev, (k // n_dev) * n_dev)
            # rounding K up past the remaining-trial budget must not
            # inflate the protocol: extra lanes ride as FILLERS (their
            # trials are never registered/told to the study, so the
            # artifact stays an honest N-trial run); a freed filler lane
            # can still host a real refill when budget allows
            n_real = min(n_real, k)

        microbatch = min(default_microbatch(skel, cfg.batch_size),
                         cfg.batch_size)
        while cfg.batch_size % microbatch:
            microbatch -= 1
        n_micro = cfg.batch_size // microbatch

        # per-trial sample geometry (identical shapes for every lane —
        # the programs are shape-static)
        n_tb = cut // cfg.batch_size
        if cfg.n_train_examples:
            n_tb = min(n_tb, max(cfg.n_train_examples // cfg.batch_size, 1))
        # eval batches need not match the train microbatch: clamp to the
        # validation rows actually available so small cohorts (below
        # sample_size) still run the protocol instead of erroring
        avail_v = n_sample - cut
        mb_eval = min(microbatch, max(avail_v, 1))
        n_vb = avail_v // mb_eval
        if cfg.n_valid_examples:
            n_vb = min(n_vb, max(cfg.n_valid_examples // mb_eval, 1))
        if n_tb < 1 or n_vb < 1:
            raise ValueError(
                f"cohort of {len(labels)} rows (sample {n_sample}, "
                f"2/3 train cut {cut}) cannot fill one train batch of "
                f"{cfg.batch_size} plus one validation row — need at "
                f"least ~{cfg.batch_size * 3 // 2} rows or a smaller "
                "--batch-size"
            )

        rng = np.random.default_rng(cfg.seed + 31 * waves)

        def new_lane_trial(ask_probe=None, filler=False):
            """Sample a trial (widths/drops/lr) + its own data rows.

            ``filler`` lanes (mesh K-rounding overflow) sample through an
            UNREGISTERED trial object: they train like any lane but are
            never reported/told, so they cannot distort the study."""
            t = ask_probe
            if t is None:
                t = (Trial(study, -1, study.sampler) if filler
                     else study.ask())
                t.params.update(skel_params)
            _suggest_non_skeleton(t, n_conv, n_linear, width_range)
            sample = rng.permutation(len(labels))[:n_sample]
            tr_rows = sample[:n_tb * cfg.batch_size]
            va_rows = sample[cut:cut + n_vb * mb_eval]
            return {
                "trial": t,
                "vec": _lane_vectors(t, n_conv, n_linear),
                "tr_rows": tr_rows,
                "va_rows": va_rows,
                "birth": 0,
                "live": True,
                "filler": filler,
                "key": rng.integers(0, 2**31),
            }

        lanes = (
            [new_lane_trial(probe)]
            + [new_lane_trial() for _ in range(n_real - 1)]
            + [new_lane_trial(filler=True) for _ in range(k - n_real)]
        )
        wave_trials = n_real  # cap at 2k so one skeleton cannot eat the
        # budget — skeleton choice must keep adapting across waves

        conv_w = np.zeros((k, 1 + n_conv), np.int32)
        lin_w = np.zeros((k, n_linear), np.int32)
        drops = np.zeros((k, n_linear), np.float32)
        lrs = np.zeros((k,), np.float32)
        vb_idx = np.zeros((k, n_vb, mb_eval), np.int64)

        def load_lane(ti, lane):
            conv, lin, dr, lr = lane["vec"]
            conv_w[ti] = conv
            lin_w[ti] = lin
            drops[ti] = dr
            lrs[ti] = lr
            vb_idx[ti] = lane["va_rows"].reshape(n_vb, mb_eval)

        for ti, lane in enumerate(lanes):
            load_lane(ti, lane)

        # wave-constant lane arrays go to the device ONCE per wave (and
        # again only after a refill mutates them) instead of per epoch —
        # the host->device link is the slow resource here
        d_conv_w = d_lin_w = d_drops = d_lrs = d_vb = None

        def _commit_lanes():
            nonlocal d_conv_w, d_lin_w, d_drops, d_lrs, d_vb
            d_conv_w = _lane(conv_w)
            d_lin_w = _lane(lin_w)
            d_drops = _lane(drops)
            d_lrs = _lane(lrs)
            d_vb = _lane(vb_idx.astype(np.int32))

        _commit_lanes()

        init_wave, train_epoch, valid_accuracy, merge_lanes = (
            _rolling_programs(skel, k, microbatch, n_micro)
        )
        keys = _lane(jax.random.split(jax.random.key(cfg.seed + waves), k))
        params, opt_state = init_wave(keys, d_conv_w, d_lin_w)

        # refills must be born early enough to run their full epochs
        max_wave_epochs = 2 * cfg.epochs
        root = jax.random.key(cfg.seed + 1000 + waves)
        t0 = time.time()
        epoch = 0
        while any(lane["live"] for lane in lanes):
            tb_idx = np.stack([
                np.random.default_rng(lane["key"] + epoch)
                .permutation(lane["tr_rows"])
                .reshape(n_tb, cfg.batch_size)
                for lane in lanes
            ])
            params, opt_state = train_epoch(
                params, opt_state, jax.random.fold_in(root, epoch),
                _lane(tb_idx.astype(np.int32)), pool_px, pool_lb,
                d_conv_w, d_lin_w, d_drops, d_lrs,
            )
            accs = np.asarray(valid_accuracy(
                params, d_vb, pool_px, pool_lb
            ))
            lane_epochs += k
            live_lane_epochs += sum(lane["live"] for lane in lanes)

            refill_mask = np.zeros(k, bool)
            for ti, lane in enumerate(lanes):
                if not lane["live"]:
                    continue
                local = epoch - lane["birth"]
                trial = lane["trial"]
                done = local >= cfg.epochs - 1
                if lane["filler"]:
                    # filler lanes (mesh K-rounding overflow) never
                    # report — they exist only to keep the lane axis a
                    # mesh multiple
                    pruned = False
                else:
                    trial.report(float(accs[ti]), local)
                    pruned = not done and trial.should_prune()
                if not (done or pruned):
                    continue
                if not lane["filler"]:
                    study.tell(
                        trial, float(accs[ti]),
                        TrialState.COMPLETE if done else TrialState.PRUNED,
                    )
                # slot refill: a freed lane hosts a fresh same-skeleton
                # trial when budget and wave horizon allow
                can_refill = (
                    len(study.trials) < cfg.trials
                    and wave_trials < 2 * k
                    and epoch + 1 + cfg.epochs <= max_wave_epochs
                    and time.time() < deadline
                )
                if can_refill:
                    fresh = new_lane_trial()
                    fresh["birth"] = epoch + 1
                    lanes[ti] = fresh
                    load_lane(ti, fresh)
                    refill_mask[ti] = True
                    refills += 1
                    wave_trials += 1
                else:
                    lane["live"] = False

            if time.time() >= deadline:
                # time budget expired mid-wave: record every live trial
                # as pruned at its last report instead of training the
                # wave out (the old per-wave overshoot bound was
                # cfg.epochs; rolling lanes would double it)
                for ti, lane in enumerate(lanes):
                    if not lane["live"]:
                        continue
                    lane["live"] = False
                    if lane["filler"]:
                        continue
                    if lane["birth"] > epoch:
                        # refilled THIS epoch and never trained (the
                        # merge below is skipped by this break): accs[ti]
                        # belongs to the lane's previous occupant, so
                        # withdraw the trial instead of recording a
                        # fabricated value
                        study.trials.remove(lane["trial"])
                        refills -= 1
                        continue
                    study.tell(
                        lane["trial"], float(accs[ti]),
                        TrialState.PRUNED,
                    )
                epoch += 1
                break
            if refill_mask.any():
                _commit_lanes()  # load_lane mutated the lane arrays
                fkeys = _lane(jax.random.split(
                    jax.random.key(cfg.seed + 7000 + waves * 100 + epoch),
                    k,
                ))
                fresh_params, fresh_opt = init_wave(
                    fkeys, d_conv_w, d_lin_w
                )
                params, opt_state = merge_lanes(
                    params, opt_state, fresh_params, fresh_opt,
                    _lane(refill_mask),
                )
            epoch += 1
        wave_s = time.time() - t0
        waves += 1
        if verbose:
            best = max(
                (t.value for t in study.completed_trials
                 if t.value is not None),
                default=float("nan"),
            )
            print(
                f"wave {waves}: skeleton=({n_conv}conv,{n_linear}lin,"
                f"{optimizer}) K={k} epochs={epoch} {wave_s:.1f}s "
                f"best_so_far={best:.4f}"
            )

    stats = {
        "waves": waves,
        "trials": len(study.trials),
        "elapsed_s": time.time() - start,
        "refills": refills,
        "lane_epochs": lane_epochs,
        "live_lane_epochs": live_lane_epochs,
    }
    return study, stats
