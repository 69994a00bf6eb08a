"""The training driver: experiment store, epoch loop, fairness eval, resume.

Orchestration parity with the reference driver (src/tone_bias_train.py):

- experiment folder ``results/<balanced|imbalanced>_<YYYY-MM-DD_HH-MM-SS>/``
  holding ``session_train.csv`` / ``session_test.csv`` (frozen split —
  the test set never leaks across resumes, :290-291,:247-249), the model
  artifact, and one timestamped ``<ts>.json`` of per-epoch JSON lines
  (:410-424);
- resume-by-folder: pointing at an existing experiment reloads the model
  and the frozen splits and appends a fresh timestamped results file
  (:240-249) — plus (new) full optimizer/RNG state from an orbax
  checkpoint when present;
- per-epoch: train epoch → full test-set fairness audit → one JSON record
  {analyse_predictions schema + avg_batch_loss + train_accuracy + epoch}
  (:387-424), with additive keys ``auc`` and ``epoch_time_s``.

TPU-first differences: one jitted train step (forward+backward+update+
metrics fused, uint8 batches, device-side augmentation), async prefetch
instead of 10 fork workers, and the eval reduction on device.
"""

from __future__ import annotations

import datetime
import os
import time

import pandas as pd

import jax

from skin_image_analysis_tpu import config as config_lib
from skin_image_analysis_tpu.config import TrainConfig
from skin_image_analysis_tpu.data import (
    LesionTable,
    balance_dataset,
    read_isic_metadata,
    shuffle_split,
)
from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore
from skin_image_analysis_tpu.ops.preprocess import AugmentConfig, make_preprocess_fn
from skin_image_analysis_tpu.parallel.mesh import create_mesh
from skin_image_analysis_tpu.parallel.sharding import (
    batch_sharding,
    infer_param_shardings,
)
from skin_image_analysis_tpu.train import checkpoint as ckpt_lib
from skin_image_analysis_tpu.train.evaluate import evaluate_fairness
from skin_image_analysis_tpu.train.state import (
    copy_state as _shared_copy_state,
    create_train_state,
)
from skin_image_analysis_tpu.train.step import (
    make_eval_step,
    make_multi_eval_step,
    make_multi_train_step,
    make_train_step,
)
from skin_image_analysis_tpu.utils import jsonl
from skin_image_analysis_tpu.utils.profiling import Timer

TRAIN_SET_FILENAME = "session_train.csv"
TEST_SET_FILENAME = "session_test.csv"
CHECKPOINT_DIRNAME = "checkpoint"
PROGRESS_FILENAME = "epochs_completed.log"
#: metrics --keep-best / --early-stop can track: 'loss' = train avg
#: batch loss (lower better, every epoch); the rest are fairness
#: eval-record keys (higher better, eval epochs only)
_BEST_METRICS = ("loss", "avg_batch_loss", "accuracy", "auc",
                 "auc_dark", "auc_light")


def _timestamp() -> str:
    return datetime.datetime.now().strftime("%Y-%m-%d_%H-%M-%S")


def resolve_experiment_folder(cfg: TrainConfig) -> tuple[str, bool, bool]:
    """Returns (folder, is_resume, balance). Mirrors the reference's
    name-based mode inference: a non-existent path containing 'imbalanced'
    starts an imbalanced run (tone_bias_train.py:200-216)."""
    requested = cfg.experiment_dir
    if requested and os.path.exists(requested):
        return requested, True, cfg.data.balance
    if requested and "imbalanced" in os.path.basename(requested):
        balance = False
        name = f"imbalanced_{_timestamp()}"
    elif requested and "balance" in os.path.basename(requested):
        balance = True
        name = f"balanced_{_timestamp()}"
    else:
        balance = cfg.data.balance
        name = f"{'balanced' if balance else 'imbalanced'}_{_timestamp()}"
    return os.path.join(cfg.results_dir, name), False, balance


def run_training(cfg: TrainConfig, verbose: bool = True) -> str:
    """Train per the config; returns the experiment folder path."""
    folder, is_resume, balance = resolve_experiment_folder(cfg)
    results_path = os.path.join(folder, f"{_timestamp()}.json")
    train_csv = os.path.join(folder, TRAIN_SET_FILENAME)
    test_csv = os.path.join(folder, TEST_SET_FILENAME)
    model_path = os.path.join(folder, ckpt_lib.MODEL_FILENAME)
    ckpt_dir = os.path.join(folder, CHECKPOINT_DIRNAME)

    rng = jax.random.key(cfg.seed)

    # total snapshot-backed epochs already in the folder (0 for fresh
    # runs); progress markers written this run encode base + local epoch
    base_done = completed_epochs(folder) if is_resume else 0

    if is_resume:
        if verbose:
            print(f"Resuming training from {folder}")
        train_df = pd.read_csv(train_csv, index_col=0)
        test_df = pd.read_csv(test_csv, index_col=0)
        if os.path.exists(model_path):
            model_cfg, loaded = ckpt_lib.load_model(model_path)
            params, batch_stats = ckpt_lib.split_variables(loaded)
            state, model = create_train_state(
                model_cfg, cfg.optim, rng, batch_size=cfg.data.batch_size
            )
            if os.path.exists(ckpt_dir):
                state = ckpt_lib.restore_train_state(ckpt_dir, state)
            else:
                state = state.replace(params=params)
                if batch_stats is not None:
                    state = state.replace(batch_stats=batch_stats)
        else:
            # No model artifact: either a crash before any save (fresh
            # weights, kept splits — the test set must never leak,
            # tone_bias_train.py:247-249) or a mid-run crash whose
            # periodic orbax snapshot exists. The snapshot's tree shape
            # comes from whatever the original run trained — cfg.model,
            # or the init_from artifact's architecture for fine-tune
            # runs — so rebuild the template the same way.
            init_params = init_stats = None
            if cfg.init_from:
                source = cfg.init_from
                if os.path.isdir(source):
                    source = os.path.join(source, ckpt_lib.MODEL_FILENAME)
                model_cfg, loaded = ckpt_lib.load_model(source)
                init_params, init_stats = ckpt_lib.split_variables(loaded)
            else:
                model_cfg = cfg.model
            state, model = create_train_state(
                model_cfg, cfg.optim, rng, batch_size=cfg.data.batch_size
            )
            if os.path.exists(ckpt_dir):
                state = ckpt_lib.restore_train_state(ckpt_dir, state)
                if verbose:
                    print("restored orbax snapshot (no model artifact)")
            else:
                if init_params is not None:  # crashed before epoch 1 of
                    # a fine-tune run: re-apply the warm start
                    state = state.replace(params=init_params)
                    if init_stats is not None:
                        state = state.replace(batch_stats=init_stats)
                if verbose:
                    print("no snapshot yet; initial weights, kept splits")
    else:
        if verbose:
            print(f"New run in {folder}")
        df = read_isic_metadata(cfg.data.root_dir, seed=cfg.data.seed)
        if balance:
            df = balance_dataset(df, seed=cfg.data.seed, verbose=verbose)
        train_df, test_df = shuffle_split(
            df, ratio=cfg.data.split_ratio, seed=cfg.data.seed
        )
        # Create the folder only once there is something durable to put
        # in it: a crash during metadata ingest/balancing leaves no
        # half-made folder for the elastic supervisor to lock onto.
        os.makedirs(folder, exist_ok=True)
        train_df.to_csv(train_csv)
        test_df.to_csv(test_csv)
        if cfg.init_from:
            # Fine-tune path (HIBA-2022 config): warm-start from another
            # experiment's model artifact; architecture comes from the
            # artifact so the weights always fit.
            source = cfg.init_from
            if os.path.isdir(source):
                source = os.path.join(source, ckpt_lib.MODEL_FILENAME)
            model_cfg, loaded = ckpt_lib.load_model(source)
            init_params, init_stats = ckpt_lib.split_variables(loaded)
            state, model = create_train_state(
                model_cfg, cfg.optim, rng, batch_size=cfg.data.batch_size
            )
            state = state.replace(params=init_params)
            if init_stats is not None:
                state = state.replace(batch_stats=init_stats)
            if verbose:
                print(f"Fine-tuning from {source}")
        else:
            model_cfg = cfg.model
            state, model = create_train_state(
                model_cfg, cfg.optim, rng, batch_size=cfg.data.batch_size
            )
        with open(os.path.join(folder, "train_config.json"), "w") as f:
            f.write(config_lib.to_json(cfg))

    # The model's architecture locks the input geometry (the flatten
    # Dense is size-specific): when resume/fine-tune loads an artifact
    # trained at a different image size — e.g. an imported reference
    # experiment — the checkpoint wins over cfg.data.image_size, which
    # would otherwise shape-error at MlpBlock_0.
    if model_cfg.image_size != cfg.data.image_size:
        import dataclasses

        if verbose:
            print(
                f"note: model artifact expects image_size="
                f"{model_cfg.image_size}; overriding the data config's "
                f"{cfg.data.image_size}"
            )
        cfg = dataclasses.replace(
            cfg,
            data=dataclasses.replace(
                cfg.data, image_size=model_cfg.image_size
            ),
        )

    if verbose:
        print(f"train={len(train_df)}  test={len(test_df)}")

    train_table = LesionTable(train_df, cfg.data.root_dir)
    test_table = LesionTable(test_df, cfg.data.root_dir)

    # Planar arenas + the Pallas fused preprocess kernel: on TPU backends
    # the augmented train path preprocesses inside one VMEM pass
    # (docs/PERF.md — the jnp path alone cost ~6.7 ms of the 33 ms step).
    # Streaming (archive-scale, ISIC-2020 config) keeps the jnp path by
    # design: those runs are ~99% host/link-bound (docs/PERF.md
    # §Streaming), so the kernel's ~4 ms/batch saving is invisible there
    # while planar chunk transposes would add host work to the binding
    # resource. Cohorts that fit HBM — including ISIC-2020 itself at 256²
    # — use the default device-cache mode and get the kernel.
    use_planar = not cfg.data.streaming and (
        cfg.data.pallas_preprocess == "on"
        or (
            cfg.data.pallas_preprocess == "auto"
            and cfg.data.augment
            and jax.default_backend() != "cpu"
        )
    )
    layout = "planar" if use_planar else "hwc"
    if use_planar and verbose:
        print("pallas fused preprocess: on (planar arenas)")

    # Decode in the background so XLA compilation (triggered further
    # down via a warm call on dummy shapes) overlaps with it — the two
    # dominant cold-start costs run concurrently. The streaming path
    # (archive-scale cohorts) decodes lazily per chunk instead.
    stores: dict[str, HostImageStore] = {}
    early_arenas: dict = {}
    # Single-device early arena commit: ship each split's uint8 arena to
    # HBM from the decode thread the moment its decode finishes, so the
    # slow host link (the 5.4 GB / ~3.5 min term at ISIC-2020 scale)
    # overlaps the remaining decode + compiles instead of serializing
    # into epoch 1. Mesh runs keep the post-join replicated commit (the
    # sharding objects don't exist yet when the thread starts).
    # ONE arena-size formula for every gate below (early commit,
    # will_multi, and — via HostImageStore's exact (n,3,s,s) uint8
    # layout — the post-decode device-cache check): uint8 canonical
    # frames, n rows x 3 channels x s². Duplicating it per-gate risked
    # an early-committed arena the device-cache branch then refuses —
    # a multi-GB orphan buffer held in HBM for the whole run.
    _s = cfg.data.canonical_size

    def _arena_bytes(n_rows: int) -> int:
        return n_rows * 3 * _s * _s

    predicted_arena_bytes = _arena_bytes(len(train_table) + len(test_table))
    early_commit = (
        not cfg.data.streaming
        and cfg.data.device_cache
        and len(jax.devices()) == 1
        and predicted_arena_bytes <= cfg.data.device_cache_max_bytes
        # below this the materialization fence's extra per-shape program
        # compiles (~30-90 s each through the relay) cost more than the
        # transfer they overlap — measured +145 s on a 7 MB cohort
        and predicted_arena_bytes >= cfg.data.early_commit_min_bytes
    )

    commit_threads: list = []

    def _commit_arena(split):
        # device_put through the relay is LAZY — bytes only move when a
        # dependent op runs (measured: a 5.4 GB arena "committed" here
        # still cost epoch 1 its full transfer). Force materialization
        # with a scalar readback; block_until_ready returns early
        # through the relay, so the readback is the only real fence.
        try:
            arena = jax.device_put(stores[split].images)
            float(arena.reshape(-1)[0])
            early_arenas[split] = arena
        except Exception as e:  # surfaced at join; the main path
            # re-commits any split missing from early_arenas
            print(f"early arena commit failed for {split!r}: {e!r} "
                  "(will re-commit on the main thread)")

    def _decode():
        if cfg.data.streaming:
            return
        import threading as _threading

        stores["train"] = HostImageStore(
            train_table, cfg.data.canonical_size, cfg.data.decode_workers,
            layout=layout,
        )
        if early_commit:
            # ship + materialize on a separate thread while the test
            # split decodes (device transfers from worker threads are
            # the same pattern the prefetch loader uses)
            t = _threading.Thread(
                target=_commit_arena, args=("train",), daemon=True
            )
            t.start()
            commit_threads.append(t)
        stores["test"] = HostImageStore(
            test_table, cfg.data.canonical_size, cfg.data.decode_workers,
            layout=layout,
        )
        if early_commit:
            t = _threading.Thread(
                target=_commit_arena, args=("test",), daemon=True
            )
            t.start()
            commit_threads.append(t)

    import threading

    t_decode = Timer("decode")
    t_decode.__enter__()
    decode_thread = threading.Thread(target=_decode, daemon=True)
    decode_thread.start()

    # Mesh: on one chip this is a 1x1 mesh and the shardings are no-ops;
    # on a slice the same jitted step data-parallelizes (grad all-reduce
    # over ICI) with optional TP on the big MLP kernels.
    mesh = None
    data_sharding = None
    if len(jax.devices()) > 1:
        mesh = create_mesh(cfg.mesh)
        data_sharding = batch_sharding(mesh, cfg.mesh.data_axis)
        param_shardings = infer_param_shardings(
            state.params, mesh, cfg.mesh.model_axis
        )
        state = state.replace(
            params=jax.device_put(state.params, param_shardings)
        )
        if verbose:
            print(f"mesh: {dict(mesh.shape)}")
        if cfg.data.batch_size % mesh.shape[cfg.mesh.data_axis]:
            raise ValueError(
                f"batch_size {cfg.data.batch_size} not divisible by data-"
                f"parallel degree {mesh.shape[cfg.mesh.data_axis]}"
            )

    augment = (
        AugmentConfig(brightness=0.1, contrast=0.1, saturation=0.1)
        if cfg.data.augment
        else None
    )
    from skin_image_analysis_tpu.models.cnn import stem_wants_s2d

    # s2d stem models take the space-to-depth layout straight from the
    # Pallas kernel's store (free); every other path hands the model
    # plain NHWC and it transforms internally. model_cfg may come from
    # a checkpoint (resume/fine-tune), so resolve from it, not cfg.model;
    # the predicate mirrors the model's own use_s2d gate exactly
    emit_s2d = stem_wants_s2d(model_cfg)
    train_pre = make_preprocess_fn(
        cfg.data.image_size, train=True, augment=augment,
        normalize_imagenet=cfg.data.normalize_imagenet,
        input_affine=cfg.data.input_affine,
        layout=layout, pallas=cfg.data.pallas_preprocess,
        out_dtype=cfg.model.compute_dtype,  # cast at the kernel store
        space_to_depth=emit_s2d,
    )
    eval_pre = make_preprocess_fn(
        cfg.data.image_size, train=False,
        normalize_imagenet=cfg.data.normalize_imagenet,
        input_affine=cfg.data.input_affine,
        layout=layout,  # eval keeps the jnp resize path (reference
                        # Rescale semantics); planar just transposes
    )
    class_weights = cfg.optim.class_weights
    if cfg.optim.auto_class_weights and class_weights is None:
        # the imbalanced-sampling config: balanced class weights from the
        # train split (sklearn 'balanced' formula, ClassWeight.py parity)
        from skin_image_analysis_tpu.toneclassifier.class_weight import (
            balanced_class_weights,
        )

        class_weights = tuple(balanced_class_weights(train_table.labels))
        if verbose:
            print(f"class weights (balanced): {class_weights}")
    def _make_train_step():
        return make_train_step(
            class_weights=class_weights, preprocess_fn=train_pre,
            mesh=mesh, data_axis=cfg.mesh.data_axis,
        )

    train_step = _make_train_step()
    eval_step = make_eval_step(
        preprocess_fn=eval_pre, mesh=mesh, data_axis=cfg.mesh.data_axis
    )

    # Whether multi-step dispatch will run is fully predictable BEFORE
    # decoding (arena rows == table rows, uint8 canonical frames), so
    # the whole cold start — 1-step, eval, AND multi-step programs —
    # warm-compiles on predicted shapes while the decode thread works.
    bs, s = cfg.data.batch_size, cfg.data.canonical_size
    k_spd = cfg.data.steps_per_dispatch
    will_multi = (
        not cfg.data.streaming
        and cfg.data.device_cache
        and k_spd > 1
        and predicted_arena_bytes <= cfg.data.device_cache_max_bytes
        and len(train_table) > 0
    )

    px_shape = (bs, 3, s, s) if layout == "planar" else (bs, s, s, 3)
    dummy = {
        "pixels": jax.numpy.zeros(px_shape, jax.numpy.uint8),
        "label": jax.numpy.zeros((bs,), jax.numpy.int32),
        "row_id": jax.numpy.zeros((bs,), jax.numpy.int32),
        "valid": jax.numpy.zeros((bs,), bool),
    }
    if data_sharding is not None:
        dummy = jax.device_put(dummy, data_sharding)

    replicated = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(mesh, PartitionSpec())

    def _copy_state():
        return _shared_copy_state(state)

    def _warm():
        """Warm-compile on dummy data while the decode thread works
        (compile + decode are the two cold-start costs; overlap them).
        A real call is required — lower().compile() does not seed the
        jit dispatch cache — so steps run once on a throwaway COPY of
        the state (they donate their first argument)."""
        with Timer("compile") as t_compile:
            warm_state = _copy_state()
            warm_state, _ = train_step(warm_state, dummy)
            ev = eval_step(
                warm_state.params, warm_state.apply_fn, dummy,
                warm_state.batch_stats,
            )
            jax.device_get(ev["pred"])  # fence: compiles done
        return t_compile.elapsed

    # The zeros-arena warm compiles run CONCURRENTLY with the early-
    # commit threads shipping the real arenas: near the device-cache
    # budget the transient peak (real train+test arenas + one arena-
    # sized zeros buffer) could crowd HBM. When that peak exceeds
    # 2x the cache budget (the headroom a 16 GB chip has over the
    # default 8 GB arena budget), wait for decode+commit and warm on
    # the REAL arena instead — the warm rows are inert (all-False
    # valid / garbage pixels through a pure forward), and neither
    # multi program donates its arena argument, so this is side-
    # effect-free; the overlap is sacrificed only in the extreme case.
    def _warm_buffer(split, n_rows, shape):
        import jax.numpy as jnp

        peak = predicted_arena_bytes + _arena_bytes(n_rows)
        if early_commit and peak > 2 * cfg.data.device_cache_max_bytes:
            decode_thread.join()  # ensures all committers are spawned
            for t in commit_threads:
                t.join()
            if split in early_arenas:
                return early_arenas[split]
        buf = jnp.zeros(shape, jnp.uint8)
        if replicated is not None:
            buf = jax.device_put(buf, replicated)
        return buf

    def _warm_multi(ms):
        """One inert super-step (all-False valid) on an arena of the
        predicted shape — compiles the real program before decode
        finishes; the real arena has the same shape so the epoch loop
        hits the cache."""
        import jax.numpy as jnp

        n = len(train_table)
        arena_shape = (n, 3, s, s) if layout == "planar" else (n, s, s, 3)
        with Timer("compile-multi") as t_multi:
            warm_arena = _warm_buffer("train", n, arena_shape)
            zi = jnp.zeros((k_spd, bs), jnp.int32)
            zv = jnp.zeros((k_spd, bs), bool)
            if replicated is not None:
                zi, zv = jax.device_put((zi, zv), replicated)
            warm_state, m = ms(_copy_state(), warm_arena, zi, zi.copy(), zv)
            jax.device_get(m["loss"])
            del warm_state, warm_arena
        return t_multi.elapsed

    def _fallback_to_jnp_preprocess(exc):
        """Some shapes trip Mosaic's compile ceilings in the fused
        kernel. Degrade to the planar jnp preprocess and recompile —
        correctness first."""
        nonlocal train_pre, train_step
        if verbose:
            print(f"pallas preprocess compile failed "
                  f"({type(exc).__name__}); falling back to jnp path")
        train_pre = make_preprocess_fn(
            cfg.data.image_size, train=True, augment=augment,
            normalize_imagenet=cfg.data.normalize_imagenet,
            input_affine=cfg.data.input_affine,
            layout=layout, pallas="off",
        )
        train_step = _make_train_step()

    # Warm the 1-step train program FIRST even when the epoch loop will
    # only call the multi-step program: compiling the scan-of-k program
    # cold measures 500-900 s through the remote-compile relay, but
    # ~20 s when the 1-step program compiled immediately before in the
    # same process (measured both orders, docs/PERF.md §Cold start) —
    # and the 1-step program remains the fallback if multi is disabled.
    try:
        elapsed = _warm()
        if verbose:
            print(f"warm-compiled train+eval steps in {elapsed:.1f}s")
    except Exception as e:
        if use_planar:
            _fallback_to_jnp_preprocess(e)
            try:
                elapsed = _warm()
                if verbose:
                    print(f"warm-compiled train+eval steps in "
                          f"{elapsed:.1f}s (jnp preprocess)")
            except Exception as e2:
                if verbose:
                    print(f"warm compile skipped ({type(e2).__name__}: "
                          f"{e2}); first batch will compile instead")
        elif verbose:
            print(f"warm compile skipped ({type(e).__name__}: {e}); "
                  "first batch will compile instead")

    multi_step = None
    eval_multi = None
    if will_multi:
        multi_step = make_multi_train_step(
            k_spd, class_weights=class_weights, mesh=mesh,
            data_axis=cfg.mesh.data_axis, preprocess_fn=train_pre,
        )
        try:
            elapsed = _warm_multi(multi_step)
            if verbose:
                print(f"multi-step dispatch: {k_spd} steps/program "
                      f"(compiled in {elapsed:.1f}s)")
        except Exception as e:
            if verbose:
                print(f"multi-step dispatch disabled "
                      f"({type(e).__name__}: {e})")
            multi_step = None
    if multi_step is not None and len(test_table) > 0:
        # Scanned eval: k batches per dispatch over the test arena —
        # per-epoch full-test fairness eval stops paying the ~2 ms
        # relay tax per batch (mirror of the train multi-step).
        eval_multi = make_multi_eval_step(
            k_spd, mesh=mesh, data_axis=cfg.mesh.data_axis,
            preprocess_fn=eval_pre,
        )
        try:
            import jax.numpy as jnp

            n_test = len(test_table)
            ev_shape = ((n_test, 3, s, s) if layout == "planar"
                        else (n_test, s, s, 3))
            warm_ev = _warm_buffer("test", n_test, ev_shape)
            zi = jnp.zeros((k_spd, bs), jnp.int32)
            zv = jnp.zeros((k_spd, bs), bool)
            if replicated is not None:
                zi, zv = jax.device_put((zi, zv), replicated)
            with Timer("compile-eval-multi") as t_ev:
                out = eval_multi(
                    state.params, state.apply_fn, warm_ev, zi,
                    zi.copy(), zv, state.batch_stats,
                )
                jax.device_get(out["pred"])
            del warm_ev
            if verbose:
                print(f"multi-batch eval: {k_spd} batches/program "
                      f"(compiled in {t_ev.elapsed:.1f}s)")
            if replicated is not None:
                # mesh runs: commit the [k,B] index arrays to the same
                # replicated sharding the program was warm-compiled
                # with — uncommitted args would miss the jit cache and
                # recompile through the relay on the first real eval
                _em, _rep = eval_multi, replicated

                def eval_multi(params, apply_fn, arena, ib, rid, vd,
                               batch_stats=None):
                    import jax.numpy as jnp

                    ib, rid, vd = jax.device_put(
                        (jnp.asarray(ib), jnp.asarray(rid),
                         jnp.asarray(vd)),
                        _rep,
                    )
                    return _em(params, apply_fn, arena, ib, rid, vd,
                               batch_stats)
        except Exception as e:
            if verbose:
                print(f"multi-batch eval disabled "
                      f"({type(e).__name__}: {e})")
            eval_multi = None

    decode_thread.join()
    for t in commit_threads:
        t.join()
    t_decode.__exit__(None, None, None)

    train_arena = test_arena = None
    if cfg.data.streaming:
        # Archive-scale path (ISIC-2020 config): decode-ahead chunks, no
        # whole-cohort arenas in RAM or HBM.
        from skin_image_analysis_tpu.data.streaming import ChunkedBatchIterator

        cache_train = cache_test = None
        if cfg.data.stream_cache:
            s = cfg.data.canonical_size
            cache_train = os.path.join(folder, f"stream_cache_train_{s}.npy")
            cache_test = os.path.join(folder, f"stream_cache_test_{s}.npy")
        train_loader = ChunkedBatchIterator(
            train_table,
            canonical_size=cfg.data.canonical_size,
            batch_size=cfg.data.batch_size,
            chunk_size=cfg.data.chunk_size,
            shuffle=True,
            drop_remainder=cfg.data.drop_remainder,
            seed=cfg.data.seed + 1,
            sharding=data_sharding,
            cache_path=cache_train,
        )
        test_loader = ChunkedBatchIterator(
            test_table,
            canonical_size=cfg.data.canonical_size,
            batch_size=cfg.data.batch_size,
            chunk_size=cfg.data.chunk_size,
            shuffle=False,
            drop_remainder=False,
            seed=0,
            sharding=data_sharding,
            cache_path=cache_test,
        )
        if verbose:
            print(f"streaming ingest: chunks of {cfg.data.chunk_size}")
    else:
        train_store, test_store = stores["train"], stores["test"]
        if verbose:
            n = len(train_store) + len(test_store)
            print(f"decoded {n} images in {t_decode.elapsed:.1f}s "
                  f"(overlapped with compilation)")

        # Device-resident arenas: pixels cross the host link exactly once,
        # batches gather on-device every epoch after that. With a mesh the
        # arena is replicated across devices so each device gathers its
        # batch shard locally (the jitted gather in BatchIterator carries
        # the batch output-sharding) — no per-batch cross-device traffic.
        if cfg.data.device_cache:
            total_bytes = (
                train_store.images.nbytes + test_store.images.nbytes
            )
            if total_bytes <= cfg.data.device_cache_max_bytes:
                arena_sharding = None
                if mesh is not None:
                    from jax.sharding import (
                        NamedSharding,
                        PartitionSpec,
                    )

                    arena_sharding = NamedSharding(
                        mesh, PartitionSpec()
                    )

                # reuse whichever splits the committer threads already
                # shipped + materialized (the link transfer overlapped
                # decode + compiles); re-commit ONLY the missing ones —
                # keeping a half-committed early arena alive while
                # re-committing both splits would hold a duplicate
                # multi-GB buffer in HBM for the whole run
                def _arena(split, store):
                    if early_commit and split in early_arenas:
                        return early_arenas[split]
                    try:
                        return store.to_device(arena_sharding)
                    except Exception as e:  # jaxlib RuntimeError family
                        if "RESOURCE_EXHAUSTED" not in str(e):
                            raise
                        # HBM is spoken for (params/opt/program at
                        # extreme resolutions — measured: the 1024²
                        # flagship's 4.3 GB dense leaves no room for
                        # the test arena at B=8). Degrade THIS split to
                        # host-resident batches instead of crashing:
                        # slower (per-batch host link) but it trains.
                        if verbose:
                            print(f"arena commit for '{split}' exceeds "
                                  "free device memory — falling back "
                                  "to host-resident batches for this "
                                  "split (docs/PERF.md §Full "
                                  "resolution)", flush=True)
                        return None

                train_arena = _arena("train", train_store)
                test_arena = _arena("test", test_store)
                if verbose and (
                    train_arena is not None or test_arena is not None
                ):
                    print(f"device-cached {total_bytes / 1e6:.0f} MB of images")

        train_loader = BatchIterator(
            train_store,
            cfg.data.batch_size,
            shuffle=True,
            drop_remainder=cfg.data.drop_remainder,
            seed=cfg.data.seed + 1,
            prefetch=cfg.data.prefetch_depth,
            sharding=data_sharding,
            device_arena=train_arena,
        )
        # Multi-step dispatch (scan k train steps per XLA program with
        # on-device arena gathers, docs/PERF.md) was built and
        # warm-compiled BEFORE decode on a predicted-shape zeros arena;
        # the prediction is exact (arena rows == table rows), so this
        # guard only fires if the arena unexpectedly failed to
        # materialize.
        if multi_step is not None and train_arena is None:
            multi_step = None
        test_loader = BatchIterator(
            test_store,
            cfg.data.batch_size,
            shuffle=False,
            drop_remainder=False,
            seed=0,
            prefetch=cfg.data.prefetch_depth,
            sharding=data_sharding,
            device_arena=test_arena,
        )

    start = time.time()
    if cfg.checkpoint_best or cfg.early_stop_patience:
        # validate UP FRONT — discovering a typo'd metric after the
        # first (expensive) epoch would abort before the end-of-run
        # save and lose the weights
        if cfg.best_metric not in _BEST_METRICS:
            raise ValueError(
                f"best_metric {cfg.best_metric!r} is not trackable; "
                f"choose one of {_BEST_METRICS}")
        if (cfg.best_metric not in ("loss", "avg_batch_loss")
                and not cfg.eval_every):
            raise ValueError(
                f"best_metric {cfg.best_metric!r} comes from the "
                "fairness eval record, which eval_every=0 disables — "
                "enable eval or track 'loss'")
    # best_metric value seen so far — seeded from the folder's prior
    # epoch records on resume, so a worse post-resume epoch can never
    # overwrite a better pre-crash session_model_best
    best_value = _prior_best(folder, cfg.best_metric) if (
        cfg.checkpoint_best or cfg.early_stop_patience) else None
    epochs_since_best = 0      # early-stop counter (metric epochs only)
    epochs_run = 0
    for epoch in range(cfg.epochs):
        epoch_start = time.time()
        record = None
        if verbose:
            print(f"Epoch {epoch + 1}/{cfg.epochs}")
            print("-" * 10)
        # metric handles stay on device for the whole epoch — a host
        # readback per batch would serialize the async dispatch pipeline;
        # only the (optional) periodic printout forces a sync
        epoch_metrics = []
        if multi_step is not None:
            import numpy as _np

            import jax.numpy as jnp

            rep = replicated
            for i, (ib, lb, vd) in enumerate(
                train_loader.super_batches(cfg.data.steps_per_dispatch)
            ):
                args = (jnp.asarray(ib), jnp.asarray(lb), jnp.asarray(vd))
                if rep is not None:
                    args = jax.device_put(args, rep)
                state, metrics = multi_step(state, train_arena, *args)
                epoch_metrics.append(metrics)
                if verbose and cfg.log_every_batches and i == 0:
                    print(
                        f"  batch 0: loss={float(metrics['loss'][0]):.4f}"
                    )
            fetched = jax.device_get(epoch_metrics)
            losses = _np.concatenate([m["loss"] for m in fetched])
            counts = _np.concatenate([m["count"] for m in fetched])
            corr = _np.concatenate([m["correct"] for m in fetched])
            live = counts > 0  # padded tail super-steps are inert
            n_batches = int(live.sum())
            avg_batch_loss = float(losses[live].mean()) if n_batches else 0.0
            corrects = int(corr.sum())
            count = int(counts.sum())
        else:
            for i, batch in enumerate(train_loader):
                state, metrics = train_step(state, batch)
                epoch_metrics.append(metrics)
                if verbose and cfg.log_every_batches and i % cfg.log_every_batches == 0:
                    # pulls metrics to host — matches the reference's
                    # periodic batch printout (tone_bias_train.py:149-150)
                    print(f"  batch {i}: loss={float(metrics['loss']):.4f}")
            fetched = jax.device_get(epoch_metrics)  # one sync for the epoch
            n_batches = len(fetched)
            avg_batch_loss = (
                float(sum(m["loss"] for m in fetched)) / max(n_batches, 1)
            )
            corrects = int(sum(m["correct"] for m in fetched))
            count = int(sum(m["count"] for m in fetched))
        train_accuracy = corrects / max(count, 1)
        epoch_time = time.time() - epoch_start
        if verbose:
            print(f"Train Loss: {avg_batch_loss:.4f} Train Acc: {train_accuracy:.4f}")
            print(f"Epoch time: {epoch_time:.2f}s\n")

        if cfg.checkpoint_every and (epoch + 1) % cfg.checkpoint_every == 0:
            # Periodic crash-recovery snapshot (full fidelity: params +
            # optimizer + RNG); the reference only has end-of-run saves.
            # Orbax state only — a per-epoch model artifact would double
            # the ~100 MB/s host-link cost of durability. The progress
            # marker is written AFTER the snapshot and records the total
            # epochs that snapshot contains: elastic resume only ever
            # counts snapshot-backed epochs, so a crash anywhere re-trains
            # at most the unsnapshotted tail, never skips a lost epoch.
            ckpt_lib.save_train_state(ckpt_dir, state)
            _mark_progress(folder, base_done + epoch + 1)

        if cfg.eval_every and (epoch + 1) % cfg.eval_every == 0:
            eval_start = time.time()
            record = evaluate_fairness(
                state.params, state.apply_fn, test_loader, test_table,
                eval_step=eval_step, batch_stats=state.batch_stats,
                multi_eval=eval_multi, arena=test_arena, eval_k=k_spd,
            )
            record["avg_batch_loss"] = avg_batch_loss
            record["train_accuracy"] = train_accuracy
            record["epoch"] = epoch
            record["epoch_time_s"] = epoch_time
            record["eval_time_s"] = time.time() - eval_start
            jsonl.append_record(results_path, record)

        # Best-checkpoint / early-stop bookkeeping (the legacy
        # notebook's best-val pattern, tone_bias_torch.py:943-1014, and
        # the improvement the reference discusses but does not ship,
        # tone_bias_train.py:438-442). 'loss' tracks the train avg
        # batch loss every epoch (lower is better); any other
        # best_metric reads the fairness eval record ('accuracy',
        # 'auc', ... higher is better) and therefore only updates on
        # eval epochs — non-eval epochs neither improve nor consume
        # early-stop patience.
        if cfg.best_metric in ("loss", "avg_batch_loss"):
            current, higher_better = avg_batch_loss, False
        elif record is not None and record.get(cfg.best_metric) is not None:
            # validated upfront; .get covers records that legitimately
            # omit a key (e.g. auc_dark on an all-light test split)
            current, higher_better = float(record[cfg.best_metric]), True
        else:
            current = None
        epochs_run = epoch + 1
        if current is not None:
            improved = best_value is None or (
                current > best_value if higher_better
                else current < best_value)
            if improved:
                best_value = current
                epochs_since_best = 0
                if cfg.checkpoint_best:
                    ckpt_lib.save_model(
                        os.path.join(folder,
                                     ckpt_lib.BEST_MODEL_FILENAME),
                        model_cfg, state.params, state.batch_stats,
                    )
            else:
                epochs_since_best += 1
            if (cfg.early_stop_patience
                    and epochs_since_best >= cfg.early_stop_patience):
                if verbose:
                    print(
                        f"early stop: {cfg.best_metric} has not "
                        f"improved for {epochs_since_best} epochs "
                        f"(best {best_value:.4f})")
                break

        # Fault injection (SURVEY §5 row the reference lacks): if the
        # env names a sentinel file, consume it and crash exactly once —
        # how the elastic-resume path (run_training_elastic) is tested
        # end to end without real hardware failures.
        fault = os.environ.get("SIA_FAULT_ONCE")
        if fault and os.path.exists(fault):
            os.remove(fault)
            raise RuntimeError(
                f"injected fault after epoch {epoch} (SIA_FAULT_ONCE)"
            )

    elapsed = time.time() - start
    if verbose:
        print(f"Training complete in {elapsed // 60:.0f}m {elapsed % 60:.0f}s")
        print(f"Average time per epoch (in mins): {elapsed / 60.0 / max(cfg.epochs, 1):.2f}")

    ckpt_lib.save_model(model_path, model_cfg, state.params, state.batch_stats)
    ckpt_lib.save_train_state(ckpt_dir, state)
    # epochs_run < cfg.epochs when early stopping fired — the progress
    # marker records epochs actually trained, so resume semantics stay
    # truthful
    _mark_progress(folder, base_done + epochs_run)
    return folder


def _prior_best(folder: str, metric: str):
    """Best ``metric`` value across the folder's existing epoch records
    (all timestamped JSON-lines files — resumes append a new one).
    'loss' reads avg_batch_loss (lower better); anything else is a
    higher-better record key. None when no prior value exists."""
    import glob
    import json as _json

    lower_better = metric in ("loss", "avg_batch_loss")
    key = "avg_batch_loss" if lower_better else metric
    values: list[float] = []
    for p in glob.glob(os.path.join(folder, "*.json")):
        if not os.path.basename(p)[0].isdigit():
            continue
        with open(p) as f:
            for line in f:
                if not line.strip():
                    continue
                # a run killed mid-write leaves a truncated final line;
                # the crash-recovery path must tolerate it or --keep-best
                # resumes die on the very file the crash produced
                try:
                    rec = _json.loads(line)
                except ValueError:
                    continue
                if key in rec:
                    values.append(float(rec[key]))
    if not values:
        return None
    return min(values) if lower_better else max(values)


def _mark_progress(folder: str, total_epochs_done: int) -> None:
    """Append a progress marker: the TOTAL snapshot-backed epochs in the
    folder as of the save that just completed."""
    with open(os.path.join(folder, PROGRESS_FILENAME), "a") as f:
        f.write(f"{int(total_epochs_done)}\n")


def completed_epochs(folder: str) -> int:
    """Snapshot-backed completed epochs in an experiment folder: the
    last progress marker (written right after each state save). For
    pre-marker legacy folders, fall back to counting fairness records —
    but only when a model artifact exists (without persisted weights the
    correct answer is 0: those epochs cannot be resumed, only
    re-trained)."""
    import glob

    progress = os.path.join(folder, PROGRESS_FILENAME)
    if os.path.exists(progress):
        last = 0
        with open(progress) as f:
            for line in f:
                if line.strip():
                    last = int(line)
        return last
    if not os.path.exists(os.path.join(folder, ckpt_lib.MODEL_FILENAME)):
        return 0
    n = 0
    for p in glob.glob(os.path.join(folder, "*.json")):
        if os.path.basename(p)[0].isdigit():
            with open(p) as f:
                n += sum(1 for line in f if line.strip())
    return n


def run_training_elastic(
    cfg: TrainConfig, retries: int = 0, verbose: bool = True
) -> str:
    """``run_training`` with automated crash recovery (SURVEY §5's
    failure-detection/elastic row — the reference's recovery is manual
    resume-by-rerun, tone_bias_train.py:240-249; this supervises it).

    Epoch semantics match plain ``run_training`` exactly: ``cfg.epochs``
    ADDITIONAL epochs on whatever the target folder already holds. On an
    exception the supervisor locates the experiment folder (the one it
    was resuming, or the newest folder of this mode created since the
    supervisor started — mode inferred the same way run_training infers
    it), subtracts the epochs snapshot-backed since this invocation's
    start, and resumes for the remainder — up to ``retries`` restarts. Pair with
    ``checkpoint_every=1`` for epoch-granular recovery: the snapshot is
    saved before the epoch's progress marker, so a crash in between
    re-trains that epoch from its own snapshot (never the reverse). A
    wedged accelerator runtime still needs a process restart; this
    covers transient failures the process survives. Tested via the
    SIA_FAULT_ONCE injection hook."""
    import dataclasses
    import glob

    supervisor_start = time.time()
    target = cfg.experiment_dir
    # Mode prefix from the SAME inference run_training will use — a
    # nonexistent experiment_dir named 'imbalanced_x' overrides
    # cfg.data.balance (resolve_experiment_folder), so deriving the glob
    # prefix from cfg.data.balance alone could watch the wrong prefix
    # forever and restart from scratch every retry.
    _, _, _balance = resolve_experiment_folder(cfg)
    prefix = "balanced" if _balance else "imbalanced"
    # cfg.epochs keeps plain run_training's ADDITIONAL-epochs semantics:
    # the folder must end this invocation with start_epochs + cfg.epochs.
    # The remaining-epochs subtraction below applies only after a crash
    # THIS supervisor saw — never silently no-ops a complete folder the
    # user pointed at (same CLI, same semantics with or without
    # --auto-resume).
    expected_total = cfg.epochs + (
        completed_epochs(target)
        if target and os.path.isdir(target)
        else 0
    )
    failures = 0
    while True:
        run_cfg = cfg
        if failures and target and os.path.isdir(target):
            remaining = expected_total - completed_epochs(target)
            if remaining <= 0:
                if verbose:
                    print("auto-resume: training already complete")
                return target
            run_cfg = dataclasses.replace(
                cfg, epochs=remaining, experiment_dir=target
            )
        try:
            return run_training(run_cfg, verbose=verbose)
        except KeyboardInterrupt:
            raise
        except Exception as e:
            failures += 1
            if failures > retries:
                raise

            def _has_splits(d):
                # BOTH frozen-split CSVs (test is written last); a folder
                # missing either can never resume
                return all(
                    os.path.exists(os.path.join(d, f))
                    for f in (TRAIN_SET_FILENAME, TEST_SET_FILENAME)
                )

            if target and os.path.isdir(target) and not _has_splits(target):
                # half-made folder: abandon it and run fresh instead —
                # including when cfg itself named it, or retries would
                # re-resume the same broken folder forever
                target = None
                if cfg.experiment_dir:
                    cfg = dataclasses.replace(cfg, experiment_dir=None)
            if not (target and os.path.isdir(target)):
                # fresh run died: find the folder it created, if any
                cands = [
                    d for d in glob.glob(
                        os.path.join(cfg.results_dir, f"{prefix}_*")
                    )
                    if os.path.isdir(d)
                    and os.path.getmtime(d) >= supervisor_start - 1
                    and _has_splits(d)
                ]
                if cands:
                    target = max(cands, key=os.path.getmtime)
            if verbose:
                print(f"auto-resume: restart {failures}/{retries} after "
                      f"{type(e).__name__}: {e} -> "
                      f"{target or 'fresh run'}")
