"""Online serving: bucketed batching + request coalescing over the
compiled inference program.

The reference has no online-serving story — deployment is "unpickle the
module and loop batches by hand" (tone_bias_model.py:305-338,
tone_bias_test.py:565-652). The TPU-native one has three parts, each
shaped by how XLA actually behaves:

1. **One inference program, a small ladder of batch shapes.** Every
   distinct input shape is a separate XLA compile (30-90 s through a
   remote-compile relay; seconds locally) — compiling per request size
   would melt a serving process. :class:`InferenceSession` therefore
   evaluates only at power-of-two batch *buckets*: requests pad with
   zero rows to the nearest bucket and outputs slice back. Bounded
   compiles, static shapes, full MXU batches.
2. **Request coalescing.** Dispatching one image at a time pays the
   per-program dispatch floor (~2 ms through the relay) per image;
   :class:`DynamicBatcher` drains concurrent requests from a queue and
   ships them as ONE device call — the classic dynamic-batching serving
   pattern, sized by ``max_batch``/``window_ms``.
3. **A thin HTTP front end** (:func:`serve_http`, stdlib only): POST an
   encoded image, get the prediction JSON. Decode happens host-side at
   the same exact-resize geometry as training
   (data/loader.py:decode_image_bytes).

The session serves either source of truth:

- an experiment folder (checkpoint + ModelConfig → the same inference
  program the AOT export lowers, serve/export.py) — with the weights as
  a CALL ARGUMENT, so ``reload_weights``/``POST /reload`` hot-swaps a
  retrained same-architecture checkpoint with zero recompiles (the
  trainer-writes/server-reloads loop; a restart would re-pay 30-90 s
  per bucket through the remote-compile relay), or
- an exported StableHLO artifact (``jax.export`` — no model code needed
  at the serving site; ``exported.call`` is jit-compatible so the bucket
  ladder applies identically; weights are embedded, so no hot reload).
"""

from __future__ import annotations

import json
import os
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp


def _buckets(max_batch: int) -> list[int]:
    out, b = [], 1
    while b < max_batch:
        out.append(b)
        b *= 2
    out.append(max_batch)
    return out


class InferenceSession:
    """The compiled inference program behind a pad-to-bucket call.

    ``predict(pixels)`` accepts uint8 ``[n, S, S, C]`` for ANY n: rows
    pad to the nearest power-of-two bucket ≤ ``max_batch`` (one XLA
    compile per bucket, ever), batches larger than ``max_batch`` split
    into full chunks. Thread-safe: jitted calls serialize on a lock so
    the dispatch order stays deterministic under the HTTP threads.
    """

    def __init__(self, infer_fn: Callable, image_size: int,
                 in_channels: int = 3, max_batch: int = 64,
                 class_names: Sequence[str] = ("benign", "malignant"),
                 source: str = "experiment", mesh=None,
                 data_axis: str = "data", weights=None, model_cfg=None,
                 normalize_imagenet: bool = False,
                 input_affine: tuple | None = None,
                 model_filename: str = "session_model.msgpack"):
        self._jit = jax.jit(infer_fn)
        # weights-as-argument sessions (from_experiment) can hot-swap
        # same-architecture checkpoints with ZERO recompiles — jit's
        # cache keys on the variables' tree structure + leaf shapes,
        # not their values (reload_weights). Artifact sessions embed
        # the weights as program constants (weights=None).
        self._weights = weights
        self._model_cfg = model_cfg
        self._normalize = bool(normalize_imagenet)
        self._input_affine = input_affine
        # the artifact name this session serves (and reloads/watches):
        # session_model.msgpack, or session_model_best.msgpack when
        # launched with --best — the watcher then tracks --keep-best
        # improvements instead of every checkpoint write
        self.model_filename = model_filename
        self.reloads = 0
        self.image_size = int(image_size)
        self.in_channels = int(in_channels)
        if int(max_batch) < 1:
            raise ValueError(f"max_batch must be >= 1, got {max_batch}")
        self.max_batch = int(max_batch)
        self.class_names = list(class_names)
        self.source = source
        self.buckets = _buckets(self.max_batch)
        if mesh is not None:
            # DP serving: every evaluated shape must divide over the
            # data axis, so the ladder keeps only multiples of its
            # extent (padding rows absorb the rest)
            n = mesh.shape[data_axis]
            self.buckets = [b for b in self.buckets if b % n == 0]
            if not self.buckets:
                raise ValueError(
                    f"max_batch={max_batch} cannot shard over "
                    f"{n} data-axis devices")
            # a filtered ladder may lose the cap itself (e.g. 60 with 8
            # devices): chunking must target a real bucket
            self.max_batch = self.buckets[-1]
        self.mesh = mesh
        self._lock = threading.Lock()
        self.compiled: set[int] = set()
        self._warming: set[int] = set()
        self._warm_lock = threading.Lock()

    # -- constructors ----------------------------------------------------

    @classmethod
    def from_experiment(cls, folder: str, max_batch: int = 64,
                        class_names: Sequence[str] | None = None,
                        mesh=None, data_axis: str = "data",
                        model_filename: str | None = None,
                        ) -> "InferenceSession":
        """Serve straight from an experiment folder (a tone_bias_train
        experiment OR a transfer trainer's out_dir — same artifact
        format): same program the AOT export lowers.
        ``model_filename`` picks a different artifact in the folder
        (e.g. ``session_model_best.msgpack``, the --keep-best
        checkpoint); reload/watch then track that same file."""
        import os

        from skin_image_analysis_tpu.serve.export import (
            build_infer_fn_weights_arg,
        )
        from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

        model_filename = model_filename or ckpt_lib.MODEL_FILENAME
        model_cfg, loaded = ckpt_lib.load_model(
            os.path.join(folder, model_filename)
        )
        params, batch_stats = ckpt_lib.split_variables(loaded)
        normalize, affine, train_cfg = False, None, {}
        cfg_path = os.path.join(folder, "train_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                train_cfg = json.load(f)
            normalize = bool(train_cfg.get("data", {}).get(
                "normalize_imagenet", False))
            affine = train_cfg.get("data", {}).get("input_affine")
        if class_names is None:
            class_names = train_cfg.get("class_names",
                                        ("benign", "malignant"))
        weights: dict[str, Any] = {"params": params}
        if batch_stats is not None:
            weights["batch_stats"] = batch_stats
        weights = cls._commit_weights(weights, mesh)
        # weights ride as a call argument (not program constants) so
        # reload_weights() can hot-swap a retrained checkpoint without
        # recompiling any bucket
        infer = build_infer_fn_weights_arg(
            model_cfg, normalize_imagenet=normalize,
            mesh=mesh, data_axis=data_axis, input_affine=affine)
        # requests carry RGB pixels regardless of the model's input
        # channels — ITA-input models transform inside the program
        return cls(infer, model_cfg.image_size, 3, max_batch,
                   class_names, source=folder, mesh=mesh,
                   data_axis=data_axis, weights=weights,
                   model_cfg=model_cfg, normalize_imagenet=normalize,
                   input_affine=affine, model_filename=model_filename)

    @classmethod
    def from_experiment_quantized(cls, folder: str, calib_pixels,
                                  max_batch: int = 64,
                                  class_names: Sequence[str] | None = None,
                                  model_filename: str | None = None,
                                  calib_mode: str = "max",
                                  ) -> "InferenceSession":
        """Serve the int8 post-training-quantized program straight from
        an experiment folder (serve/quantize.py — measured 1.41x the
        bf16 serving rate, docs/PERF.md §int8). The quantized weights
        ride as program constants, so these sessions cannot hot-reload
        (a new checkpoint needs recalibration anyway — restart, or
        export a fresh artifact)."""
        import os

        from skin_image_analysis_tpu.serve.quantize import (
            build_infer_fn_quantized,
            quantize_model,
        )
        from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

        model_filename = model_filename or ckpt_lib.MODEL_FILENAME
        model_cfg, loaded = ckpt_lib.load_model(
            os.path.join(folder, model_filename)
        )
        params, batch_stats = ckpt_lib.split_variables(loaded)
        normalize, affine, train_cfg = False, None, {}
        cfg_path = os.path.join(folder, "train_config.json")
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                train_cfg = json.load(f)
            normalize = bool(train_cfg.get("data", {}).get(
                "normalize_imagenet", False))
            affine = train_cfg.get("data", {}).get("input_affine")
        if class_names is None:
            class_names = train_cfg.get("class_names",
                                        ("benign", "malignant"))
        qtree = quantize_model(
            model_cfg, params, calib_pixels,
            normalize_imagenet=normalize, input_affine=affine,
            batch_stats=batch_stats, calib_mode=calib_mode)
        infer = build_infer_fn_quantized(qtree)
        return cls(infer, model_cfg.image_size, 3, max_batch,
                   class_names, source=folder,
                   normalize_imagenet=normalize, input_affine=affine,
                   model_filename=model_filename)

    @staticmethod
    def _commit_weights(weights, mesh):
        """Device-commit the checkpoint's host arrays once — without
        this, every jitted call would re-upload the full weight set
        over the (slow) host link. With a mesh, replicate across it."""
        if mesh is not None:
            from skin_image_analysis_tpu.parallel.sharding import (
                replicated,
            )

            return jax.device_put(weights, replicated(mesh))
        return jax.device_put(weights)

    @classmethod
    def from_artifact(cls, path: str, max_batch: int = 64,
                      ) -> "InferenceSession":
        """Serve a deserialized StableHLO artifact (no model code)."""
        import os

        from skin_image_analysis_tpu.serve.export import (
            MANIFEST_SUFFIX,
            load_exported,
        )

        exported = load_exported(path)
        manifest: dict[str, Any] = {}
        if os.path.exists(path + MANIFEST_SUFFIX):
            with open(path + MANIFEST_SUFFIX) as f:
                manifest = json.load(f)
        shape = manifest.get("input", {}).get("shape")
        if shape:
            size, channels = int(shape[1]), int(shape[3])
            if isinstance(shape[0], int):
                # fixed-batch artifact: the only legal bucket is the
                # exported batch itself
                max_batch = int(shape[0])
        else:
            spec = exported.in_avals[0]
            size, channels = int(spec.shape[1]), int(spec.shape[3])
        sess = cls(exported.call, size, channels, max_batch,
                   manifest.get("class_names", ["benign", "malignant"]),
                   source=path)
        if shape and isinstance(shape[0], int):
            sess.buckets = [int(shape[0])]
        return sess

    # -- calls ------------------------------------------------------------

    def _bucket(self, n: int) -> int:
        """Smallest bucket ≥ n, PREFERRING already-compiled buckets: a
        cold mid-ladder bucket is a 30-90 s compile stall on the
        request's critical path through the remote-compile relay, while
        padding up to a warmed bucket costs microseconds of zero rows
        (measured r5: a `--warm 1,8` daemon held 16-client traffic to
        ~55 req/s against ~142 with usable larger buckets). The exact
        bucket still wins when it is warm, and still compiles when no
        warmed bucket can hold the batch."""
        exact = None
        for b in self.buckets:
            if n <= b:
                exact = b
                break
        if exact is None:
            return self.buckets[-1]
        if exact in self.compiled:
            return exact
        for b in self.buckets:
            if n <= b and b in self.compiled:
                return b
        return exact

    def warm(self, buckets: Sequence[int] | None = None) -> None:
        """Pre-compile the bucket ladder on zeros (smallest first — the
        compile-order effect measured in docs/PERF.md §Cold start)."""
        for b in sorted(buckets or self.buckets):
            self._run_bucket(np.zeros(
                (b, self.image_size, self.image_size, self.in_channels),
                np.uint8))

    def _run_bucket(self, pixels: np.ndarray) -> dict:
        """Dispatch one exactly-bucket-sized batch (no bucket
        redirection) under the serving lock."""
        b = pixels.shape[0]
        with self._lock:
            if self._weights is not None:
                out = self._jit(self._weights, jnp.asarray(pixels))
            else:
                out = self._jit(jnp.asarray(pixels))
            out = jax.device_get(out)
            self.compiled.add(b)
        return out

    def _warm_in_background(self, bucket: int) -> None:
        """Compile ``bucket`` on a daemon thread, OFF the serving lock
        (a first-hit compile under the lock stalls ALL traffic 30-90 s
        through the remote-compile relay). jax dispatch is thread-safe;
        the bucket joins ``compiled`` only after a full round-trip."""
        with self._warm_lock:
            if bucket in self.compiled or bucket in self._warming:
                return
            self._warming.add(bucket)

        def _go():
            try:
                zeros = jnp.asarray(np.zeros(
                    (bucket, self.image_size, self.image_size,
                     self.in_channels), np.uint8))
                with self._lock:
                    weights = self._weights
                if weights is not None:
                    out = self._jit(weights, zeros)
                else:
                    out = self._jit(zeros)
                jax.device_get(out)
                with self._warm_lock:
                    self.compiled.add(bucket)
            except Exception:
                pass  # the exact bucket stays cold; redirection continues
            finally:
                with self._warm_lock:
                    self._warming.discard(bucket)

        threading.Thread(target=_go, daemon=True).start()

    def predict(self, pixels: np.ndarray) -> dict[str, np.ndarray]:
        pixels = np.asarray(pixels, np.uint8)
        if pixels.ndim == 3:
            pixels = pixels[None]
        n = pixels.shape[0]
        if n == 0:
            raise ValueError("empty batch")
        if n > self.max_batch:
            chunks = [self.predict(pixels[i:i + self.max_batch])
                      for i in range(0, n, self.max_batch)]
            return {k: np.concatenate([c[k] for c in chunks])
                    for k in chunks[0]}
        b = self._bucket(n)
        exact = next((x for x in self.buckets if n <= x),
                     self.buckets[-1])
        if b != exact:
            # served on a warmed larger bucket this time; converge the
            # steady state back to the exact bucket (its padded rows
            # also pad the host->device TRANSFER) by compiling it OFF
            # the serving lock
            self._warm_in_background(exact)
        if n < b:
            pad = np.zeros((b - n,) + pixels.shape[1:], pixels.dtype)
            pixels = np.concatenate([pixels, pad])
        out = self._run_bucket(pixels)
        return {k: np.asarray(v)[:n] for k, v in out.items()}

    def reload_weights(self, folder: str | None = None,
                       warm: bool = True) -> dict[str, Any]:
        """Hot-swap the served weights from ``folder`` (default: this
        session's source experiment folder) WITHOUT recompiling any
        bucket — the standard trainer-writes/server-reloads deployment
        loop, impossible at acceptable cost with constants-embedded
        programs (every bucket would recompile: 30-90 s each through a
        remote-compile relay).

        The new checkpoint must be architecture-compatible: identical
        ModelConfig and an identical weights tree (structure + leaf
        shapes/dtypes). Anything else raises ValueError and the session
        keeps serving the OLD weights — a half-written or wrong-model
        artifact can never take down a live server. In-flight requests
        are consistent: the swap happens under the same lock predict()
        dispatches under.

        With ``warm`` (default), one inference on the smallest compiled
        bucket runs right after the swap so the weight transfer to the
        device happens now, not on the first live request (device_put
        through the axon relay is lazy — bytes move on first use).
        """
        import os

        from skin_image_analysis_tpu.train import checkpoint as ckpt_lib

        if self._weights is None:
            raise RuntimeError(
                "this session's weights are embedded program constants "
                "(exported artifact or int8-quantized session) — hot "
                "reload needs a float experiment-folder session")
        folder = folder or self.source
        model_cfg, loaded = ckpt_lib.load_model(
            os.path.join(folder, self.model_filename)
        )
        if model_cfg != self._model_cfg:
            raise ValueError(
                f"checkpoint architecture differs from the served one "
                f"({model_cfg} vs {self._model_cfg}); restart the "
                "server to change models")
        cfg_path = os.path.join(folder, "train_config.json")
        # a folder WITHOUT train_config.json trained under the default
        # convention (plain [0,1] floats) — run the same mismatch checks
        # against that, or --reload-any could silently hot-swap weights
        # trained under a different input convention
        data_cfg: dict[str, Any] = {}
        if os.path.exists(cfg_path):
            with open(cfg_path) as f:
                data_cfg = json.load(f).get("data", {})
        normalize = bool(data_cfg.get("normalize_imagenet", False))
        if normalize != self._normalize:
            raise ValueError(
                "checkpoint was trained with normalize_imagenet="
                f"{normalize} but the serving program was compiled "
                f"with {self._normalize}; restart the server")
        from skin_image_analysis_tpu.ops.preprocess import (
            normalize_affine,
        )

        affine = normalize_affine(data_cfg.get("input_affine"))
        if affine != normalize_affine(self._input_affine):
            raise ValueError(
                "checkpoint input_affine differs from the serving "
                f"program's ({affine} vs "
                f"{normalize_affine(self._input_affine)}); restart "
                "the server")
        params, batch_stats = ckpt_lib.split_variables(loaded)
        new_weights: dict[str, Any] = {"params": params}
        if batch_stats is not None:
            new_weights["batch_stats"] = batch_stats

        def _spec(tree):
            leaves, treedef = jax.tree_util.tree_flatten(tree)
            return treedef, [(tuple(l.shape), np.dtype(l.dtype))
                             for l in leaves]

        old_def, old_leaves = _spec(self._weights)
        new_def, new_leaves = _spec(new_weights)
        if old_def != new_def or old_leaves != new_leaves:
            raise ValueError(
                "checkpoint weights are not structure-compatible with "
                "the served ones (a swap would recompile every bucket); "
                "restart the server to change models")
        new_weights = self._commit_weights(new_weights, self.mesh)
        with self._lock:
            self._weights = new_weights
            self.reloads += 1
            n_reloads = self.reloads
        if warm:
            ready = self.compiled_buckets()
            b = ready[0] if ready else self.buckets[0]
            self.predict(np.zeros(
                (b, self.image_size, self.image_size, self.in_channels),
                np.uint8))
        return {"status": "reloaded", "folder": os.path.abspath(folder),
                "reloads": n_reloads}

    def compiled_buckets(self) -> list[int]:
        """Snapshot of the compiled set, taken under the session lock —
        iterating the live set while predict() mutates it would raise
        'set changed size during iteration' in a reader thread."""
        with self._lock:
            return sorted(self.compiled)


@dataclass
class BatcherStats:
    requests: int = 0
    batches: int = 0
    rows: int = 0
    max_coalesced: int = 0
    _lock: threading.Lock = field(default_factory=threading.Lock,
                                  repr=False)

    def record(self, coalesced: int) -> None:
        with self._lock:
            self.batches += 1
            self.rows += coalesced
            self.max_coalesced = max(self.max_coalesced, coalesced)

    def record_request(self) -> None:
        # all fields mutate under the SAME lock snapshot() reads with —
        # submit() used to bump this under the batcher's cv instead
        with self._lock:
            self.requests += 1

    def snapshot(self) -> dict[str, int]:
        with self._lock:
            return {"requests": self.requests, "batches": self.batches,
                    "rows": self.rows,
                    "max_coalesced": self.max_coalesced}


class DynamicBatcher:
    """Coalesce concurrent single-image requests into one device call.

    ``submit(pixels) -> Future``. A worker thread blocks for the first
    pending request, then drains whatever else arrives within
    ``window_ms`` (up to the session's ``max_batch``) and ships ONE
    padded batch. Under no concurrency this degrades to per-request
    calls with one window of added latency; under load the dispatch
    floor and the forward amortize across the whole batch.
    """

    def __init__(self, session: InferenceSession,
                 window_ms: float = 2.0):
        self.session = session
        self.window_s = float(window_ms) / 1e3
        self.stats = BatcherStats()
        self._queue: list[tuple[np.ndarray, Future]] = []
        self._cv = threading.Condition()
        self._stop = False
        self._thread: threading.Thread | None = None

    def start(self) -> "DynamicBatcher":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        if self._thread is not None:
            self._thread.join(timeout=10)

    def submit(self, pixels: np.ndarray) -> Future:
        pixels = np.asarray(pixels, np.uint8)
        s, c = self.session.image_size, self.session.in_channels
        if pixels.shape != (s, s, c):
            # one wrong-shaped row in a coalesced batch would fail the
            # whole np.stack, so reject it at the door with a clear error
            raise ValueError(
                f"submit() takes one uint8 [{s}, {s}, {c}] image, "
                f"got {pixels.shape}")
        fut: Future = Future()
        with self._cv:
            if self._stop:
                raise RuntimeError(
                    "batcher stopped — requests would never resolve")
            self.stats.record_request()
            self._queue.append((pixels, fut))
            self._cv.notify()
        return fut

    # one drain step, separated from the thread loop for direct testing
    def drain_once(self, wait: bool = True) -> int:
        with self._cv:
            if wait:
                while not self._queue and not self._stop:
                    self._cv.wait()
            if self._stop and not self._queue:
                return 0
            deadline = time.monotonic() + self.window_s
            while (len(self._queue) < self.session.max_batch
                   and not self._stop):
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    break
                self._cv.wait(timeout=remaining)
            items = self._queue[:self.session.max_batch]
            del self._queue[:len(items)]
        if not items:
            return 0
        try:
            pixels = np.stack([p for p, _ in items])
            out = self.session.predict(pixels)
        except BaseException as e:  # deliver, don't kill the worker
            for _, fut in items:
                fut.set_exception(e)
            return len(items)
        self.stats.record(len(items))
        for i, (_, fut) in enumerate(items):
            fut.set_result({k: v[i] for k, v in out.items()})
        return len(items)

    def _run(self) -> None:
        while True:
            with self._cv:
                if self._stop and not self._queue:
                    return
            self.drain_once()


def start_reload_watcher(session: InferenceSession,
                         interval_s: float = 5.0,
                         verbose: bool = True):
    """Auto-reload: poll the source experiment folder's model artifact
    mtime and hot-swap on change (``save_model`` writes are atomic —
    tmp + os.replace — so a new mtime is always a complete artifact).
    The push-free half of the trainer-writes/server-reloads loop: point
    the trainer's ``--out``/experiment folder at the served one and new
    checkpoints go live within ``interval_s`` seconds, zero recompiles.

    Returns ``(thread, stop_event)``; set the event to stop."""
    import os

    if session._weights is None:
        raise RuntimeError(
            "auto-reload needs an experiment-folder session (artifact "
            "weights are embedded program constants)")
    path = os.path.join(str(session.source), session.model_filename)
    stop = threading.Event()

    def _mtime():
        try:
            return os.stat(path).st_mtime_ns
        except OSError:
            return None

    last = _mtime()

    def _run():
        nonlocal last
        while not stop.wait(interval_s):
            m = _mtime()
            if m is None or m == last:
                continue
            try:
                info = session.reload_weights()
                if verbose:
                    print(f"auto-reload: {info}")
            except ValueError as e:
                # incompatible artifact: refuse ONCE per mtime (the old
                # weights keep serving), don't spam every tick
                if verbose:
                    print(f"auto-reload refused: {e}")
            except Exception as e:  # keep watching
                if verbose:
                    print(f"auto-reload failed: {type(e).__name__}: {e}")
            last = m

    thread = threading.Thread(target=_run, daemon=True)
    thread.start()
    return thread, stop


def process_rss_kb() -> int | None:
    """This process's resident set size in kB (Linux /proc)."""
    import os

    try:
        with open(f"/proc/{os.getpid()}/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1])
    except OSError:
        pass
    return None


class RecycleMonitor:
    """Bounded-memory serving: recycle the daemon before the relay's
    RSS leak OOMs it — with a ZERO-DOWNTIME process handoff.

    Through the axon remote relay every host→device transfer leaks
    ~its own bytes of host RSS (measured, docs/PERF.md §Serving
    memory; gc/clear_caches/Array.delete reclaim nothing), so a
    long-running ``/predict`` daemon grows without bound. The leak is
    the environment's; the MITIGATION POLICY is the framework's job.
    A drain-then-exec recycle was measured first and rejected: the
    successor's re-warm is 30-340 s through the relay (one bucket
    compile, window-dependent), and every request queued in the
    backlog waits it out — long enough to blow ordinary client
    timeouts. Instead, when RSS crosses ``max_rss_mb`` the monitor

    1. SPAWNS the successor process with the LISTENING SOCKET and a
       readiness pipe inherited (``--listen-fd`` / ``--ready-fd``,
       internal flags) — the old process KEEPS SERVING while the
       successor builds its session and re-warms its buckets,
    2. waits for the successor's ready byte (it writes the pipe right
       before its accept loop starts; both processes then accept from
       the shared socket, so there is no gap),
    3. retires: stops the old accept loop, marks the server draining
       (responses add ``Connection: close`` so pooled clients migrate
       to the successor), gives in-flight handler threads ``grace_s``,
       drains the batcher, and lets the process exit.

    Because the old process serves (and leaks) through the successor's
    whole warm-up, a cap that only fires when RSS CROSSES it bounds
    nothing when the warm is slow — measured live: at ~28 req/s of 224²
    pixels the old process leaked ~3.4 MB/s for the 15+ min a
    congested-window bucket compile took, a ~3 GB excursion per
    handoff. So the trigger is PREDICTIVE: the monitor estimates the
    live leak rate (EWMA of ΔRSS per tick) and starts the handoff at

        max_rss_mb − leak_rate × (safety × warm_s)

    where ``warm_s`` is this incarnation's own measured start→ready
    time (each successor re-measures under current relay conditions).
    The headroom is clamped to at most half the cap — if the projected
    leak exceeds that, the cap is undersized for the offered load and
    the monitor says so. Should RSS still reach the stated cap during
    the handoff (leak outran the forecast), the accept loop pauses —
    connections queue in the kernel backlog (bounded memory, queuing
    latency, no failures) until the successor takes over. Net effect:
    ``--max-rss-mb`` is an actual bound (± one ``interval_s`` tick of
    leak), not a trigger with an unbounded excursion. If the successor
    instead dies or misses ``handoff_timeout_s``, the old process
    resumes accepting (the backlog drains) and retries after
    ``cooldown_s`` — availability is never sacrificed to the recycle
    itself. Size ``handoff_timeout_s`` to your platform's worst-case
    warm (through the axon relay: tens of minutes). ``rss_fn`` /
    ``spawn_fn`` exist for tests."""

    def __init__(self, server, batcher: DynamicBatcher,
                 max_rss_mb: int, argv: list[str],
                 interval_s: float = 5.0, grace_s: float = 600.0,
                 handoff_timeout_s: float = 3600.0,
                 cooldown_s: float = 60.0, warm_s: float = 300.0,
                 safety: float = 1.5, leak_alpha: float = 0.3,
                 rss_fn=None, spawn_fn=None, verbose: bool = True):
        self.server = server
        self.batcher = batcher
        self.max_rss_kb = int(max_rss_mb) * 1024
        self.argv = list(argv)
        self.interval_s = float(interval_s)
        self.grace_s = float(grace_s)
        self.handoff_timeout_s = float(handoff_timeout_s)
        self.cooldown_s = float(cooldown_s)
        self.warm_s = float(warm_s)
        self.safety = float(safety)
        self.leak_alpha = float(leak_alpha)
        self.leak_kb_s = 0.0
        self.rss_fn = rss_fn or process_rss_kb
        self.spawn_fn = spawn_fn
        self.verbose = verbose
        self.triggered = False
        self.retiring = False
        self.hard_stopped = False
        self.want_resume = False
        self.handoffs_failed = 0
        self.trigger_rss_kb: int | None = None
        self._last_sample: tuple[float, int] | None = None
        self._warned_undersized = False
        self._stop = threading.Event()
        self._concluded = threading.Event()
        self._thread: threading.Thread | None = None

    def threshold_kb(self) -> int:
        """The predictive trigger line: cap − forecast leak over a
        (safety-padded) successor warm, clamped to [cap/2, cap]."""
        headroom = self.leak_kb_s * self.safety * self.warm_s
        return int(max(self.max_rss_kb / 2,
                       self.max_rss_kb - headroom))

    def _observe(self, rss: int) -> None:
        """Fold one RSS sample into the leak-rate EWMA."""
        now = time.monotonic()
        if self._last_sample is not None:
            t0, r0 = self._last_sample
            dt = now - t0
            if dt > 0:
                rate = max(0.0, (rss - r0) / dt)
                self.leak_kb_s += self.leak_alpha * (rate - self.leak_kb_s)
        self._last_sample = (now, rss)
        if (not self._warned_undersized
                and self.leak_kb_s * self.safety * self.warm_s
                > self.max_rss_kb / 2):
            self._warned_undersized = True
            if self.verbose:
                print(
                    "recycle: projected leak over one handoff "
                    f"({self.leak_kb_s:.0f} kB/s x {self.safety:.1f} x "
                    f"{self.warm_s:.0f}s warm) exceeds half the "
                    f"{self.max_rss_kb} kB cap — the cap is undersized "
                    "for this load; RSS may queue accepts at the cap "
                    "during handoffs (size per docs/OPERATIONS.md)",
                    flush=True)

    def start(self) -> "RecycleMonitor":
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()
        return self

    def stop(self) -> None:
        self._stop.set()

    def _run(self) -> None:
        while not self._stop.wait(self.interval_s):
            rss = self.rss_fn()
            if rss is None:
                continue
            self._observe(rss)
            threshold = self.threshold_kb()
            if rss <= threshold:
                continue
            self.triggered = True
            self.trigger_rss_kb = rss
            if self.verbose:
                print(f"recycle: rss {rss} kB > trigger {threshold} kB "
                      f"(cap {self.max_rss_kb} kB − forecast "
                      f"{self.leak_kb_s:.0f} kB/s x {self.safety:.1f} x "
                      f"{self.warm_s:.0f}s warm) — spawning successor "
                      "(this process keeps serving until it is warm)",
                      flush=True)
            self._concluded.clear()
            if self._handoff():
                # successor is accepting on the shared socket — retire.
                # draining first so responses written from here on tell
                # pooled clients to reconnect (they land on the successor)
                self.retiring = True
                self.server.draining = True
                if not self.hard_stopped:  # else already shut down
                    self.server.shutdown()
                self._concluded.set()
                return
            self.handoffs_failed += 1
            if self.hard_stopped:
                # accept loop was stopped at the cap; hand it back to
                # serve_http's main loop (the backlog drains) and stop
                # draining — this process is serving again for real
                self.hard_stopped = False
                self.server.draining = False
                self.want_resume = True
            self._concluded.set()
            if self.verbose:
                print("recycle: handoff failed — still serving; retry "
                      f"in {self.cooldown_s:.0f}s", flush=True)
            if self._stop.wait(self.cooldown_s):
                return

    def should_resume(self) -> bool:
        """Called by serve_http's main thread when serve_forever
        returns: True when the accept loop was hard-stopped for a
        handoff that then FAILED — the caller re-enters serve_forever
        and the queued backlog drains. Blocks until the in-progress
        handoff concludes."""
        if not self.triggered or self._stop.is_set():
            return False  # external shutdown, not ours
        self._concluded.wait()
        if self.want_resume:
            self.want_resume = False
            return True
        return False

    def successor_argv(self, listen_fd: int, ready_fd: int) -> list[str]:
        """The successor's command line: the original argv with any
        stale --listen-fd/--ready-fd pairs replaced by this process's
        inherited-socket and readiness-pipe fds."""
        argv = list(self.argv)
        for flag in ("--listen-fd", "--ready-fd"):
            while flag in argv:
                i = argv.index(flag)
                del argv[i:i + 2]
        return argv + ["--listen-fd", str(listen_fd),
                       "--ready-fd", str(ready_fd)]

    def _handoff(self) -> bool:
        """Spawn the successor and wait for its ready byte. True when
        it is accepting; False (child reaped) on death or timeout."""
        import select
        import subprocess
        import sys as _sys
        import time as _time

        fd = self.server.socket.fileno()
        rpipe, wpipe = os.pipe()
        env = dict(os.environ)
        env["SIA_SERVE_RECYCLES"] = str(
            int(env.get("SIA_SERVE_RECYCLES", "0")) + 1)
        env["SIA_SERVE_RECYCLED_AT"] = repr(_time.time())
        argv = self.successor_argv(fd, wpipe)
        spawn = self.spawn_fn or (
            lambda a, fds, e: subprocess.Popen(
                [_sys.executable] + a, pass_fds=fds, env=e))
        try:
            child = spawn(argv, (fd, wpipe), env)
        except OSError:
            os.close(rpipe)
            os.close(wpipe)
            return False
        finally:
            # the write end lives on only in the child; our copy must
            # close so rpipe sees EOF if the child dies before ready
            try:
                os.close(wpipe)
            except OSError:
                pass
        deadline = _time.time() + self.handoff_timeout_s
        ready = False
        try:
            while _time.time() < deadline:
                rl, _, _ = select.select([rpipe], [], [], 1.0)
                if rl:
                    ready = os.read(rpipe, 1) != b""  # b"" = EOF: died
                    break
                rc = child.poll()
                if rc is not None:  # exited without ever writing
                    break
                if not self.hard_stopped:
                    rss = self.rss_fn()
                    if rss is not None:
                        self._observe(rss)
                    if rss is not None and rss > self.max_rss_kb:
                        # the leak outran the predictive headroom and
                        # reached the stated cap: stop accepting AND
                        # mark draining — pausing accepts alone bounds
                        # nothing against keep-alive clients (measured:
                        # 8 persistent connections kept leaking 10 MB/s
                        # straight through a paused accept loop to
                        # 1.7x the cap). Draining responses carry
                        # Connection: close, so every live socket ends
                        # after its in-flight request and clients fall
                        # into the kernel backlog until the successor
                        # (or a resume on failure) picks them up — RSS
                        # stays at ~the cap
                        self.hard_stopped = True
                        self.server.draining = True
                        if self.verbose:
                            print(f"recycle: rss {rss} kB reached the "
                                  f"{self.max_rss_kb} kB cap during "
                                  "handoff — pausing accepts and "
                                  "draining keep-alive connections "
                                  "(clients queue in the backlog)",
                                  flush=True)
                        self.server.shutdown()
        finally:
            os.close(rpipe)
        if not ready:
            try:
                child.kill()
                child.wait(timeout=10)
            except Exception:
                pass
        return ready

    def finish_retire(self) -> None:
        """Drain this (old) process after the successor took over —
        called by serve_http on the main thread once serve_forever
        returns. The process exits normally afterwards; in-flight
        requests complete, queued batcher work completes, idle
        keep-alive connections past grace_s reset (their clients
        reconnect to the successor). ``grace_s`` is generous by
        default (600 s): wait_idle returns the moment in-flight hits
        zero, the successor is already serving so a lingering retiree
        costs nothing, and a stingy grace loses real requests — an
        in-flight batch can sit minutes behind the successor's own
        relay compile (measured: a 15 s grace reset 1 connection of
        8,000 during exactly that window)."""
        if not self.server.wait_idle(self.grace_s) and self.verbose:
            print(f"recycle: {self.server.inflight()} connections "
                  f"still open after {self.grace_s}s grace — they "
                  "reset at old-process exit", flush=True)
        self.batcher.stop()  # drains the queue; nothing dropped
        if self.verbose:
            print("recycle: retired — successor is serving", flush=True)


def _result_json(session: InferenceSession, res: dict[str, Any]) -> dict:
    pred = int(res["pred"])
    return {
        "pred": pred,
        "class": (session.class_names[pred]
                  if pred < len(session.class_names) else str(pred)),
        "p_malignant": float(res["p_malignant"]),
        "log_probs": [float(x) for x in np.asarray(res["log_probs"])],
    }


def make_http_server(batcher: DynamicBatcher, host: str = "127.0.0.1",
                     port: int = 8000, read_timeout: float = 60.0,
                     reload_any: bool = False,
                     listen_fd: int | None = None):
    """Build (not run) the HTTP server. Endpoints:

    - ``POST /predict`` — body: one encoded image (JPEG/PNG bytes) or a
      raw uint8 ``[S, S, C]`` buffer with
      ``Content-Type: application/octet-stream``; response: prediction
      JSON {pred, class, p_malignant, log_probs}.
    - ``POST /predict_batch`` — one raw uint8 ``[N, S, S, C]`` body for
      pre-batched clients; response: arrays {pred, class, p_malignant}.
    - ``POST /reload`` — hot-swap the served weights from the source
      experiment folder (the trainer-writes/server-reloads loop; zero
      recompiles, see :meth:`InferenceSession.reload_weights`). An
      optional JSON body ``{"folder": ...}`` names a different folder —
      rejected with 403 unless the server was built with
      ``reload_any=True`` (an HTTP-reachable load-anything endpoint is
      an obvious footgun; the default trusts only the folder the
      operator launched with).
    - ``GET /healthz`` — liveness + model/source info + reload count.
    - ``GET /stats`` — request/batch coalescing counters + ``rss_kb``.
    """
    import os

    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from skin_image_analysis_tpu.data.loader import decode_image_bytes

    session = batcher.session
    # serialize concurrent /reload posts: each is a disk load + device
    # commit; racing them wastes both and makes the counter ambiguous
    reload_lock = threading.Lock()

    class Server(ThreadingHTTPServer):
        # the stdlib default listen backlog (5) drops/resets connections
        # the moment more than a handful of clients connect at once —
        # measured: 64 simultaneous connects lost ~¼ of them. Size the
        # backlog to the coalescing width we actually want to absorb.
        # (The backlog also buffers connects across a --max-rss-mb
        # recycle: the listening socket survives the re-exec.)
        request_queue_size = 4 * max(64, session.max_batch)
        daemon_threads = True
        # set by RecycleMonitor at retirement: responses then carry
        # Connection: close so pooled clients migrate to the successor
        draining = False

        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self._inflight = 0
            self._inflight_cv = threading.Condition()

        # ThreadingMixIn hook: count live connection threads so a
        # recycle can wait for in-flight requests before re-exec
        def process_request_thread(self, request, client_address):
            with self._inflight_cv:
                self._inflight += 1
            try:
                super().process_request_thread(request, client_address)
            finally:
                with self._inflight_cv:
                    self._inflight -= 1
                    self._inflight_cv.notify_all()

        def inflight(self) -> int:
            with self._inflight_cv:
                return self._inflight

        def wait_idle(self, timeout: float) -> bool:
            with self._inflight_cv:
                return self._inflight_cv.wait_for(
                    lambda: self._inflight == 0, timeout=timeout)

    MAX_BODY = 1 << 28  # 256 MB — far above any real bucket's bytes

    class Handler(BaseHTTPRequestHandler):
        # HTTP/1.1 keep-alive: every response carries Content-Length
        # (_send), so persistent connections are safe — clients reuse
        # one TCP connection instead of paying a reconnect per request
        # (the connect storm is what forced the oversized backlog).
        protocol_version = "HTTP/1.1"
        # socket timeout: a client that stalls mid-upload would otherwise
        # pin this handler thread in rfile.read() indefinitely (measured
        # while driving the daemon — the truncated-body check only fires
        # on a half-close, not a stall)
        timeout = read_timeout

        def log_message(self, fmt, *args):  # quiet by default
            pass

        def _send(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            if getattr(self.server, "draining", False):
                # retiring across a --max-rss-mb recycle: tell pooled
                # clients to reconnect (they land on the successor)
                self.send_header("Connection", "close")
                self.close_connection = True
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._send(200, {
                    "status": "ok",
                    "source": session.source,
                    "image_size": session.image_size,
                    "class_names": session.class_names,
                    "buckets": session.buckets,
                    "compiled_buckets": session.compiled_buckets(),
                    "reloads": session.reloads,
                    # --max-rss-mb handoffs bump this (env is passed to
                    # each successor); pid identifies the incarnation
                    "recycles": int(os.environ.get(
                        "SIA_SERVE_RECYCLES", "0")),
                    "pid": os.getpid(),
                })
            elif self.path == "/stats":
                snap = batcher.stats.snapshot()
                # operators watch this: through the axon remote relay
                # every host->device transfer leaks ~its own bytes in
                # host RSS (measured, docs/PERF.md §Serving memory;
                # gc/clear_caches/Array.delete don't reclaim), so a
                # long-running daemon's RSS grows with total request
                # bytes in that environment
                try:
                    import os as _os

                    with open(f"/proc/{_os.getpid()}/status") as f:
                        for line in f:
                            if line.startswith("VmRSS"):
                                snap["rss_kb"] = int(line.split()[1])
                                break
                except OSError:
                    pass
                monitor = getattr(self.server, "recycle_monitor", None)
                if monitor is not None:
                    # the live predictive-recycle state: where the next
                    # handoff will start and why (--max-rss-mb contract)
                    snap["recycle"] = {
                        "cap_kb": monitor.max_rss_kb,
                        "trigger_kb": monitor.threshold_kb(),
                        "leak_kb_s": round(monitor.leak_kb_s, 1),
                        "warm_s": round(monitor.warm_s, 1),
                        "safety": monitor.safety,
                        "handoffs_failed": monitor.handoffs_failed,
                    }
                self._send(200, snap)
            else:
                self._send(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            length = int(self.headers.get("Content-Length") or 0)
            if length > MAX_BODY:
                self.close_connection = True  # body left unread
                self._send(413, {"error": f"body too large ({length} bytes)"})
                return
            # read the body up-front for EVERY route: under keep-alive an
            # unread body would be parsed as the next request line
            try:
                data = self.rfile.read(length) if length > 0 else b""
            except TimeoutError:
                self.close_connection = True
                self._send(408, {"error":
                                 f"body read timed out after {self.timeout}s"})
                return
            if len(data) < length:  # client aborted mid-upload
                self.close_connection = True
                self._send(400, {"error":
                                 f"truncated body ({len(data)}/{length} "
                                 "bytes received)"})
                return
            if self.path == "/reload":
                folder = None
                if data:
                    try:
                        payload = json.loads(data)
                        folder = payload.get("folder")
                    except (json.JSONDecodeError, AttributeError) as e:
                        self._send(400, {"error": f"bad reload body: {e}"})
                        return
                if (folder
                        and os.path.abspath(folder)
                        != os.path.abspath(str(session.source))
                        and not reload_any):
                    self._send(403, {
                        "error": "reloading a different folder is "
                                 "disabled (launch with --reload-any)"})
                    return
                try:
                    with reload_lock:
                        info = session.reload_weights(folder or None)
                except FileNotFoundError as e:
                    self._send(404, {"error": str(e)})
                    return
                except (ValueError, RuntimeError) as e:
                    # incompatible/corrupt checkpoint, or an artifact
                    # session — the old weights keep serving either way
                    self._send(409, {"error": str(e)})
                    return
                except Exception as e:
                    self._send(500, {"error": str(e)})
                    return
                self._send(200, info)
                return
            if self.path == "/predict_batch":
                # pre-batched clients: one raw uint8 [N, S, S, C] body,
                # straight to the session (no coalescing window)
                s, c = session.image_size, session.in_channels
                row = s * s * c
                if length <= 0 or length % row:
                    self._send(400, {"error":
                                     f"body must be N x {s}x{s}x{c} uint8 "
                                     f"(multiple of {row} bytes)"})
                    return
                try:
                    pixels = np.frombuffer(data, np.uint8).reshape(
                        -1, s, s, c)
                except ValueError as e:
                    self._send(400, {"error": f"bad batch body: {e}"})
                    return
                try:
                    out = session.predict(pixels)
                except Exception as e:
                    self._send(500, {"error": str(e)})
                    return
                self._send(200, {
                    "pred": [int(v) for v in out["pred"]],
                    "class": [session.class_names[int(v)]
                              if int(v) < len(session.class_names)
                              else str(int(v)) for v in out["pred"]],
                    "p_malignant": [float(v) for v in out["p_malignant"]],
                })
                return
            if self.path != "/predict":
                self._send(404, {"error": f"no route {self.path}"})
                return
            if length <= 0:
                self._send(400, {"error": "empty body"})
                return
            s, c = session.image_size, session.in_channels
            try:
                ctype = (self.headers.get("Content-Type") or "").lower()
                if ctype == "application/octet-stream":
                    if length != s * s * c:
                        raise ValueError(
                            f"raw body must be {s}x{s}x{c} uint8 "
                            f"({s * s * c} bytes), got {length}")
                    img = np.frombuffer(data, np.uint8).reshape(s, s, c)
                else:
                    img = decode_image_bytes(data, s)
            except Exception as e:
                self._send(400, {"error": f"bad image: {e}"})
                return
            try:
                fut = batcher.submit(img)
            except ValueError as e:
                # shape gate (e.g. a 3-channel decode against a legacy
                # 2-channel artifact) — a client error, not a server one
                self._send(400, {"error": str(e)})
                return
            except RuntimeError as e:  # batcher stopped
                self._send(503, {"error": str(e)})
                return
            try:
                res = fut.result(timeout=600)
            except Exception as e:
                self._send(500, {"error": str(e)})
                return
            self._send(200, _result_json(session, res))

    if listen_fd is not None:
        # adopt an inherited, already-listening socket (a --max-rss-mb
        # recycle re-exec): bind_and_activate=False, swap the socket in
        import socket as _socket

        server = Server((host, port), Handler, bind_and_activate=False)
        server.socket.close()
        server.socket = _socket.socket(fileno=listen_fd)
        addr = server.socket.getsockname()
        server.server_address = addr
        server.server_name, server.server_port = addr[0], addr[1]
        return server
    return Server((host, port), Handler)


def serve_http(batcher: DynamicBatcher, host: str = "127.0.0.1",
               port: int = 8000, verbose: bool = True,
               reload_any: bool = False, listen_fd: int | None = None,
               max_rss_mb: int = 0, recycle_argv: list[str] | None = None,
               ready_fd: int | None = None,
               warm_started_at: float | None = None) -> None:
    """Run the HTTP server until interrupted.

    ``max_rss_mb`` > 0 arms the :class:`RecycleMonitor`: the daemon
    spawns a warm successor over ``recycle_argv`` (default
    ``sys.argv``) with the listening socket inherited BEFORE the cap
    is reached (predictively, from the live leak rate and this
    process's own measured warm time), keeps serving until the
    successor accepts, then drains and exits — the cap is an actual
    RSS bound with zero downtime under the relay's per-transfer RSS
    leak (docs/PERF.md §Serving memory). ``listen_fd`` adopts such an
    inherited socket on the way back up; ``ready_fd`` is the
    predecessor's readiness pipe (written the moment this process's
    accept loop is about to start). ``warm_started_at`` is when this
    process began building its session (CLI entry / predecessor spawn
    time); start→now is the measured warm used to size the next
    handoff's predictive headroom."""
    import sys as _sys

    server = make_http_server(batcher, host, port, reload_any=reload_any,
                              listen_fd=listen_fd)
    monitor = None
    if max_rss_mb:
        # this incarnation's own warm time, measured under CURRENT
        # relay conditions, forecasts the successor's
        measured_warm = (time.time() - warm_started_at
                         if warm_started_at else 300.0)
        monitor = RecycleMonitor(
            server, batcher, max_rss_mb,
            recycle_argv if recycle_argv is not None else _sys.argv,
            warm_s=max(60.0, measured_warm), verbose=verbose,
        ).start()
        server.recycle_monitor = monitor
    if verbose:
        print(f"serving {batcher.session.source} on http://{host}:{port} "
              f"(buckets {batcher.session.buckets}"
              + (f", rss cap {max_rss_mb} MB" if max_rss_mb else "")
              + ")", flush=True)
    if ready_fd is not None:
        # tell the retiring predecessor we are about to accept; it
        # keeps accepting too until this byte lands, so no gap
        try:
            os.write(ready_fd, b"R")
            os.close(ready_fd)
        except OSError:
            pass
    try:
        while True:
            server.serve_forever()
            if monitor is not None and monitor.should_resume():
                # hard-capped accept pause for a handoff that failed —
                # take the accept loop back; the queued backlog drains
                if verbose:
                    print("recycle: handoff failed under hard cap — "
                          "accepting again", flush=True)
                continue
            break
    except KeyboardInterrupt:
        pass
    finally:
        if monitor is not None:
            monitor.stop()
            if monitor.retiring:
                # successor owns the socket now; drain and fall through
                # to a normal exit
                monitor.finish_retire()
        server.server_close()
        batcher.stop()
