#!/usr/bin/env python
"""Online model serving — HTTP endpoint with dynamic batching::

    python cli/tone_bias_serve.py <experiment folder | model.stablehlo>
        [--host 127.0.0.1] [--port 8000] [--max-batch 64]
        [--window-ms 2] [--warm N,N,...] [--no-warm] [--reload-any]
        [--watch SECONDS] [--best] [--max-rss-mb N]
        [--quantize int8 --calib-root <image root> [--calib-rows N]]

Serves the trained model (an experiment folder's checkpoint — flagship
or transfer-trainer out_dir — or an AOT StableHLO artifact from
cli/tone_bias_export.py) behind ``POST /predict`` (one encoded image
per request; concurrent requests coalesce into single device
dispatches) and ``POST /predict_batch`` (one raw uint8 [N,S,S,3] body
for pre-batched clients). ``GET /healthz`` and ``GET /stats`` report
the model, coalescing counters, and process RSS. ``--mesh N`` shards
every batch over N chips (weights replicated). ``POST /reload``
hot-swaps the served weights from the source experiment folder with
ZERO recompiles (experiment-folder sessions pass the weights as a jit
argument, so every compiled bucket still hits the cache) — the
trainer-writes/server-reloads deployment loop; ``--reload-any``
additionally permits a JSON body naming a different folder, and
``--watch N`` polls the folder every N seconds and reloads new
checkpoints automatically (no POST needed). ``--best`` serves (and
reloads/watches) the folder's ``--keep-best`` checkpoint
``session_model_best.msgpack`` instead of the final weights — a
watching daemon then only picks up best-metric improvements.

``--quantize int8`` serves the post-training-quantized program instead
(serve/quantize.py — measured 1.41x the bf16 rate): calibration rows
come from the folder's frozen train split decoded under
``--calib-root``; quantized sessions cannot hot-reload (constant
weights), so it is exclusive with ``--watch``/``--mesh``.

``--max-rss-mb N`` bounds the daemon's memory: through the axon remote
relay every host→device transfer leaks ~its own bytes of host RSS
(docs/PERF.md §Serving memory), so a long-running daemon grows without
bound. The daemon spawns a successor with the LISTENING SOCKET
inherited (``--listen-fd``/``--ready-fd``, internal) BEFORE the cap
is reached — the handoff starts predictively at
``cap − leak_rate × 1.5 × warm_s`` (leak rate estimated live; warm_s
is this incarnation's own measured start→serving time) — and KEEPS
SERVING until the successor has re-warmed and starts accepting, a
zero-downtime handoff; only then does it drain in-flight requests and
exit. The successor prints the measured handoff window (which is
overlap, not unavailability). ``GET /healthz`` reports ``recycles``;
``GET /stats`` shows the live trigger line (``recycle.trigger_kb``),
leak estimate, and warm budget. Should the leak outrun the forecast
and RSS reach the stated cap mid-handoff, the accept loop pauses
(connections queue in the kernel backlog; bounded memory, no
failures) until the successor takes over, and accepts resume
automatically if the handoff fails — so the cap holds as an actual
bound either way.

The reference's deployment surface is "unpickle the module"
(tone_bias_model.py:305-338); this is its production-serving
replacement. Batch shapes are bucketed to powers of two so the XLA
compile count stays bounded; ``--warm`` pre-compiles the chosen buckets
before the port opens (first-request compiles through a remote-compile
relay cost 30-90 s per bucket otherwise).
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()


def main(argv: list[str] | None = None) -> int:
    import time as _time

    from skin_image_analysis_tpu.cli._common import parse

    warm_t0 = _time.time()  # session build + bucket compiles start here
    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(
        argv,
        {"host": "127.0.0.1", "port": 8000, "max-batch": 64,
         "window-ms": 2.0, "warm": "", "mesh": 0, "watch": 0.0,
         "quantize": "", "calib-root": "", "calib-rows": 256,
         "calib-mode": "max", "max-rss-mb": 0,
         "listen-fd": -1, "ready-fd": -1},
        bool_flags={"no-warm", "reload-any", "best"},
    )
    if len(positional) != 1:
        print("Usage: <experiment folder | exported .stablehlo artifact> "
              "[--host H] [--port N] [--max-batch N] [--window-ms F] "
              "[--warm N,N,...] [--no-warm] [--mesh N] [--reload-any] "
              "[--watch SECONDS] [--best] "
              "[--quantize int8 --calib-root <image root> "
              "[--calib-rows N]]")
        return 1
    source = positional[0]

    # --best serves the --keep-best checkpoint; reload/--watch then
    # track that file, so the daemon follows best-metric improvements
    # instead of every checkpoint write
    model_filename = None
    if opts["best"] and os.path.isdir(source):
        from skin_image_analysis_tpu.cli._common import model_file

        model_filename = os.path.basename(model_file(source, best=True))

    from skin_image_analysis_tpu.serve.server import (
        DynamicBatcher,
        InferenceSession,
        serve_http,
    )

    mesh = None
    if int(opts["mesh"]) > 1:
        # DP serving: replicate weights, shard each batch over N chips.
        # N may be a SUBSET of the host's devices (leave the rest free
        # for training) — pass exactly N devices to the mesh builder.
        import jax

        from skin_image_analysis_tpu.config import MeshConfig
        from skin_image_analysis_tpu.parallel.mesh import create_mesh

        n = int(opts["mesh"])
        devices = jax.devices()
        if n > len(devices):
            raise SystemExit(
                f"--mesh {n} but only {len(devices)} devices available")
        mesh = create_mesh(
            MeshConfig(data_parallel=n, model_parallel=1),
            devices=devices[:n])

    if opts["quantize"]:
        # int8 PTQ serving (serve/quantize.py: measured 1.41x the bf16
        # rate, docs/PERF.md §int8). Quantized weights are program
        # constants, so --watch/--reload are unavailable — restart to
        # pick up a retrained checkpoint.
        if opts["quantize"] != "int8":
            raise SystemExit(
                f"unknown --quantize {opts['quantize']!r} (the daemon "
                "serves full int8 only; 'int8-weights' is an export-time "
                "artifact-size scheme — in-process weights are already "
                "device-resident, so it would change nothing here)")
        if not os.path.isdir(source):
            raise SystemExit(
                "--quantize serves experiment folders; to serve a "
                "quantized ARTIFACT, export it with tone_bias_export.py "
                "--quantize int8 and serve the .stablehlo directly")
        if mesh is not None or float(opts["watch"]) > 0:
            raise SystemExit(
                "--quantize is exclusive with --mesh/--watch (constant-"
                "weight program; no hot reload)")
        if not opts["calib-root"]:
            raise SystemExit(
                "--quantize needs --calib-root (the image root; "
                "calibration rows come from the folder's "
                "session_train.csv)")
        from skin_image_analysis_tpu.serve.quantize import (
            calibration_rows,
        )

        calib, _, _ = calibration_rows(
            source, opts["calib-root"], int(opts["calib-rows"]))
        session = InferenceSession.from_experiment_quantized(
            source, calib, calib_mode=opts["calib-mode"],
            max_batch=int(opts["max-batch"]),
            model_filename=model_filename)
    elif os.path.isdir(source):
        session = InferenceSession.from_experiment(
            source, max_batch=int(opts["max-batch"]), mesh=mesh,
            model_filename=model_filename)
    else:
        if opts["best"]:
            raise SystemExit(
                "--best serves experiment folders (exported artifacts "
                "already embed the weights you exported)")
        if mesh is not None:
            raise SystemExit(
                "--mesh serves experiment folders; exported artifacts "
                "carry their own lowering")
        session = InferenceSession.from_artifact(
            source, max_batch=int(opts["max-batch"]))

    if not opts["no-warm"]:
        # default: the FULL bucket ladder — any unwarmed bucket is a
        # 30-90 s first-request stall through a remote-compile relay
        # (measured: p95 55 s when a mid-ladder bucket compiled under
        # load). --warm N,N,... narrows it when startup time matters
        # more than tail latency.
        buckets = ([int(b) for b in str(opts["warm"]).split(",") if b]
                   or list(session.buckets))
        print(f"warming buckets {sorted(set(buckets))} ...")
        session.warm(sorted(set(buckets)))
        print("warm done")

    if float(opts["watch"]) > 0:
        # auto-reload: new checkpoints in the source folder go live
        # within --watch seconds (zero recompiles; atomic save_model
        # writes mean a new mtime is always a complete artifact)
        from skin_image_analysis_tpu.serve.server import (
            start_reload_watcher,
        )

        start_reload_watcher(session, interval_s=float(opts["watch"]))
        print(f"watching {source} for new checkpoints "
              f"(every {float(opts['watch'])}s)")

    batcher = DynamicBatcher(session,
                             window_ms=float(opts["window-ms"])).start()
    listen_fd = int(opts["listen-fd"])
    ready_fd = int(opts["ready-fd"])
    recycled_at = os.environ.pop("SIA_SERVE_RECYCLED_AT", None)
    if recycled_at is not None:
        # the predecessor spawned us at this stamp and KEPT SERVING
        # through our whole warm-up — this window is overlap, not
        # unavailability (it retires once we write the ready byte).
        # Count OUR warm from that stamp too (includes interpreter
        # start — what the NEXT handoff must actually budget for).
        import time

        warm_t0 = float(recycled_at)
        window = time.time() - float(recycled_at)
        print(f"recycle handoff: {window:.1f}s spawn-to-serving, "
              "predecessor served throughout "
              f"(recycles={os.environ.get('SIA_SERVE_RECYCLES', '0')})",
              flush=True)
    serve_http(batcher, host=opts["host"], port=int(opts["port"]),
               reload_any=bool(opts["reload-any"]),
               listen_fd=listen_fd if listen_fd >= 0 else None,
               max_rss_mb=int(opts["max-rss-mb"]),
               ready_fd=ready_fd if ready_fd >= 0 else None,
               warm_started_at=warm_t0)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
