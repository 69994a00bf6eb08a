#!/usr/bin/env python
"""Load-generate the serving daemon: N concurrent keep-alive clients,
M requests, one JSON result line.

Usage::

    python cli/tone_bias_serve.py <exp|artifact> --port 8380 &   # warm first
    python tools/bench_serving.py 8380 64 512 raw
    python tools/bench_serving.py 8380 16 128 jpeg /path/to/images
    python tools/bench_serving.py 8380 4 64 bulk:64

``raw`` posts pre-sized uint8 pixel bodies (sized from ``/healthz``) —
measures the serving path alone; ``jpeg`` posts encoded files from
``image_root`` — includes host-side decode; ``bulk:N`` posts raw
uint8 ``[N, S, S, 3]`` bodies to ``/predict_batch`` (the binary bulk
protocol: no per-image HTTP round-trip, no base64, no JSON-per-image —
``requests`` then counts BATCHES and the result adds ``img_per_s``).
Results (hardware, this repo's measurements) live in docs/PERF.md
§Online serving.
"""

from __future__ import annotations

import glob
import http.client
import json
import sys
import threading
import time

import numpy as np


def run(port: int, clients: int, total: int, mode: str,
        image_root: str | None = None) -> dict:
    route = "/predict"
    batch_n = 1
    if mode == "raw" or mode.startswith("bulk"):
        hc = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        hc.request("GET", "/healthz")
        size = json.loads(hc.getresponse().read())["image_size"]
        hc.close()
        rng = np.random.default_rng(0)
        if mode.startswith("bulk"):
            batch_n = int(mode.split(":", 1)[1]) if ":" in mode else 64
            route = "/predict_batch"
            bodies = [rng.integers(0, 255, (batch_n, size, size, 3),
                                   np.uint8).tobytes()
                      for _ in range(2)]
        else:
            bodies = [rng.integers(0, 255, (size, size, 3),
                                   np.uint8).tobytes()
                      for _ in range(8)]
        ctype = "application/octet-stream"
    else:
        paths = sorted(glob.glob(f"{image_root}/*.jpg"))[:16]
        if not paths:
            raise SystemExit(f"no .jpg files under {image_root}")
        bodies = [open(p, "rb").read() for p in paths]
        ctype = "image/jpeg"

    lat: list[float] = []
    lock = threading.Lock()
    counter = {"i": 0}
    errors: list[str] = []

    def worker():
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=300)
        while True:
            with lock:
                if counter["i"] >= total:
                    break
                i = counter["i"]
                counter["i"] += 1
            body = bodies[i % len(bodies)]
            t0 = time.perf_counter()
            conn.request("POST", route, body=body,
                         headers={"Content-Type": ctype})
            resp = conn.getresponse()
            data = resp.read()
            dt = time.perf_counter() - t0
            with lock:
                if resp.status != 200:
                    errors.append(data[:200].decode("utf-8", "replace"))
                else:
                    lat.append(dt)
        conn.close()

    # one warm request so a cold bucket compile isn't in the measurement
    warm = http.client.HTTPConnection("127.0.0.1", port, timeout=600)
    warm.request("POST", route, body=bodies[0],
                 headers={"Content-Type": ctype})
    warm.getresponse().read()
    warm.close()

    start = time.perf_counter()
    threads = [threading.Thread(target=worker) for _ in range(clients)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - start

    conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
    conn.request("GET", "/stats")
    stats = json.loads(conn.getresponse().read())
    conn.close()
    lat.sort()
    return {
        "mode": mode, "clients": clients, "requests": total,
        "errors": len(errors), "wall_s": round(wall, 2),
        "req_per_s": round(len(lat) / wall, 1),
        "batch_n": batch_n,
        "img_per_s": round(len(lat) * batch_n / wall, 1),
        "p50_ms": round(lat[len(lat) // 2] * 1e3, 1) if lat else None,
        "p95_ms": round(lat[int(len(lat) * 0.95)] * 1e3, 1) if lat else None,
        "stats": stats,
    }


def main() -> int:
    if len(sys.argv) < 5:
        print("Usage: <port> <clients> <requests> <raw|jpeg|bulk[:N]> [image_root]")
        return 1
    out = run(int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3]),
              sys.argv[4], sys.argv[5] if len(sys.argv) > 5 else None)
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
