"""Multi-process data parallelism (parallel/distributed.py): a real
2-process Gloo CPU cluster trains the production step on sharded data
and lands on parameters IDENTICAL to the single-process run — the
cross-HOST form of the DP ≡ single-device numerics the mesh tests pin
in-process. (SURVEY §2.11 distributed backend row; the reference's only
distribution was MPI-launched independent processes, README.md:54.)"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
WORKER = os.path.join(REPO, "tests", "_mp_worker.py")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_cluster(nproc: int, port: int, timeout: int = 600) -> list[dict]:
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # the workers pin their own platform/devices; scrub the test
    # process's 8-device setting so each worker gets exactly 2
    env.pop("XLA_FLAGS", None)
    procs = [
        subprocess.Popen(
            [sys.executable, WORKER, str(i), str(nproc), str(port)],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, env=env,
            text=True,
        )
        for i in range(nproc)
    ]
    outs = []
    for p in procs:
        out, err = p.communicate(timeout=timeout)
        assert p.returncode == 0, f"worker failed:\n{err[-3000:]}"
        outs.append(json.loads(out.strip().splitlines()[-1]))
    return outs


def test_two_process_dp_matches_single_process():
    # single-process reference (1 process, 2 devices, full batch)
    ref = _run_cluster(1, _free_port())[0]
    assert ref["global_devices"] == 2

    # 2-process cluster: 4 global devices, each process loads half the
    # global batch via process_shard + global_batch
    outs = _run_cluster(2, _free_port())
    assert all(o["global_devices"] == 4 for o in outs)

    # replicated params agree across processes...
    np.testing.assert_allclose(
        outs[0]["checksum"], outs[1]["checksum"], rtol=1e-12
    )
    # ...and match the single-process run (same global data, same seed;
    # the grad all-reduce spans the process boundary)
    np.testing.assert_allclose(outs[0]["checksum"], ref["checksum"],
                               rtol=1e-5)
    np.testing.assert_allclose(outs[0]["last_loss"], ref["last_loss"],
                               rtol=1e-5)


def test_process_shard_partitions_exactly():
    """process_shard covers [0, n) exactly once across processes —
    checked via its arithmetic (no cluster needed)."""
    import jax

    from skin_image_analysis_tpu.parallel import distributed as dist

    class _FakeJax:
        pass

    # exercise the arithmetic across uneven splits by faking the
    # process geometry
    real_count, real_index = jax.process_count, jax.process_index
    try:
        for p in (1, 2, 3, 5):
            for n in (0, 1, 7, 8, 23):
                seen = []
                jax.process_count = lambda p=p: p
                for i in range(p):
                    jax.process_index = lambda i=i: i
                    lo, hi = dist.process_shard(n)
                    seen.extend(range(lo, hi))
                assert seen == list(range(n)), (p, n, seen)
    finally:
        jax.process_count, jax.process_index = real_count, real_index
