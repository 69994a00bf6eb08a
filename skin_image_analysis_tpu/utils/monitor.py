"""Process / file-descriptor diagnostics.

Parity with the reference's psutil fd-leak monitor
(src/monitor_processes.py), which was built to debug the DataLoader
fork-worker fd leak (+10 fds/epoch, crash at ulimit 256 —
tone_bias_train.py:47-96). The TPU runtime uses threads, not forked
workers, so the leak class is gone; the monitor remains for verification
and general diagnostics, including host RSS tracking for the decoded-image
arena.
"""

from __future__ import annotations

from typing import Any


def find_python_processes() -> list[Any]:
    """All live python processes (reference: monitor_processes.py:24-36)."""
    import psutil

    procs = []
    for p in psutil.process_iter(["name", "pid", "ppid"]):
        try:
            if "python" in (p.info["name"] or ""):
                procs.append(p)
        except (psutil.NoSuchProcess, psutil.AccessDenied):
            continue
    return procs


def process_summary(proc: Any) -> dict:
    import psutil

    try:
        with proc.oneshot():
            return {
                "pid": proc.pid,
                "ppid": proc.ppid(),
                "name": proc.name(),
                "num_fds": proc.num_fds(),
                "open_files": len(proc.open_files()),
                "threads": proc.num_threads(),
                "rss_mb": proc.memory_info().rss / 1e6,
                "cpu_percent": proc.cpu_percent(interval=None),
            }
    except (psutil.NoSuchProcess, psutil.AccessDenied):
        return {"pid": proc.pid, "error": "gone"}


def print_python_processes(verbose: bool = False) -> list[dict]:
    """Print per-process fd/memory stats; returns the records
    (reference API: monitor_processes.py:131-135)."""
    records = [process_summary(p) for p in find_python_processes()]
    for r in records:
        if "error" in r:
            continue
        line = (f"pid={r['pid']} ppid={r['ppid']} fds={r['num_fds']} "
                f"open_files={r['open_files']} rss={r['rss_mb']:.0f}MB")
        if verbose:
            line += f" threads={r['threads']} cpu={r['cpu_percent']:.0f}%"
        print(line)
    return records


def fd_count() -> int:
    """This process's fd count — assert-friendly for leak tests."""
    import psutil

    return psutil.Process().num_fds()
