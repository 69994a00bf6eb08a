#!/usr/bin/env python
"""Process/fd diagnostics CLI — reference surface
(src/monitor_processes.py)::

    python cli/monitor_processes.py [--verbose] [--watch SECONDS]

Prints fd/memory stats for every live python process; ``--watch`` repeats
on an interval (the reference's live fd-leak probe usage,
tone_bias_train.py:62-72).
"""

from __future__ import annotations

import os
import sys
import time

from skin_image_analysis_tpu.utils.monitor import print_python_processes  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    _, opts = parse(argv, {"watch": 0.0}, bool_flags={"verbose"})
    while True:
        print(f"--- {time.strftime('%H:%M:%S')} ---")
        print_python_processes(verbose=opts["verbose"])
        if not opts["watch"]:
            break
        time.sleep(opts["watch"])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
