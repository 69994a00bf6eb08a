#!/usr/bin/env python
"""Results-analysis CLI — reference surface (tone_bias_analysis.py:513-632)::

    python cli/tone_bias_analysis.py <balanced|imbalanced> <epoch_to_detail>
        [--experiments-dir DIR]

Aggregates all experiment folders with the given prefix (averaging every
measure across runs, with 90% CIs), prints the detailed record at the
requested epoch, and saves ``figure_<prefix>.png`` (DI/loss twin-axis with
the 0.80/1.2 four-fifths band) plus an accuracy figure.
"""

from __future__ import annotations

import os
import sys

from skin_image_analysis_tpu.analysis import read_experiments  # noqa: E402
from skin_image_analysis_tpu.analysis.plots import (  # noqa: E402
    plot_accuracy_figure,
    plot_di_figure,
)


def main(argv: list[str] | None = None) -> int:
    from skin_image_analysis_tpu.cli._common import parse

    argv = list(sys.argv[1:] if argv is None else argv)
    positional, opts = parse(argv, {"experiments-dir": "results"})
    if len(positional) != 2:
        print("Usage: <balanced|imbalanced> <epoch_to_detail> "
              "[--experiments-dir DIR]")
        return 1
    prefix, epoch_to_detail = positional[0], int(positional[1])
    exp_dir = opts["experiments-dir"]

    agg = read_experiments(exp_dir, prefix)
    if not agg["epochs"]:
        print(f"No experiments matching {prefix}* under {exp_dir}")
        return 1
    print(f"Aggregated {agg['n_runs']} runs: {agg['experiments']}")

    if epoch_to_detail < len(agg["epochs"]):
        print(f"\nEpoch {epoch_to_detail} detail (mean over runs):")
        for key in sorted(agg["mean"]):
            value = agg["mean"][key][epoch_to_detail]
            lo, hi = agg["ci"][key][epoch_to_detail]
            print(f"  {key}: {value:.4f}  (90% CI [{lo:.4f}, {hi:.4f}])")
    else:
        print(f"epoch_to_detail {epoch_to_detail} out of range "
              f"({len(agg['epochs'])} epochs)")

    p1 = plot_di_figure(agg, prefix, save_dir=exp_dir)
    p2 = plot_accuracy_figure(agg, prefix, save_dir=exp_dir)
    print(f"wrote {p1}")
    print(f"wrote {p2}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
