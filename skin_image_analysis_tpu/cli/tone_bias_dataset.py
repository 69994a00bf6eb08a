#!/usr/bin/env python
"""Dataset CLI — reference surface (tone_bias_dataset.py:501-633)::

    python cli/tone_bias_dataset.py <image root> <balance|imbalanced>

``balance`` writes ``balanced_metadata.csv`` next to the originals;
either mode then runs the loader smoke test (split → iterate every
batch), the reference's ``main_dataset`` behavior.
"""

from __future__ import annotations

import os
import sys
import time

from skin_image_analysis_tpu.utils.compile_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from skin_image_analysis_tpu.data import (  # noqa: E402
    LesionTable,
    balance_dataset,
    print_counts,
    read_isic_metadata,
    shuffle_split,
)
from skin_image_analysis_tpu.data.loader import BatchIterator, HostImageStore  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) != 2:
        print("Usage: <root directory of ISIC images> <balance|imbalanced>")
        return 1
    root, mode = argv
    df = read_isic_metadata(root)
    print_counts(df)
    if mode == "balance":
        df = balance_dataset(df)
        out_path = os.path.join(root, "balanced_metadata.csv")
        df.to_csv(out_path)
        print(f"Wrote {out_path}")

    # Loader smoke test: split, decode, iterate all train batches.
    train_df, test_df = shuffle_split(df, ratio=0.7)
    train_table = LesionTable(train_df, root)
    start = time.time()
    store = HostImageStore(train_table, canonical_size=224)
    print(f"decoded {len(store)} images in {time.time() - start:.1f}s")
    loader = BatchIterator(store, batch_size=32, shuffle=True)
    n = 0
    start = time.time()
    for batch in loader:
        # host-side count: compiling an XLA program just to sum a bool
        # mask costs ~30-90 s through the remote-compile relay
        import numpy as np

        n += int(np.asarray(batch["valid"]).sum())
    print(f"iterated {n} instances in {time.time() - start:.1f}s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
