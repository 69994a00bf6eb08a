"""Streaming chunked ingest: coverage, padding, decode-ahead pipelining
(the ISIC-2020-scale path)."""

import numpy as np
import pytest

from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata
from skin_image_analysis_tpu.data.streaming import ChunkedBatchIterator


@pytest.fixture(scope="module")
def table(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    return LesionTable(df, synth_root)  # 40 rows


def test_covers_dataset_drop_remainder(table, synth_root):
    it = ChunkedBatchIterator(
        table, canonical_size=32, batch_size=8, chunk_size=16, seed=1
    )
    seen = []
    for batch in it:
        valid = np.asarray(batch["valid"])
        assert valid.all()  # drop_remainder: all batches full
        seen += list(np.asarray(batch["row_id"]))
        assert np.asarray(batch["pixels"]).shape == (8, 32, 32, 3)
    # 40 rows in chunks of 16: 16+16+8 → all batches full (8 | 16)
    assert sorted(seen) == list(range(40))
    assert len(it) == 5


def test_keep_remainder_pads(table):
    it = ChunkedBatchIterator(
        table, canonical_size=32, batch_size=16, chunk_size=32,
        drop_remainder=False, seed=2,
    )
    seen = []
    for batch in it:
        valid = np.asarray(batch["valid"])
        seen += list(np.asarray(batch["row_id"])[valid])
    assert sorted(seen) == list(range(40))


def test_epochs_reshuffle(table):
    it = ChunkedBatchIterator(
        table, canonical_size=32, batch_size=8, chunk_size=40, seed=3
    )
    e1 = np.concatenate([np.asarray(b["row_id"]) for b in it])
    e2 = np.concatenate([np.asarray(b["row_id"]) for b in it])
    assert not np.array_equal(e1, e2)


def test_pixels_match_direct_decode(table, synth_root):
    from skin_image_analysis_tpu.data.loader import HostImageStore

    store = HostImageStore(table, canonical_size=32, workers=2)
    it = ChunkedBatchIterator(
        table, canonical_size=32, batch_size=8, chunk_size=16,
        shuffle=False, seed=0,
    )
    first = next(iter(it))
    rows = np.asarray(first["row_id"])
    np.testing.assert_array_equal(
        np.asarray(first["pixels"]), store.images[rows]
    )


def test_chunk_batch_divisibility_enforced(table):
    with pytest.raises(ValueError, match="multiple"):
        ChunkedBatchIterator(table, batch_size=7, chunk_size=16)
