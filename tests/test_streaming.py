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


def test_device_chunks_match_host_path(table):
    """device_chunks=True (chunk arena + on-device gather) must yield the
    same pixels/labels as the host path."""
    def collect(device_chunks):
        it = ChunkedBatchIterator(
            table, canonical_size=24, batch_size=8, chunk_size=16,
            shuffle=True, drop_remainder=False, seed=3,
            device_chunks=device_chunks,
        )
        out = []
        for b in it:
            out.append((np.asarray(b["pixels"]), np.asarray(b["label"]),
                        np.asarray(b["valid"])))
        return out

    a, b = collect(True), collect(False)
    assert len(a) == len(b)
    for (pa, la, va), (pb, lb, vb) in zip(a, b):
        np.testing.assert_array_equal(va, vb)
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(pa[va], pb[vb])


def test_stream_cache_roundtrip(table, tmp_path):
    """Epoch 1 decodes + fills the disk memmap; epoch 2 streams from it
    with identical pixels and no JPEG decodes."""
    from skin_image_analysis_tpu.data import streaming as streaming_mod

    cache = str(tmp_path / "cache.npy")
    it = ChunkedBatchIterator(
        table, canonical_size=24, batch_size=8, chunk_size=16,
        shuffle=False, drop_remainder=False, seed=0,
        device_chunks=False, cache_path=cache,
    )
    epoch1 = [np.asarray(b["pixels"]).copy() for b in it]
    assert it._cache_ready.all()
    import os
    assert os.path.exists(cache + ".ready")

    # epoch 2: poison decode_image to prove no decode happens
    orig = streaming_mod.decode_image
    streaming_mod.decode_image = lambda *a, **k: (_ for _ in ()).throw(
        AssertionError("decoded during cached epoch"))
    try:
        epoch2 = [np.asarray(b["pixels"]).copy() for b in it]
    finally:
        streaming_mod.decode_image = orig
    for p1, p2 in zip(epoch1, epoch2):
        np.testing.assert_array_equal(p1, p2)

    # a fresh iterator (resume) picks the cache up from the .ready flag
    it2 = ChunkedBatchIterator(
        table, canonical_size=24, batch_size=8, chunk_size=16,
        shuffle=False, drop_remainder=False, seed=0,
        device_chunks=False, cache_path=cache,
    )
    assert it2._cache_ready.all()


def test_stream_cache_remembers_corrupt_rows_across_processes(
    synth_root, tmp_path,
):
    """A ready cache persists which rows were corrupt (zero-filled): a
    fresh iterator — the --auto-resume restart path — must keep serving
    them valid=False instead of training zero frames with real labels."""
    import os
    import shutil

    root = tmp_path / "stream_corrupt_root"
    shutil.copytree(synth_root, root)
    df = read_isic_metadata(str(root), seed=0)
    victim = df.iloc[3]["isic_id"]
    (root / f"{victim}.jpg").write_bytes(b"definitely not a jpeg")
    tbl = LesionTable(df, str(root))
    victim_rows = {
        i for i, p in enumerate(tbl.file_paths()) if victim in p
    }
    assert victim_rows

    cache = str(tmp_path / "stream_corrupt.npy")

    def collect_invalid(it):
        bad = set()
        for b in it:
            rid = np.asarray(b["row_id"])
            vd = np.asarray(b["valid"])
            bad.update(int(r) for r in rid[(~vd) & (rid >= 0)])
        return bad

    with pytest.warns(UserWarning, match="failed to decode"):
        it1 = ChunkedBatchIterator(
            tbl, canonical_size=24, batch_size=8, chunk_size=16,
            shuffle=False, drop_remainder=False, seed=0,
            device_chunks=False, cache_path=cache,
        )
        assert collect_invalid(it1) == victim_rows
    assert os.path.exists(cache + ".ready")
    assert os.path.exists(cache + ".bad")

    # fresh iterator over the ready cache (no decode happens): the
    # corrupt rows must still evaluate invalid
    it2 = ChunkedBatchIterator(
        tbl, canonical_size=24, batch_size=8, chunk_size=16,
        shuffle=False, drop_remainder=False, seed=0,
        device_chunks=False, cache_path=cache,
    )
    assert it2._cache_ready.all()
    assert collect_invalid(it2) == victim_rows


def test_stream_cache_without_bad_sidecar_is_distrusted(table, tmp_path):
    """A .ready flag written by a pre-sidecar revision (no .bad file)
    cannot prove which zero frames were corrupt — the cache must be
    re-validated by decoding rather than trusted with an empty bad set."""
    import os

    cache = str(tmp_path / "legacy_cache.npy")
    it = ChunkedBatchIterator(
        table, canonical_size=24, batch_size=8, chunk_size=16,
        shuffle=False, drop_remainder=False, seed=0,
        device_chunks=False, cache_path=cache,
    )
    for _ in it:
        pass
    assert os.path.exists(cache + ".bad")
    os.remove(cache + ".bad")  # simulate the pre-sidecar cache

    it2 = ChunkedBatchIterator(
        table, canonical_size=24, batch_size=8, chunk_size=16,
        shuffle=False, drop_remainder=False, seed=0,
        device_chunks=False, cache_path=cache,
    )
    assert not it2._cache_ready.any()  # distrusted → re-decodes
    for _ in it2:
        pass
    assert os.path.exists(cache + ".bad")  # rewritten with the flag
    assert it2._cache_ready.all()
