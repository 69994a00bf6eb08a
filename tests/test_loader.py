"""Host loader: decode arena, batch iteration, padding, prefetch, the
native C++ decoder, and fd hygiene (the reference's failure mode was a
+10 fd/epoch leak from fork workers, tone_bias_train.py:47-96)."""

import os

import numpy as np
import pytest

from skin_image_analysis_tpu.data import LesionTable, read_isic_metadata
from skin_image_analysis_tpu.data.loader import (
    BatchIterator,
    HostImageStore,
    decode_image,
)


@pytest.fixture(scope="module")
def store(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    return HostImageStore(table, canonical_size=48, workers=2)


def test_store_shape_dtype(store):
    assert store.images.shape == (40, 48, 48, 3)
    assert store.images.dtype == np.uint8
    # images decoded (not all zeros)
    assert store.images.mean() > 10


def test_batches_cover_dataset(store):
    it = BatchIterator(store, batch_size=16, shuffle=True, seed=1, prefetch=0)
    seen = []
    for batch in it:
        valid = np.asarray(batch["valid"])
        seen += list(np.asarray(batch["row_id"])[valid])
        assert np.asarray(batch["pixels"]).shape == (16, 48, 48, 3)
    assert sorted(seen) == list(range(40))
    # padded rows marked invalid, row_id -1
    assert len(it) == 3


def test_drop_remainder(store):
    it = BatchIterator(store, batch_size=16, shuffle=False, drop_remainder=True,
                       prefetch=0)
    batches = list(it)
    assert len(batches) == 2
    for b in batches:
        assert np.asarray(b["valid"]).all()


def test_prefetch_matches_sync(store):
    a = [np.asarray(b["row_id"]) for b in BatchIterator(
        store, 16, shuffle=True, seed=5, prefetch=0)]
    b = [np.asarray(b["row_id"]) for b in BatchIterator(
        store, 16, shuffle=True, seed=5, prefetch=2)]
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_epoch_reshuffles(store):
    it = BatchIterator(store, 16, shuffle=True, seed=2, prefetch=0)
    e1 = np.concatenate([np.asarray(b["row_id"]) for b in it])
    e2 = np.concatenate([np.asarray(b["row_id"]) for b in it])
    assert not np.array_equal(e1, e2)


def test_order_fn(store):
    order = np.arange(40)[::-1]
    it = BatchIterator(store, 40, shuffle=False, prefetch=0,
                       order_fn=lambda rng: order)
    batch = next(iter(it))
    np.testing.assert_array_equal(np.asarray(batch["row_id"]), order)


def test_decode_image_shapes(synth_root):
    path = os.path.join(synth_root, os.listdir(synth_root)[0])
    if not path.endswith(".jpg"):
        path = [os.path.join(synth_root, n) for n in os.listdir(synth_root)
                if n.endswith(".jpg")][0]
    img = decode_image(path, 32)
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_no_fd_leak_across_epochs(store):
    from skin_image_analysis_tpu.utils.monitor import fd_count

    it = BatchIterator(store, 16, shuffle=True, prefetch=2)
    before = fd_count()
    for _ in range(3):
        for _ in it:
            pass
    after = fd_count()
    assert after - before <= 2, (before, after)


class TestNativeDecoder:
    @pytest.fixture(autouse=True)
    def _skip_without_native(self):
        from skin_image_analysis_tpu.data import native_loader

        if not native_loader.available():
            pytest.skip("native decoder not built")

    def test_matches_python_path(self, synth_root):
        from skin_image_analysis_tpu.data import native_loader

        paths = sorted(
            os.path.join(synth_root, n)
            for n in os.listdir(synth_root)
            if n.endswith(".jpg")
        )[:8]
        out = np.empty((8, 64, 64, 3), np.uint8)
        n = native_loader.decode_batch_into(paths, out)
        assert n == 8
        ref = decode_image(paths[0], 64)
        diff = np.abs(ref.astype(int) - out[0].astype(int))
        assert diff.mean() < 2.0  # same resampler class

    def test_failure_raises(self, tmp_path):
        from skin_image_analysis_tpu.data import native_loader

        bad = str(tmp_path / "missing.jpg")
        with pytest.raises(IOError, match="failed"):
            native_loader.decode_batch_into(
                [bad], np.empty((1, 32, 32, 3), np.uint8)
            )

    def test_arena_validation(self):
        from skin_image_analysis_tpu.data import native_loader

        with pytest.raises(ValueError):
            native_loader.decode_batch_into(
                ["x.jpg"], np.empty((1, 32, 32, 3), np.float32)
            )


def test_store_uses_native_when_available(synth_root):
    from skin_image_analysis_tpu.data import native_loader

    if not native_loader.available():
        pytest.skip("native decoder not built")
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    native_store = HostImageStore(table, canonical_size=48, use_native=True)
    python_store = HostImageStore(table, canonical_size=48, use_native=False)
    diff = np.abs(
        native_store.images.astype(int) - python_store.images.astype(int)
    )
    assert diff.mean() < 2.0


def test_corrupt_image_zero_fills_instead_of_crashing(synth_root, tmp_path):
    """A corrupt JPEG must not kill whole-cohort ingest (the reference
    dies mid-epoch): the slot zero-fills, the row is reported, and the
    rest of the arena decodes normally."""
    import shutil

    root = tmp_path / "corrupt_root"
    shutil.copytree(synth_root, root)
    df = read_isic_metadata(str(root), seed=0)
    victim = df.iloc[0]["isic_id"]
    victim_path = root / f"{victim}.jpg"
    victim_path.write_bytes(b"not a jpeg at all")
    table = LesionTable(df, str(root))
    with pytest.warns(UserWarning, match="failed to decode"):
        store = HostImageStore(table, canonical_size=32, use_native=False)
    assert len(store.bad_rows) == 1
    assert store.images[store.bad_rows[0]].sum() == 0
    good = [i for i in range(len(store)) if i not in store.bad_rows]
    assert store.images[good].sum() > 0  # the rest decoded

    # native path: the decoder reports the failed slot, the python
    # retry also fails, same zero-fill outcome — no whole-cohort bail
    from skin_image_analysis_tpu.data import native_loader

    if native_loader.available():
        with pytest.warns(UserWarning, match="failed to decode"):
            nstore = HostImageStore(
                table, canonical_size=32, use_native=True
            )
        assert nstore.bad_rows == store.bad_rows
        assert nstore.images[good].sum() > 0


def test_rescale_image_int_preserves_aspect():
    from skin_image_analysis_tpu.data.loader import rescale_image

    img = np.zeros((100, 200, 3), np.uint8)
    out = rescale_image(img, 50)  # shortest side (h) -> 50
    assert out.shape == (50, 100, 3)
    out = rescale_image(np.zeros((200, 100, 3), np.uint8), 50)
    assert out.shape == (100, 50, 3)


def test_rescale_image_tuple_exact():
    from skin_image_analysis_tpu.data.loader import rescale_image

    out = rescale_image(np.zeros((100, 200, 3), np.uint8), (30, 40))
    assert out.shape == (30, 40, 3)


def test_decode_shortest_mode(synth_root):
    # synthetic images are square, so shortest+crop == square size here;
    # the point is the path runs and yields the canonical square
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    path = table.file_paths()[0]
    img = decode_image(path, 32, mode="shortest")
    assert img.shape == (32, 32, 3) and img.dtype == np.uint8


def test_store_resize_mode_shortest(synth_root):
    df = read_isic_metadata(synth_root, seed=0)
    table = LesionTable(df, synth_root)
    s = HostImageStore(table, canonical_size=32, workers=2,
                       resize_mode="shortest")
    assert s.images.shape[1:] == (32, 32, 3)
    with pytest.raises(ValueError, match="resize_mode"):
        HostImageStore(table, canonical_size=32, resize_mode="bogus")
