"""Host-side image ingest + double-buffered device feeding.

The reference feeds the device through 10 fork-based DataLoader workers
that re-decode every JPEG with skimage and re-resize in float64 on every
epoch (tone_bias_train.py:334-340, tone_bias_dataset.py:326-335) — the
documented source of its ~6 img/s throughput and its fd-leak crash
(tone_bias_train.py:47-96). The TPU-native runtime replaces that with:

1. **Decode once, canonical uint8** — every image is decoded (native C++
   libjpeg decoder when built, else OpenCV, else PIL) and resized to a
   canonical square exactly once, into one contiguous ``[N, S, S, 3]``
   uint8 arena. Epochs after the first touch no JPEGs at all.
2. **uint8 across the wire** — batches go host→HBM as uint8 (4x smaller
   than float32); cast/augment/normalize happen on device
   (ops.preprocess), fused into the train step.
3. **Async prefetch** — a background thread stages the next batches onto
   the device while the current step runs, so the single host core is
   never on the critical path after warm-up. Threads, not forked
   processes: no fd leaks to monitor, nothing to ulimit.
"""

from __future__ import annotations

import os
import queue
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator

import numpy as np

import jax

from skin_image_analysis_tpu.data.dataset import LesionTable


def _decode_resize_cv2(path: str, size: int) -> np.ndarray:
    import cv2

    img = cv2.imread(path, cv2.IMREAD_COLOR)  # BGR uint8
    if img is None:
        raise IOError(f"failed to decode {path}")
    interp = cv2.INTER_AREA if img.shape[0] > size else cv2.INTER_LINEAR
    img = cv2.resize(img, (size, size), interpolation=interp)
    return img[:, :, ::-1]  # BGR → RGB


def _decode_resize_pil(path: str, size: int) -> np.ndarray:
    from PIL import Image

    with Image.open(path) as im:
        im = im.convert("RGB").resize((size, size), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


def decode_image_bytes(data: bytes, size: int) -> np.ndarray:
    """Decode + resize an in-memory encoded image (JPEG/PNG bytes) to
    uint8 [size, size, 3] RGB — the online-serving twin of
    :func:`decode_image`, same exact-resize geometry (reference
    Rescale((224,224)), tone_bias_train.py:313)."""
    try:
        import cv2

        img = cv2.imdecode(np.frombuffer(data, np.uint8), cv2.IMREAD_COLOR)
        if img is None:
            raise IOError("failed to decode image bytes")
        interp = cv2.INTER_AREA if img.shape[0] > size else cv2.INTER_LINEAR
        img = cv2.resize(img, (size, size), interpolation=interp)
        return np.ascontiguousarray(img[:, :, ::-1])
    except ImportError:
        import io

        from PIL import Image

        with Image.open(io.BytesIO(data)) as im:
            im = im.convert("RGB").resize((size, size), Image.BILINEAR)
            return np.asarray(im, dtype=np.uint8)


def decode_image(path: str, size: int, mode: str = "square") -> np.ndarray:
    """Decode + resize one image to uint8 [size, size, 3] RGB.

    ``mode="square"`` is the pipeline default (exact resize, the
    reference's Rescale((224,224)) usage, tone_bias_train.py:313).
    ``mode="shortest"`` resizes the shortest side to ``size`` preserving
    aspect (reference Rescale(int), tone_bias_dataset.py:397-427) then
    center-crops to the square the fixed-shape arenas need.
    """
    if path.lower().endswith(".dcm"):
        # ISIC-2020 archive layout: DICOM pixels through the built-in
        # parser (data.dicom — no pydicom needed), then the same resize
        # geometry as the JPEG paths
        from skin_image_analysis_tpu.data.dicom import read_dicom_image

        img = read_dicom_image(path)
        if mode == "shortest":
            img = rescale_image(img, size)
            h, w = img.shape[:2]
            y0, x0 = (h - size) // 2, (w - size) // 2
            return np.ascontiguousarray(
                img[y0 : y0 + size, x0 : x0 + size]
            )
        return rescale_image(img, (size, size))
    if mode == "shortest":
        try:
            import cv2

            img = cv2.imread(path, cv2.IMREAD_COLOR)
            if img is None:
                raise IOError(f"failed to decode {path}")
            img = img[:, :, ::-1]
        except ImportError:
            from PIL import Image

            with Image.open(path) as im:
                img = np.asarray(im.convert("RGB"), dtype=np.uint8)
        img = rescale_image(img, size)
        h, w = img.shape[:2]
        y0, x0 = (h - size) // 2, (w - size) // 2
        return np.ascontiguousarray(img[y0 : y0 + size, x0 : x0 + size])
    try:
        return _decode_resize_cv2(path, size)
    except ImportError:
        return _decode_resize_pil(path, size)


def rescale_image(
    img: np.ndarray, output_size: int | tuple[int, int]
) -> np.ndarray:
    """The reference's Rescale transform (tone_bias_dataset.py:397-427):
    int → shortest side becomes ``output_size``, aspect preserved;
    (h, w) tuple → exact resize. Host-side, uint8 in/out."""
    h, w = img.shape[:2]
    if isinstance(output_size, int):
        if h < w:
            new_h, new_w = output_size, max(round(output_size * w / h), 1)
        else:
            new_h, new_w = max(round(output_size * h / w), 1), output_size
    else:
        new_h, new_w = output_size
    if (new_h, new_w) == (h, w):
        return img
    try:
        import cv2

        interp = cv2.INTER_AREA if h > new_h else cv2.INTER_LINEAR
        return cv2.resize(img, (new_w, new_h), interpolation=interp)
    except ImportError:
        from PIL import Image

        im = Image.fromarray(img).resize((new_w, new_h), Image.BILINEAR)
        return np.asarray(im, dtype=np.uint8)


class HostImageStore:
    """Decoded canonical-uint8 arena for one LesionTable split."""

    def __init__(
        self,
        table: LesionTable,
        canonical_size: int = 256,
        workers: int = 8,
        use_native: bool = True,
        layout: str = "hwc",
        resize_mode: str = "square",
    ):
        if layout not in ("hwc", "planar"):
            raise ValueError(f"layout must be hwc|planar, got {layout!r}")
        if resize_mode not in ("square", "shortest"):
            raise ValueError(
                f"resize_mode must be square|shortest, got {resize_mode!r}"
            )
        self.table = table
        self.size = canonical_size
        self.layout = layout
        self.resize_mode = resize_mode
        if resize_mode != "square":
            use_native = False  # native decoder emits exact squares only
        paths = table.file_paths()
        if paths and all(p.lower().endswith(".dcm") for p in paths):
            # all-DICOM cohort (ISIC-2020 archive): the libjpeg decoder
            # would fail-and-report every slot; go straight to the
            # python path (mixed cohorts keep native + per-slot retry)
            use_native = False
        shape = (
            (len(paths), canonical_size, canonical_size, 3)
            if layout == "hwc"
            else (len(paths), 3, canonical_size, canonical_size)
        )
        self.images = np.empty(shape, np.uint8)
        self.bad_rows: list[int] = []
        decoded = False
        retry: list[int] | None = None
        if use_native:
            try:
                from skin_image_analysis_tpu.data import native_loader

                retry = native_loader.decode_batch_into(
                    paths, self.images, on_error="report"
                )
                decoded = True
            except Exception:
                decoded = False  # decoder unavailable: python path below

        def _one(p):
            # A corrupt or missing file must not kill a whole-cohort
            # ingest (the reference dies mid-epoch on it): zero-fill
            # the slot and report it.
            try:
                img = decode_image(p, self.size, mode=resize_mode)
            except Exception:
                return None
            return (np.transpose(img, (2, 0, 1))
                    if layout == "planar" else img)

        if not decoded:
            todo = list(range(len(paths)))
        else:
            # native decode succeeded except possibly a few reported
            # slots — retry just those on the python path (a corrupt
            # file costs one retry, not a whole-cohort bail-out)
            todo = retry or []
        if todo:
            if workers > 1 and len(todo) > 1:
                with ThreadPoolExecutor(max_workers=workers) as pool:
                    results = pool.map(_one, (paths[i] for i in todo))
            else:
                results = map(_one, (paths[i] for i in todo))
            for i, img in zip(todo, results):
                if img is None:
                    self.images[i] = 0
                    self.bad_rows.append(i)
                else:
                    self.images[i] = img
            if self.bad_rows:
                import warnings

                warnings.warn(
                    f"{len(self.bad_rows)} image(s) failed to decode and "
                    f"were zero-filled (first: "
                    f"{paths[self.bad_rows[0]]})", stacklevel=2,
                )

    def __len__(self) -> int:
        return len(self.images)

    def to_device(self, sharding=None):
        """Commit the whole uint8 arena to device memory once. Batches then
        gather on-device — no per-epoch host→HBM transfers (the decisive
        win when the host link is slow). ~0.2 GB per 1k images at 256²."""
        import jax.numpy as jnp

        arena = jnp.asarray(self.images)
        if sharding is not None:
            arena = jax.device_put(arena, sharding)
        return arena


def _pad_to(n: int, arr: np.ndarray, fill=0) -> np.ndarray:
    if len(arr) == n:
        return arr
    pad = np.full((n - len(arr), *arr.shape[1:]), fill, arr.dtype)
    return np.concatenate([arr, pad], axis=0)


class BatchIterator:
    """Epoch iterator: seeded shuffle → uint8 batches → async device_put.

    Yields dicts ``{"pixels" u8 [B,S,S,3], "label" i32 [B], "row_id" i32
    [B], "valid" bool [B]}``. The final partial batch is padded with
    ``valid=False`` rows (eval keeps every instance, matching the
    reference's full-test-set evaluation) or dropped when
    ``drop_remainder`` (train: static shapes, no wasted compile).
    """

    def __init__(
        self,
        store: HostImageStore,
        batch_size: int,
        shuffle: bool = True,
        drop_remainder: bool = False,
        seed: int = 0,
        sharding=None,
        prefetch: int = 2,
        order_fn=None,
        device_arena=None,
    ):
        self.store = store
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.prefetch = prefetch
        # order_fn(rng) -> index array; overrides shuffling (used for
        # weighted-with-replacement oversampling)
        self.order_fn = order_fn
        # device-resident uint8 arena (HostImageStore.to_device()); when
        # set, pixel batches are gathered on-device by index. With a mesh
        # the arena is replicated (see run_training) and the gather is a
        # jitted program with the batch output-sharding: every device
        # gathers its own batch shard locally — no cross-device pixel
        # traffic per batch.
        self.device_arena = device_arena
        # rows whose decode failed (zero-filled) train/evaluate as
        # valid=False — a black image with a real label would otherwise
        # inject label noise and skew the fairness metrics
        self._row_ok = np.ones(len(store), bool)
        for i in getattr(store, "bad_rows", None) or []:
            self._row_ok[i] = False
        self._idx_sharding = None
        self._gather = None
        if device_arena is not None:
            if sharding is not None:
                from jax.sharding import NamedSharding, PartitionSpec

                self._idx_sharding = NamedSharding(
                    sharding.mesh, PartitionSpec()
                )
            import jax.numpy as jnp

            self._gather = jax.jit(
                lambda arena, idx: jnp.take(arena, idx, axis=0),
                out_shardings=sharding,
            )

    def _epoch_order(self) -> np.ndarray:
        if self.order_fn is not None:
            return np.asarray(self.order_fn(self.rng))
        order = np.arange(len(self.store))
        if self.shuffle:
            self.rng.shuffle(order)
        return order

    def _host_batches(self) -> Iterator[dict]:
        order = self._epoch_order()
        table = self.store.table
        bs = self.batch_size
        n = len(order)
        stop = (n // bs) * bs if self.drop_remainder else n
        on_device = self.device_arena is not None
        for start in range(0, stop, bs):
            idx = order[start : start + bs]
            labels = table.labels[idx]
            row_ids = table.row_ids[idx]
            valid = self._row_ok[idx]
            if len(idx) < bs:
                idx = _pad_to(bs, idx)  # pad indices → valid gather rows
                labels = _pad_to(bs, labels)
                row_ids = _pad_to(bs, row_ids, fill=-1)
                valid = _pad_to(bs, valid, fill=False)
            if on_device:
                # on-device gather: no pixels cross the host link
                gidx = idx.astype(np.int32)
                if self._idx_sharding is not None:
                    gidx = jax.device_put(gidx, self._idx_sharding)
                pixels = self._gather(self.device_arena, gidx)
            else:
                pixels = self.store.images[idx]
            yield {
                "pixels": pixels,
                "label": labels.astype(np.int32),
                "row_id": row_ids.astype(np.int32),
                "valid": valid,
            }

    def __iter__(self) -> Iterator[dict]:
        put = (
            (lambda b: jax.device_put(b, self.sharding))
            if self.sharding is not None
            else jax.device_put
        )
        if self.prefetch <= 0:
            for batch in self._host_batches():
                yield put(batch)
            return

        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        _END = object()

        def producer():
            try:
                for batch in self._host_batches():
                    q.put(put(batch))
            except BaseException as e:  # surface decode errors to consumer
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            yield item
        t.join()

    def __len__(self) -> int:
        n = len(self.store)
        if self.drop_remainder:
            return n // self.batch_size
        return -(-n // self.batch_size)

    def super_batches(self, k: int, with_row_ids: bool = False):
        """Epoch as [k, B] index/label/valid super-steps for the scanned
        multi-train-step (train.step.make_multi_train_step): only these
        small arrays cross the host link — pixels stay in the device
        arena. The tail super-step is padded with valid=False steps
        (inert: the scan skips their optimizer update).

        ``with_row_ids=True`` yields ``(idx, label, row_id, valid)``
        (row_id -1 on padded rows) for the scanned eval program
        (make_multi_eval_step), which joins predictions back to metadata
        by row_id."""
        order = self._epoch_order()
        table = self.store.table
        bs = self.batch_size
        n_batches = len(order) // bs if self.drop_remainder else -(
            -len(order) // bs
        )
        idx_all = order[: n_batches * bs] if self.drop_remainder else _pad_to(
            n_batches * bs, order
        )
        valid_all = np.zeros(n_batches * bs, bool)
        kept = min(len(order), n_batches * bs)
        valid_all[:kept] = self._row_ok[order[:kept]]
        idx_all = idx_all.reshape(n_batches, bs).astype(np.int32)
        valid_all = valid_all.reshape(n_batches, bs)
        labels_all = table.labels[idx_all].astype(np.int32)
        rows_all = None
        if with_row_ids:
            rows_all = np.where(
                valid_all, table.row_ids[idx_all], -1
            ).astype(np.int32)
        for start in range(0, n_batches, k):
            ib = idx_all[start : start + k]
            lb = labels_all[start : start + k]
            vd = valid_all[start : start + k]
            rid = None if rows_all is None else rows_all[start : start + k]
            if len(ib) < k:  # pad tail with inert steps
                pad = k - len(ib)
                ib = np.concatenate([ib, np.zeros((pad, bs), np.int32)])
                lb = np.concatenate([lb, np.zeros((pad, bs), np.int32)])
                vd = np.concatenate([vd, np.zeros((pad, bs), bool)])
                if rid is not None:
                    rid = np.concatenate(
                        [rid, -np.ones((pad, bs), np.int32)]
                    )
            if with_row_ids:
                yield ib, lb, rid, vd
            else:
                yield ib, lb, vd
