"""Streaming chunked ingest for archive-scale cohorts (ISIC-2020 config).

``HostImageStore`` decodes a whole cohort into one RAM arena — right for
the 3.7k-image tone dataset, wrong for the 33k+-image ISIC-2020 archive
(or anything beyond RAM/HBM). ``ChunkedBatchIterator`` streams instead:

- the global epoch order is shuffled once per epoch, then split into
  chunks of ``chunk_size`` images;
- a background thread decodes chunk i+1 (native C++ decoder) while the
  training loop consumes chunk i's batches — decode hides behind compute;
- each decoded chunk is committed to the device ONCE as a uint8 arena
  and batches gather on-device by index (``device_chunks=True``) — the
  slow host link sees one large contiguous transfer per chunk instead of
  per-batch puts;
- with a ``cache_path``, the canonical uint8 frames are spilled to a
  disk memmap while epoch 1 decodes; later epochs stream chunks straight
  from the memmap at disk speed and never touch a JPEG again (the
  single-core JPEG decode is ~20x slower than the TPU step — see
  docs/PERF.md §streaming — so the cache is what makes multi-epoch
  archive-scale training device-bound);
- batches look exactly like BatchIterator's ``{pixels, label, row_id,
  valid}`` dicts, so the train loop is unchanged.

Shuffling granularity is the standard shard-shuffle compromise: batches
mix fully within a chunk and chunk order is reshuffled per epoch.
"""

from __future__ import annotations

import os
import queue
import threading

import numpy as np

import jax

from skin_image_analysis_tpu.data.dataset import LesionTable
from skin_image_analysis_tpu.data.loader import decode_image


class ChunkedBatchIterator:
    def __init__(
        self,
        table: LesionTable,
        canonical_size: int = 256,
        batch_size: int = 32,
        chunk_size: int = 2048,
        shuffle: bool = True,
        drop_remainder: bool = True,
        seed: int = 0,
        sharding=None,
        decode_ahead: int = 1,
        device_chunks: bool = True,
        cache_path: str | None = None,
    ):
        if chunk_size % batch_size:
            raise ValueError(
                f"chunk_size {chunk_size} must be a multiple of "
                f"batch_size {batch_size}"
            )
        self.table = table
        self.size = canonical_size
        self.batch_size = batch_size
        self.chunk_size = chunk_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.rng = np.random.default_rng(seed)
        self.sharding = sharding
        self.decode_ahead = decode_ahead
        self.device_chunks = device_chunks
        self._paths = table.file_paths()
        self._gather = None
        # global row indices whose decode failed (zero-filled frames):
        # their batches carry valid=False. Populated as chunks decode; a
        # completed disk cache persists the set next to its .ready flag
        # so a resumed process (exactly the --auto-resume flow) keeps
        # serving those rows invalid instead of training zero-filled
        # frames with real labels.
        self._bad: set[int] = set()
        # decode-once disk cache: canonical uint8 memmap [N, S, S, 3]
        self._cache = None
        self._cache_ready = None
        if cache_path:
            os.makedirs(os.path.dirname(cache_path) or ".", exist_ok=True)
            n = len(self._paths)
            shape = (n, self.size, self.size, 3)
            mode = "r+" if os.path.exists(cache_path) else "w+"
            self._cache = np.lib.format.open_memmap(
                cache_path, mode=mode, dtype=np.uint8, shape=shape
            ) if mode == "w+" else np.lib.format.open_memmap(
                cache_path, mode="r+"
            )
            if self._cache.shape != shape:
                raise ValueError(
                    f"cache {cache_path} shape {self._cache.shape} != {shape}"
                )
            flag = cache_path + ".ready"
            self._cache_flag = flag
            self._bad_file = cache_path + ".bad"
            self._cache_ready = np.zeros(n, bool)
            if os.path.exists(flag):
                if os.path.exists(self._bad_file):
                    self._cache_ready[:] = np.fromfile(flag, bool)[:n]
                    self._bad.update(
                        int(i)
                        for i in np.fromfile(self._bad_file, np.int64)
                    )
                # else: a ready flag WITHOUT the bad-row sidecar (cache
                # written by a pre-sidecar revision) cannot prove which
                # zero frames are corrupt — distrust it and re-validate
                # by decoding (the cache rewrites with both files)

    def _decode_chunk(self, idx: np.ndarray) -> np.ndarray:
        if self._cache is not None and self._cache_ready[idx].all():
            return np.ascontiguousarray(self._cache[idx])
        out = np.empty((len(idx), self.size, self.size, 3), np.uint8)
        paths = [self._paths[i] for i in idx]
        try:
            from skin_image_analysis_tpu.data import native_loader

            # report mode: one corrupt file costs one python-path retry
            # for that slot, not a whole-chunk native bail-out
            todo = native_loader.decode_batch_into(
                paths, out, on_error="report"
            )
        except Exception:
            todo = list(range(len(paths)))  # decoder unavailable
        bad_local = []
        for j in todo:
            try:
                out[j] = decode_image(paths[j], self.size)
            except Exception:
                out[j] = 0  # corrupt file: zero-fill, keep streaming
                bad_local.append(j)
        if bad_local:
            import warnings

            # batches carry these rows with valid=False (see __iter__)
            self._bad.update(int(idx[j]) for j in bad_local)
            warnings.warn(
                f"{len(bad_local)} image(s) failed to decode in a chunk "
                f"and were zero-filled (first: {paths[bad_local[0]]})",
                stacklevel=2,
            )
        if self._cache is not None:
            self._cache[idx] = out
            self._cache_ready[idx] = True
            if self._cache_ready.all():
                self._cache.flush()
                # bad-row set BEFORE the ready flag: a crash in between
                # leaves an unflagged cache (fully re-validated on reuse),
                # never a ready cache with amnesia about corrupt rows
                np.asarray(sorted(self._bad), np.int64).tofile(
                    self._bad_file
                )
                self._cache_ready.tofile(self._cache_flag)
        return out

    def _chunk_indices(self):
        order = np.arange(len(self.table))
        if self.shuffle:
            self.rng.shuffle(order)
        for start in range(0, len(order), self.chunk_size):
            yield order[start : start + self.chunk_size]

    def __iter__(self):
        q: queue.Queue = queue.Queue(maxsize=self.decode_ahead)
        _END = object()

        def producer():
            try:
                for idx in self._chunk_indices():
                    q.put((idx, self._decode_chunk(idx)))
            except BaseException as e:
                q.put(e)
                return
            q.put(_END)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        bs = self.batch_size
        while True:
            item = q.get()
            if item is _END:
                break
            if isinstance(item, BaseException):
                raise item
            idx, pixels = item
            n = len(idx)
            chunk_arena = None
            if self.device_chunks:
                # one contiguous host->HBM transfer per chunk; batches
                # then gather on-device (the slow-link win, same design
                # as the whole-cohort device cache). Pad the tail chunk to
                # chunk_size so the gather program compiles once.
                if n < self.chunk_size:
                    pixels = np.concatenate([
                        pixels,
                        np.zeros((self.chunk_size - n, *pixels.shape[1:]),
                                 np.uint8),
                    ])
                if self.sharding is not None:
                    from jax.sharding import NamedSharding, PartitionSpec

                    rep = NamedSharding(self.sharding.mesh, PartitionSpec())
                    chunk_arena = jax.device_put(pixels, rep)
                else:
                    chunk_arena = jax.device_put(pixels)
                if self._gather is None:
                    import jax.numpy as jnp

                    self._gather = jax.jit(
                        lambda arena, i: jnp.take(arena, i, axis=0),
                        out_shardings=self.sharding,
                    )
            stop = (n // bs) * bs if self.drop_remainder else n
            for start in range(0, stop, bs):
                sel = slice(start, min(start + bs, n))
                b_idx = idx[sel]
                local = np.arange(sel.start, min(sel.stop, n), dtype=np.int32)
                labels = self.table.labels[b_idx]
                row_ids = self.table.row_ids[b_idx]
                if self._bad:
                    valid = np.fromiter(
                        (int(i) not in self._bad for i in b_idx),
                        bool, len(b_idx),
                    )
                else:
                    valid = np.ones(len(b_idx), bool)
                if len(b_idx) < bs:  # pad the cohort's final partial batch
                    pad = bs - len(b_idx)
                    local = np.concatenate([local, np.zeros(pad, np.int32)])
                    labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                    row_ids = np.concatenate(
                        [row_ids, -np.ones(pad, np.int32)]
                    )
                    valid = np.concatenate([valid, np.zeros(pad, bool)])
                if chunk_arena is not None:
                    b_pix = self._gather(chunk_arena, local)
                else:
                    b_pix = pixels[local]
                batch = {
                    "pixels": b_pix,
                    "label": labels.astype(np.int32),
                    "row_id": row_ids.astype(np.int32),
                    "valid": valid,
                }
                if self.sharding is not None:
                    batch = jax.device_put(batch, self.sharding)
                else:
                    batch = jax.device_put(batch)
                yield batch
            del chunk_arena
        t.join()

    def __len__(self) -> int:
        n = len(self.table)
        if self.drop_remainder:
            # remainder dropped per chunk
            full_chunks, rem = divmod(n, self.chunk_size)
            return full_chunks * (self.chunk_size // self.batch_size) + (
                rem // self.batch_size
            )
        return -(-n // self.batch_size)
