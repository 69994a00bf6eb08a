"""Streaming chunked ingest for archive-scale cohorts (ISIC-2020 config).

``HostImageStore`` decodes a whole cohort into one RAM arena — right for
the 3.7k-image tone dataset, wrong for the 33k+-image ISIC-2020 archive
(or anything beyond RAM/HBM). ``ChunkedBatchIterator`` streams instead:

- the global epoch order is shuffled once per epoch, then split into
  chunks of ``chunk_size`` images;
- a background thread decodes chunk i+1 (native C++ decoder) while the
  training loop consumes chunk i's batches — decode hides behind compute;
- batches look exactly like BatchIterator's ``{pixels, label, row_id,
  valid}`` dicts, so the train loop is unchanged.

Shuffling granularity is the standard shard-shuffle compromise: batches
mix fully within a chunk and chunk order is reshuffled per epoch.
"""

from __future__ import annotations

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
        self._paths = table.file_paths()

    def _decode_chunk(self, idx: np.ndarray) -> np.ndarray:
        out = np.empty((len(idx), self.size, self.size, 3), np.uint8)
        paths = [self._paths[i] for i in idx]
        try:
            from skin_image_analysis_tpu.data import native_loader

            native_loader.decode_batch_into(paths, out)
        except Exception:
            for j, p in enumerate(paths):
                out[j] = decode_image(p, self.size)
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
            stop = (n // bs) * bs if self.drop_remainder else n
            for start in range(0, stop, bs):
                sel = slice(start, min(start + bs, n))
                b_idx = idx[sel]
                b_pix = pixels[sel]
                labels = self.table.labels[b_idx]
                row_ids = self.table.row_ids[b_idx]
                valid = np.ones(len(b_idx), bool)
                if len(b_idx) < bs:  # pad the cohort's final partial batch
                    pad = bs - len(b_idx)
                    b_pix = np.concatenate(
                        [b_pix, np.zeros((pad, *b_pix.shape[1:]), np.uint8)]
                    )
                    labels = np.concatenate([labels, np.zeros(pad, np.int32)])
                    row_ids = np.concatenate(
                        [row_ids, -np.ones(pad, np.int32)]
                    )
                    valid = np.concatenate([valid, np.zeros(pad, bool)])
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
