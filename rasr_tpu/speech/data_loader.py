"""Batched, sharded feature loading for training.

The reference streams one segment at a time through buffered processors
(src/Speech/DataExtractor.hh BufferedFeatureExtractor, aligned/labeled
buffers); the TPU-native trainer wants fixed-shape PADDED BATCHES,
bucketed by length so XLA compiles a handful of shapes, prefetched on a
host thread while the device computes, and — multi-host — assembled into
one global array whose batch axis spans all processes
(jax.make_array_from_process_local_data over the data mesh axis).

Corpus sharding rides the partition knobs
(parallel.distributed.corpus_partition_for_process): each process reads
a disjoint corpus partition and contributes its local rows to the global
batch.
"""

from __future__ import annotations

import math
import queue
import threading
from typing import Callable, Iterator, List, Optional, Sequence, Tuple

import numpy as np


def bucket_boundaries(lengths: Sequence[int], n_buckets: int = 4
                      ) -> List[int]:
    """Quantile bucket upper bounds — one compiled shape per bucket."""
    qs = np.quantile(np.asarray(lengths, np.float64),
                     np.linspace(1.0 / n_buckets, 1.0, n_buckets))
    out: List[int] = []
    for q in qs:
        b = int(math.ceil(q))
        if not out or b > out[-1]:
            out.append(b)
    return out


class BucketBatcher:
    """Groups (key, length) items into padded batches by length bucket.

    Batches close when a bucket reaches batch_size; flush() drains
    stragglers.  Items longer than the largest boundary go into a
    dedicated overflow bucket padded to the item maximum.
    """

    def __init__(self, boundaries: Sequence[int], batch_size: int):
        self.boundaries = sorted(boundaries)
        self.batch_size = batch_size
        self._buckets: List[List[Tuple[object, int]]] = [
            [] for _ in range(len(self.boundaries) + 1)]

    def _bucket_of(self, length: int) -> int:
        for i, b in enumerate(self.boundaries):
            if length <= b:
                return i
        return len(self.boundaries)

    def add(self, key, length: int) -> Optional[List[Tuple[object, int]]]:
        i = self._bucket_of(length)
        self._buckets[i].append((key, length))
        if len(self._buckets[i]) >= self.batch_size:
            out, self._buckets[i] = self._buckets[i], []
            return out
        return None

    def flush(self) -> Iterator[List[Tuple[object, int]]]:
        for i in range(len(self._buckets)):
            if self._buckets[i]:
                out, self._buckets[i] = self._buckets[i], []
                yield out

    def padded_length(self, batch: List[Tuple[object, int]]) -> int:
        longest = max(l for _, l in batch)
        for b in self.boundaries:
            if longest <= b:
                return b
        return longest


def pad_batch(features: List[np.ndarray], target_len: int,
              batch_size: Optional[int] = None
              ) -> Tuple[np.ndarray, np.ndarray]:
    """Right-pad (T_i, D) arrays to (B, target_len, D) + lengths (B,)."""
    B = batch_size or len(features)
    D = features[0].shape[1]
    out = np.zeros((B, target_len, D), dtype=np.float32)
    lens = np.zeros((B,), dtype=np.int32)
    for i, f in enumerate(features):
        t = min(len(f), target_len)
        out[i, :t] = f[:t]
        lens[i] = t
    return out, lens


class FeatureBatchLoader:
    """Iterates padded feature batches from a reader, prefetching on a
    host thread (the devices never wait on archive IO).

    read_fn(key) -> (T, D) features; keys: segment names (one corpus
    partition per process).  Yields (keys, feats (B, T_pad, D),
    lengths (B,)); fixed batch shapes per bucket.
    """

    def __init__(self, keys: Sequence, lengths: Sequence[int],
                 read_fn: Callable[[object], np.ndarray],
                 batch_size: int = 16, n_buckets: int = 4,
                 prefetch: int = 2, drop_remainder: bool = False,
                 shuffle_seed: Optional[int] = None):
        self.keys = list(keys)
        self.lengths = list(lengths)
        self.read_fn = read_fn
        self.batch_size = batch_size
        self.drop_remainder = drop_remainder
        self.boundaries = bucket_boundaries(self.lengths, n_buckets)
        self.prefetch = prefetch
        self.shuffle_seed = shuffle_seed

    def __iter__(self):
        order = np.arange(len(self.keys))
        if self.shuffle_seed is not None:
            np.random.default_rng(self.shuffle_seed).shuffle(order)
        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = object()

        def produce():
            batcher = BucketBatcher(self.boundaries, self.batch_size)
            try:
                def emit(batch):
                    # always emit (batch_size, T_pad, D): partial batches
                    # zero-pad rows (length 0) so shapes stay compiled
                    t_pad = batcher.padded_length(batch)
                    keys = [k for k, _ in batch]
                    feats = [self.read_fn(k) for k in keys]
                    arr, lens = pad_batch(feats, t_pad, self.batch_size)
                    q.put((keys, arr, lens))

                for idx in order:
                    full = batcher.add(self.keys[idx], self.lengths[idx])
                    if full is not None:
                        emit(full)
                if not self.drop_remainder:
                    for rest in batcher.flush():
                        emit(rest)
            finally:
                q.put(stop)

        t = threading.Thread(target=produce, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is stop:
                break
            yield item
        t.join()


def make_global_batch(mesh, local_feats: np.ndarray,
                      local_lens: np.ndarray):
    """Assemble per-process local rows into one global device array whose
    batch axis is sharded over the mesh 'data' axis (multi-host training:
    each process loaded its own corpus partition)."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P
    feats = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_feats)
    lens = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("data")), local_lens)
    return feats, lens
