"""Host-side batch loader: sharded shuffling sampler + threaded prefetch.

Replaces the reference's ``DataLoader(num_workers=4) + DistributedSampler +
iterator_`` stack (ori_pseudo.py:41-58, utils.py:168-188):

* per-epoch seeded global permutation, sharded across hosts — the
  ``DistributedSampler.set_epoch`` contract (ori_pseudo.py:155-157) as a
  pure function of (seed, epoch); shards are padded to EQUAL length (train:
  wrap-around oversampling like DistributedSampler; eval: masked pad
  entries) so every process sees the same number of batches — mismatched
  counts would deadlock the collective train/eval steps on a multi-host
  mesh;
* ``drop_last`` batching for train, padded+masked final batch for eval;
* a thread pool decodes records into pinned numpy canvases one batch ahead
  (decode is the only host work left — all augmentation is on device);
  batch assembly runs on a SEPARATE single-purpose pool so assembly futures
  can never starve waiting on decode workers from the same pool;
* ``InfiniteLoader`` cycles epochs with re-shuffling, the analog of the
  reference's infinite unlabeled iterator.

A C++ decode/prefetch runtime can be slotted behind the same interface (see
native/); the Python thread pool is the portable default.
"""

from __future__ import annotations

import concurrent.futures as cf
from typing import Iterator, List, Optional

import numpy as np

__all__ = ["BatchLoader", "InfiniteLoader"]


def _epoch_permutation(n: int, seed: int, epoch: int, shuffle: bool) -> np.ndarray:
    if not shuffle:
        return np.arange(n)
    return np.random.default_rng(seed * 1000003 + epoch).permutation(n)


class BatchLoader:
    """Iterates dict batches: image [B,H,W,3] u8, label [B,H,W] i32,
    valid_hw [B,2] i32, valid [B] bool (False only on eval padding)."""

    def __init__(
        self,
        spec,
        sample_ids: List[str],
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        drop_last: bool = True,
        num_shards: int = 1,
        shard_index: int = 0,
        num_workers: int = 8,
        prefetch: int = 2,
    ):
        self.spec = spec
        self.ids = list(sample_ids)
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.num_shards = num_shards
        self.shard_index = shard_index
        self.epoch = 0
        # decode work and batch assembly use DISJOINT pools: _make_batch
        # blocks on decode results, so sharing one pool deadlocks as soon as
        # every worker is an assembly task waiting on decode slots
        # (prefetch + 1 >= num_workers).
        self._decode_pool = cf.ThreadPoolExecutor(max_workers=num_workers)
        self._batch_pool = cf.ThreadPoolExecutor(max_workers=prefetch + 1)
        self.prefetch = prefetch

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch

    def _shard_ids(self) -> List[Optional[str]]:
        """This shard's sample ids, padded so every shard has EQUAL length.

        Train (shuffle=True) pads by wrapping the permutation — the
        ``DistributedSampler`` oversampling contract; eval pads with ``None``
        entries that become masked (valid=False) batch rows, so global
        metrics count every sample exactly once.
        """
        n = len(self.ids)
        order = _epoch_permutation(n, self.seed, self.epoch, self.shuffle)
        if self.num_shards > 1:
            per = -(-n // self.num_shards)
            pad = per * self.num_shards - n
            if pad:
                if self.shuffle:
                    order = np.concatenate([order, order[:pad]])
                else:
                    order = np.concatenate([order, np.full(pad, -1)])
            order = order[self.shard_index::self.num_shards]
        return [self.ids[i] if i >= 0 else None for i in order]

    def __len__(self) -> int:
        n = len(self._shard_ids())
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _make_batch(self, ids: List[Optional[str]]) -> dict:
        b = self.batch_size
        ch, cw = self.spec.canvas_hw
        image = np.zeros((b, ch, cw, 3), np.uint8)
        label = np.full((b, ch, cw), 255, np.int32)
        valid_hw = np.ones((b, 2), np.int32)
        valid = np.zeros((b,), bool)
        # decode straight into the batch rows — the native decoders write
        # scanlines in place with the GIL released, so workers overlap and
        # no per-sample canvas allocation/copy happens on this path
        jobs = [(i, s) for i, s in enumerate(ids) if s is not None]

        def _decode_row(args):
            i, sid = args
            valid_hw[i] = self.spec.load_into(sid, image[i], label[i])
            valid[i] = True

        list(self._decode_pool.map(_decode_row, jobs))
        return dict(image=image, label=label, valid_hw=valid_hw, valid=valid)

    def __iter__(self) -> Iterator[dict]:
        ids = self._shard_ids()
        batches = []
        for i in range(0, len(ids), self.batch_size):
            chunk = ids[i:i + self.batch_size]
            if len(chunk) < self.batch_size and self.drop_last:
                break
            batches.append(chunk)

        # pipeline: keep `prefetch` batch futures in flight
        futures: List[cf.Future] = []
        submit_iter = iter(batches)

        def _submit_next():
            try:
                chunk = next(submit_iter)
            except StopIteration:
                return
            futures.append(self._batch_pool.submit(self._make_batch, chunk))

        for _ in range(self.prefetch + 1):
            _submit_next()
        idx = 0
        while idx < len(batches):
            batch = futures[idx].result()
            _submit_next()
            yield batch
            idx += 1


class InfiniteLoader:
    """Endless batches, re-shuffling each epoch boundary (utils.py:168-188)."""

    def __init__(self, loader: BatchLoader, start_epoch: int = 0):
        self.loader = loader
        self.epoch = start_epoch
        self._it: Optional[Iterator] = None

    def __next__(self) -> dict:
        while True:
            fresh = self._it is None
            if fresh:
                self.loader.set_epoch(self.epoch)
                self._it = iter(self.loader)
            try:
                return next(self._it)
            except StopIteration:
                self.epoch += 1
                self._it = None
                if fresh:
                    # a freshly created iterator yielded nothing: the split
                    # shards to fewer ids than one batch (drop_last), so the
                    # while-loop would spin forever — fail loudly instead
                    raise RuntimeError(
                        "InfiniteLoader: the wrapped loader yielded no "
                        "batches (split smaller than one batch with "
                        "drop_last?). Lower the batch size or enlarge the "
                        "split.")
