"""Host->device feeding: double-buffered prefetch over a background thread.

The reference overlaps augmentation with GPU compute via DataLoader worker
processes + pin_memory (reference pretrain_BreastPathQ.py:212-216).  Here
augmentation is on device, so the host's only job is shuffling, slicing, and
shipping raw uint8 batches; a single prefetch thread with a small queue keeps
`jax.device_put` ahead of the step."""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional

import jax
import numpy as np


def epoch_indices(
    n: int,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator[np.ndarray]:
    """Yield per-batch index arrays for one epoch over ``n`` items — the
    single definition of epoch order/drop_last semantics (the dataset
    ``batches`` methods and ``batch_iterator`` all delegate here)."""
    idx = np.arange(n)
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    end = n - (n % batch_size) if drop_last else n
    for i in range(0, end, batch_size):
        yield idx[i : i + batch_size]


def batch_iterator(
    arrays,
    batch_size: int,
    shuffle: bool = True,
    seed: int = 0,
    drop_last: bool = True,
) -> Iterator:
    """Yield aligned batch tuples from equal-length numpy arrays."""
    for sel in epoch_indices(len(arrays[0]), batch_size, shuffle, seed, drop_last):
        yield tuple(a[sel] for a in arrays)


def pad_batches(it: Iterable, batch_size: int) -> Iterator:
    """Zero-pad trailing partial batches to `batch_size`, yielding
    (batch, valid) with a float32 validity mask.  Keeps eval shapes static
    (no recompiles) and every batch divisible for data-axis sharding;
    consumers weight their metrics by the mask.

    Batches may be bare arrays or tuples of batch-aligned arrays (e.g. the
    ``(images, labels)`` iterators ``mesh_for_batch``'s pod error message
    points here); tuple elements pad along axis 0 together."""
    for batch in it:
        is_tuple = isinstance(batch, tuple)
        parts = batch if is_tuple else (batch,)
        b = len(parts[0])
        valid = np.ones(batch_size, np.float32)
        if b != batch_size:
            pad = batch_size - b
            parts = tuple(
                np.concatenate(
                    [p, np.zeros((pad, *np.shape(p)[1:]), np.asarray(p).dtype)]
                )
                for p in parts
            )
            valid[b:] = 0.0
        yield (parts if is_tuple else parts[0]), valid


def chunk_batches(it: Iterable, k: int) -> Iterator:
    """Stack k consecutive batches along a new leading axis for multi-step
    scan execution (``parallel.steps.make_pretrain_multi_step``): one
    device dispatch runs k train steps.

    Yields (stacked, valid) where stacked leaves have shape (k, B, ...) and
    valid is a float32 (k,) mask; a partial final chunk is zero-padded with
    its padded steps marked invalid (the scan discards their state update),
    so shapes stay static and no batch is dropped."""
    buf = []
    for batch in it:
        buf.append(batch if isinstance(batch, tuple) else (batch,))
        if len(buf) == k:
            yield _stack_chunk(buf, k)
            buf = []
    if buf:
        yield _stack_chunk(buf, k)


def _stack_chunk(buf, k):
    n = len(buf)
    valid = np.zeros(k, np.float32)
    valid[:n] = 1.0
    parts = []
    for arrays in zip(*buf):
        stacked = np.stack(arrays)
        if n < k:
            pad = np.zeros((k - n, *stacked.shape[1:]), stacked.dtype)
            stacked = np.concatenate([stacked, pad])
        parts.append(stacked)
    out = parts[0] if len(parts) == 1 else tuple(parts)
    return out, valid


def prefetch_to_device(
    it: Iterable,
    size: int = 2,
    sharding: Optional[jax.sharding.Sharding] = None,
) -> Iterator:
    """Run `it` on a background thread, device_put each item ahead of use.

    An indivisible batch (leading dim not divisible by the sharding) raises
    immediately instead of silently replicating — a silent fallback would
    change memory layout/perf mid-epoch on a pod.  Size the mesh with
    ``parallel.mesh_for_batch`` or pad with ``pad_batches``.

    If the consumer stops early (break / GC), the generator's cleanup stops
    the worker thread — it would otherwise block forever on a full queue
    with device buffers pinned, and keep reading from loader state (e.g.
    per-slide readers) shared with the next epoch's thread.
    """

    def put_leaf(x, sh):
        from ssl_cr_histo_tpu.parallel.distributed import put_sharded

        try:
            # topology-transparent: plain device_put single-process, per-host
            # shard contribution when the sharding spans processes
            return put_sharded(x, sh)
        except ValueError as e:
            raise ValueError(
                f"batch with shape {np.shape(x)} is not shardable over "
                f"{sh}; size the mesh to the batch "
                f"(parallel.mesh_for_batch) or pad (pad_batches)"
            ) from e

    def put(item):
        if sharding is None or isinstance(sharding, jax.sharding.Sharding):
            return jax.tree_util.tree_map(lambda x: put_leaf(x, sharding), item)
        # a pytree of shardings matching the item structure (e.g. one per
        # element of a (tiles, valid) chunk tuple)
        return jax.tree_util.tree_map(put_leaf, item, sharding)

    yield from prefetch_iter(it, size=size, map_fn=put)


def prefetch_iter(it: Iterable, size: int = 2, map_fn=None) -> Iterator:
    """Run `it` (and optionally `map_fn` on each item) on a background
    thread, `size` items ahead of the consumer.  Host-side counterpart of
    ``prefetch_to_device`` for pipelines that manage their own device
    transfer (e.g. the heatmap serving loop, which device_puts inside
    `map_fn` so the H2D copy also overlaps compute).  Stops the worker if
    the consumer goes away early; re-raises worker errors."""

    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()
    errors = []

    def q_put(obj) -> bool:
        while not stop.is_set():
            try:
                q.put(obj, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for item in it:
                if not q_put(item if map_fn is None else map_fn(item)):
                    return
        except BaseException as e:
            errors.append(e)
        finally:
            q_put(_END)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                break
            yield item
    finally:
        stop.set()
        t.join(timeout=10.0)
    if errors:
        raise errors[0]


def balanced_batch_iterator(
    ds,
    batch_size: int,
    seed: int = 0,
) -> Iterator:
    """Pool-balanced batches with the reference's Camelyon16 dual-loader
    semantics: `batch_size` samples from EACH of two pools per step, so each
    yielded batch has `2 * batch_size` rows, concatenated and shuffled.  The
    reference zips a tumor loader and a normal loader each of batch_size and
    concatenates (eval_Camelyon_SSL.py:281-291 loader construction, :50-75
    concat + torch.randperm shuffle).  Epoch length = the smaller pool's
    batch count (zip of two drop_last loaders).

    The pool key is `datasets.grouping_key(ds)` — the SOURCE DIRECTORY when
    the dataset records two of them (the reference's loaders are per patch
    dir, so annotation-boundary patches ride in their dir's pool), else the
    polygon label.  Yielded labels are always the polygon labels.

    `ds` is an ArrayDataset or LazyImageDataset (datasets.py) — lazy
    datasets decode each batch's pixels on demand, so reference-scale patch
    sets never fully materialize in host RAM."""
    from ssl_cr_histo_tpu.data.datasets import grouping_key

    rng = np.random.default_rng(seed)
    labels = ds.labels
    key = grouping_key(ds)
    classes = np.unique(key)
    if len(classes) != 2:
        raise ValueError(
            "balanced_batch_iterator expects two pools (binary labels or "
            "two source dirs)"
        )
    idx_a = rng.permutation(np.where(key == classes[0])[0])
    idx_b = rng.permutation(np.where(key == classes[1])[0])
    n_batches = min(len(idx_a), len(idx_b)) // batch_size
    gather = ds.decode if hasattr(ds, "decode") else (lambda sel: ds.images[sel])
    for i in range(n_batches):
        sel = np.concatenate(
            [idx_a[i * batch_size : (i + 1) * batch_size],
             idx_b[i * batch_size : (i + 1) * batch_size]]
        )
        rng.shuffle(sel)
        yield gather(sel), labels[sel]
