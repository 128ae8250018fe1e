"""Host->device input pipeline: prefetch, background IO, epoch streams.

The reference feeds Keras ``fit`` from in-memory NumPy arrays only
(vaemolsim has no input pipeline at all).  For production-scale
training/serving on TPU the host side must hide two latencies:

- **transfer**: ``jax.device_put`` of the *next* batch must overlap the
  device computing the *current* one (JAX dispatch is async, so simply
  issuing the put ahead of use is enough — no threads needed);
- **read/decode**: pulling frames off disk (e.g. the native DCD reader)
  must overlap both, which does need a background thread.

:func:`prefetch_to_device` handles the first, :class:`BackgroundReader`
the second, and :func:`epoch_stream` composes them with shuffled
minibatching over an out-of-core frame source.  All utilities are
framework-agnostic iterators — they feed ``train.fit``'s host-driven
path, custom loops, or batch inference equally.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import jax
import numpy as np

__all__ = ["prefetch_to_device", "BackgroundReader", "epoch_stream"]


def prefetch_to_device(it: Iterator[Any], size: int = 2,
                       sharding=None) -> Iterator[Any]:
    """Yield items from ``it`` with ``size`` batches already placed on
    device ahead of consumption (double buffering at the default 2).

    Each item may be an array or a pytree of arrays.  With ``sharding``
    (a ``jax.sharding.Sharding`` or a pytree of them matching the item
    structure), leaves are placed with it — e.g. a batch-axis
    NamedSharding for data-parallel training; otherwise the default
    device placement applies.  Placement is issued eagerly but JAX
    dispatch is asynchronous, so the host returns immediately and the
    copies overlap device compute.
    """
    if size < 1:
        raise ValueError(f"size must be >= 1, got {size}")

    def put(x):
        if sharding is None:
            return jax.tree_util.tree_map(jax.device_put, x)
        return jax.device_put(x, sharding)

    buf = []
    for item in it:
        buf.append(put(item))
        if len(buf) > size:
            yield buf.pop(0)
    while buf:
        yield buf.pop(0)


class BackgroundReader:
    """Run a blocking reader callable in a daemon thread, buffering up
    to ``capacity`` items — overlaps disk IO/decode with host and device
    work.  Iterate to consume; raises the producer's exception at the
    consumption point; ``close()`` (or garbage collection) stops the
    thread.

    >>> reader = DCDReader("traj.dcd")
    >>> bg = BackgroundReader(lambda: reader.iter_batches(512))
    >>> for batch in prefetch_to_device(bg):
    ...     step(batch)
    """

    _DONE = object()

    def __init__(self, make_iter: Callable[[], Iterator[Any]],
                 capacity: int = 4):
        self._q: "queue.Queue" = queue.Queue(maxsize=capacity)
        self._stop = threading.Event()
        self._exc: Optional[BaseException] = None

        def work():
            try:
                for item in make_iter():
                    while not self._stop.is_set():
                        try:
                            self._q.put(item, timeout=0.1)
                            break
                        except queue.Full:
                            continue
                    if self._stop.is_set():
                        return
            except BaseException as e:  # surfaced on the consumer side
                self._exc = e
            finally:
                while not self._stop.is_set():
                    try:
                        self._q.put(self._DONE, timeout=0.1)
                        break
                    except queue.Full:
                        continue

        self._thread = threading.Thread(target=work, daemon=True)
        self._thread.start()

    def __iter__(self):
        while True:
            try:
                # Timed get so a close() with no sentinel in flight (the
                # producer exits without enqueueing once stopped) cannot
                # strand a blocked consumer.
                item = self._q.get(timeout=0.1)
            except queue.Empty:
                if self._stop.is_set():
                    return
                continue
            if item is self._DONE:
                if self._exc is not None:
                    raise self._exc
                return
            yield item

    def close(self):
        self._stop.set()

    def __del__(self):  # pragma: no cover - GC timing
        try:
            self.close()
        except Exception:
            pass


def epoch_stream(read_fn: Callable[[int, int], Any], n_samples: int,
                 batch_size: int, *, key=None,
                 drop_remainder: bool = True,
                 io_chunk: Optional[int] = None,
                 prefetch: int = 2, sharding=None) -> Iterator[Any]:
    """One shuffled epoch of device-resident batches from an out-of-core
    source, with background IO and device prefetch composed.

    ``read_fn(start, count)`` returns ``count`` consecutive samples
    starting at ``start`` (e.g. ``lambda s, c: DCDReader(p).read(s, c)[0]``).
    Shuffling is chunk-wise to keep reads sequential: the epoch is cut
    into ``io_chunk``-sized runs (default ``8 * batch_size``) whose
    ORDER is shuffled with ``key``, and samples shuffle within each
    chunk — out-of-core shuffling with bounded memory.  Pass ``key=None``
    for sequential order (inference/serving).
    """
    io_chunk = io_chunk or 8 * batch_size
    io_chunk = max(io_chunk // batch_size, 1) * batch_size
    starts = np.arange(0, n_samples, io_chunk)
    rng = None
    if key is not None:
        if isinstance(key, (int, np.integer)):
            seed: Any = int(key)
        else:  # JAX PRNG key (typed or raw uint32)
            try:
                data = jax.random.key_data(key)
            except Exception:
                data = key
            seed = np.asarray(data).ravel().tolist()
        rng = np.random.default_rng(seed)
        rng.shuffle(starts)

    def batches():
        for start in starts:
            chunk = read_fn(int(start), int(min(io_chunk,
                                                n_samples - start)))
            leaves = jax.tree_util.tree_leaves(chunk)
            n = leaves[0].shape[0]
            order = rng.permutation(n) if rng is not None else np.arange(n)
            for b in range(0, n, batch_size):
                idx = order[b:b + batch_size]
                if len(idx) < batch_size and drop_remainder:
                    continue
                yield jax.tree_util.tree_map(lambda a: a[idx], chunk)

    bg = BackgroundReader(batches)
    try:
        yield from prefetch_to_device(iter(bg), size=prefetch,
                                      sharding=sharding)
    finally:
        bg.close()
