"""Background batch prefetching.

The reference's CustomDatasetDataLoader exposes torch DataLoader workers
but defaults to 0 (synchronous; base_options_audio2feature.py:38).  Here a
thread pipelines host-side sampling + host->device transfer behind device
compute: while the train step runs on the TPU, the next batch is already
being assembled and shipped.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional


def prefetch(iterator: Iterator[Any], size: int = 2,
             transform: Optional[Callable[[Any], Any]] = None) -> Iterator[Any]:
    """Wrap an iterator with a `size`-deep background prefetch queue.

    transform runs in the worker thread (use it for jax.device_put /
    mesh.shard_batch so the transfer overlaps compute).  Exceptions in the
    worker propagate to the consumer.
    """
    if size < 1:
        raise ValueError("prefetch size must be >= 1 (0 would make the "
                         "queue UNBOUNDED, eagerly materialising the whole "
                         "epoch on device; callers wanting synchronous "
                         "iteration should not wrap at all)")
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer is gone: a consumer
        # abandoning the generator mid-epoch (step raised, Ctrl-C) must
        # not leave the worker blocked forever holding device-resident
        # batches in HBM
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker() -> None:
        try:
            for item in iterator:
                if stop.is_set():
                    return
                if not _put(transform(item) if transform is not None else item):
                    return
            _put(_END)
        except BaseException as e:  # propagate into the consuming thread
            _put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()  # releases a worker blocked on a full queue
