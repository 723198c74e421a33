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
    q: "queue.Queue" = queue.Queue(maxsize=size)
    _END = object()

    def worker() -> None:
        try:
            for item in iterator:
                q.put(transform(item) if transform is not None else item)
            q.put(_END)
        except BaseException as e:  # propagate into the consuming thread
            q.put(e)

    t = threading.Thread(target=worker, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            return
        if isinstance(item, BaseException):
            raise item
        yield item
