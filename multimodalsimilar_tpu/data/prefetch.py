"""Host->device prefetching.

The reference feeds the GPU through torch DataLoader workers; the TPU
equivalent is a small producer thread that tokenizes/decodes the *next*
batches while the device runs the current step, plus early `device_put` with
the batch sharding so the transfer overlaps compute (async dispatch). This is
the single host->device boundary of every job (SURVEY.md §3.1 step
'batch -> device').
"""

from __future__ import annotations

import queue
import threading
from typing import Iterator

from multimodalsimilar_tpu.parallel.mesh import shard_batch


def prefetch_to_device(batch_iter: Iterator, mesh, buffer_size: int = 2
                       ) -> Iterator:
    """Wrap a host batch iterator: background-produce + device_put ahead.

    Yields device-resident, batch-sharded pytrees.
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    _END = object()
    err: list = []

    def producer():
        try:
            for batch in batch_iter:
                q.put(shard_batch(mesh, batch))
        except Exception as e:  # surface in consumer
            err.append(e)
        finally:
            q.put(_END)

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is _END:
            if err:
                raise err[0]
            return
        yield item
