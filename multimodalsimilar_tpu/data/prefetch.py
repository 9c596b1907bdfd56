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

    Yields device-resident, batch-sharded pytrees. If the consumer abandons
    the generator early (an exception inside the training loop, a break),
    the producer thread is signalled to stop and the queue drained —
    otherwise it would block forever on a full queue, pinning buffered
    device batches in HBM for the life of the process.
    """
    q: "queue.Queue" = queue.Queue(maxsize=buffer_size)
    stop = threading.Event()
    _END = object()
    err: list = []

    def producer():
        try:
            for batch in batch_iter:
                if stop.is_set():
                    return
                item = shard_batch(mesh, batch)
                while not stop.is_set():
                    try:
                        q.put(item, timeout=0.2)
                        break
                    except queue.Full:
                        continue
                if stop.is_set():
                    return
        except Exception as e:  # surface in consumer
            err.append(e)
        finally:
            # deliver _END reliably: the queue may be full right now (the
            # consumer is still draining buffered batches) — keep trying
            # until it fits, giving up only if the consumer abandoned us
            while not stop.is_set():
                try:
                    q.put(_END, timeout=0.2)
                    break
                except queue.Full:
                    continue

    t = threading.Thread(target=producer, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is _END:
                if err:
                    raise err[0]
                return
            yield item
    finally:
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
