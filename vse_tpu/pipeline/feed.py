"""Host->device feed: overlap frame-batch uploads with OCR compute.

The reference pipelines decode against OCR with a child process and a
bounded queue (reference backend/tools/subtitle_ocr.py:211-240, queue(20)).
The TPU equivalent is a device-put prefetcher: a feeder thread uploads
batch i+1 while the device OCRs batch i, so the engine never waits on PCIe
(or, in this dev harness, the remote-TPU tunnel — measured 100-200 MB/s,
which otherwise dominates the 1080p hot loop).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Optional, Tuple

import jax

from vse_tpu.video.decode import FrameBatch


def device_prefetch(
    batches: Iterable[FrameBatch],
    depth: int = 2,
    sharding=None,
) -> Iterator[Tuple[FrameBatch, jax.Array]]:
    """Yield (host_batch, device_frames) with uploads running `depth` ahead.

    Upload happens on a feeder thread; `jax.device_put` dispatches are
    async, so the consumer blocks only when compute outruns the uploads.
    `sharding`: optional jax sharding for multi-chip data-parallel feeds.
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []

    def feeder():
        try:
            for b in batches:
                dev = jax.device_put(
                    b.frames, sharding if sharding is not None else None
                )
                q.put((b, dev))
        except Exception as e:  # surface decode/upload errors to the consumer
            err.append(e)
        finally:
            q.put(None)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    while True:
        item = q.get()
        if item is None:
            break
        yield item
    t.join()
    if err:
        raise err[0]
