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
    transform=None,
) -> Iterator[Tuple[FrameBatch, jax.Array]]:
    """Yield (host_batch, device_frames) with uploads running `depth` ahead.

    Upload happens on a feeder thread; `jax.device_put` dispatches are
    async, so the consumer blocks only when compute outruns the uploads.
    `sharding`: optional jax sharding for multi-chip data-parallel feeds.
    `transform`: optional host-side fn(frames_u8) applied before upload —
    the band-crop hook that keeps avoidable bytes off the host->device link
    (a 1080p frame is 6.2 MB; the subtitle band is ~1.3 MB).
    """
    q: "queue.Queue" = queue.Queue(maxsize=depth)
    err: list = []
    stop = threading.Event()

    def _put(item) -> bool:
        # bounded put that gives up when the consumer is gone — otherwise an
        # early consumer exit (e.g. ExtractionCancelled between batches)
        # leaves the feeder blocked on a full queue forever, leaking the
        # FrameStream/VideoCapture and a thread per cancelled extraction
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def feeder():
        it = iter(batches)
        try:
            for b in it:
                if stop.is_set():
                    break
                frames = b.frames if transform is None else transform(b.frames)
                dev = jax.device_put(
                    frames, sharding if sharding is not None else None
                )
                if not _put((b, dev)):
                    break
        except Exception as e:  # surface decode/upload errors to the consumer
            err.append(e)
        finally:
            close = getattr(it, "close", None)
            if close is not None:
                close()  # release the decode generator's VideoCapture
            _put(None)

    t = threading.Thread(target=feeder, daemon=True)
    t.start()
    try:
        while True:
            item = q.get()
            if item is None:
                break
            yield item
    finally:
        stop.set()
        t.join(timeout=10)
    if err:
        raise err[0]
