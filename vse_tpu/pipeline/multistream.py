"""Continuous multi-video batching.

The reference processes a task queue strictly one video at a time, one
subprocess per video (reference ui/home_interface.py:320-393; SURVEY.md P5).
On TPU, per-video batches under-fill the device between videos; this module
interleaves frames from several videos into shared fixed-size device batches
(BASELINE.json config #5 "4K multi-video streaming: fused
decode→detect→recognize with continuous frame batching") and demultiplexes
OCR results back per video.

Only same-resolution videos share a compiled bucket; the scheduler groups by
(H, W) and runs groups concurrently against one engine.
"""

from __future__ import annotations

import threading
from collections import defaultdict
from dataclasses import dataclass, field
from typing import Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np

from vse_tpu.core.config import VseConfig
from vse_tpu.pipeline.ocr_engine import OcrEngine
from vse_tpu.video.decode import FrameStream, probe


@dataclass
class TaggedBatch:
    frames: np.ndarray  # [B, H, W, 3]
    video_ids: np.ndarray  # [B] int
    frame_nos: np.ndarray  # [B]
    valid: np.ndarray  # [B] bool


def interleave_streams(
    streams: Sequence[FrameStream], batch_size: int
) -> Iterator[TaggedBatch]:
    """Round-robin frames from several streams into shared batches.

    Streams must share a frame geometry. Exhausted streams drop out; the
    final partial batch is padded."""
    iters: List[Tuple[int, Iterator]] = [(i, iter(s)) for i, s in enumerate(streams)]
    # per-stream leftover frames (from that stream's own batching)
    pending: List[Tuple[int, np.ndarray, int]] = []
    shape = None

    def refill():
        nonlocal shape
        alive = []
        for vid, it in iters:
            try:
                b = next(it)
            except StopIteration:
                continue
            alive.append((vid, it))
            n = int(b.valid.sum())
            for k in range(n):
                pending.append((vid, b.frames[k], int(b.frame_nos[k])))
            if shape is None and n:
                shape = b.frames[0].shape
        iters[:] = alive

    while True:
        while iters and len(pending) < batch_size:
            refill()
        if not pending:
            return
        take, rest = pending[:batch_size], pending[batch_size:]
        pending[:] = rest
        if shape is None:
            shape = take[0][1].shape
        frames = np.zeros((batch_size,) + tuple(shape), np.uint8)
        vids = np.full((batch_size,), -1, np.int64)
        nos = np.zeros((batch_size,), np.int64)
        valid = np.zeros((batch_size,), bool)
        for i, (vid, f, no) in enumerate(take):
            frames[i] = f
            vids[i] = vid
            nos[i] = no
            valid[i] = True
        yield TaggedBatch(frames, vids, nos, valid)


def extract_many_fps(
    video_paths: Sequence[str],
    engine: OcrEngine,
    config: Optional[VseConfig] = None,
    on_result=None,
) -> Dict[str, List[Tuple[int, list, list]]]:
    """OCR several videos through shared batches (fps sampling).

    Returns {video_path: [(frame_no, dt_box, rec_res), ...]}. `on_result`
    (video_id, frame_no, dt_box, rec_res) streams results as they land."""
    config = config or VseConfig()
    groups: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    metas = [probe(p) for p in video_paths]
    for i, m in enumerate(metas):
        groups[(m.height, m.width)].append(i)
    out: Dict[str, List] = {p: [] for p in video_paths}
    for (h, w), vid_ids in groups.items():
        streams = []
        for vid in vid_ids:
            m = metas[vid]
            stride = max(1, int(m.fps // config.extract_frequency))
            streams.append(
                FrameStream(video_paths[vid], batch_size=config.frame_batch,
                            stride=stride)
            )
        for batch in interleave_streams(streams, config.frame_batch):
            n_valid = int(batch.valid.sum())
            results = engine.predict_batch(batch.frames[:n_valid])
            for i in range(n_valid):
                vid = vid_ids[int(batch.video_ids[i])]
                dt_box, rec_res = results[i]
                out[video_paths[vid]].append(
                    (int(batch.frame_nos[i]), dt_box, rec_res)
                )
                if on_result:
                    on_result(vid, int(batch.frame_nos[i]), dt_box, rec_res)
    for records in out.values():
        records.sort(key=lambda r: r[0])
    return out
