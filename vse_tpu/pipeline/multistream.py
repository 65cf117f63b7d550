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
    streams: Sequence[FrameStream], batch_size: int,
    crop: Optional[Tuple[int, int]] = None,
) -> Iterator[TaggedBatch]:
    """Round-robin frames from several streams into shared batches.

    Streams must share a frame geometry. Exhausted streams drop out; the
    final partial batch is padded. `crop=(y0, y1)`: keep only those frame
    rows (the shared subtitle band — host->device bytes discipline; callers
    pass origin=(y0, 0) to the engine)."""
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
            frames = b.frames if crop is None else b.frames[:, crop[0]:crop[1]]
            for k in range(n):
                pending.append((vid, frames[k], int(b.frame_nos[k])))
            if shape is None and n:
                shape = frames[0].shape
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


def extract_many(
    video_paths: Sequence[str],
    sub_areas: Optional[Sequence] = None,
    config: Optional[VseConfig] = None,
    engine: Optional[OcrEngine] = None,
    output_paths: Optional[Sequence[str]] = None,
) -> Dict[str, str]:
    """Full multi-video extraction with continuous batching in EVERY mode
    (the reference runs one subprocess per video, strictly sequentially —
    reference ui/home_interface.py:320-393; BASELINE config #5 wants shared
    batches). Returns {video_path: srt_path}.

    - fps mode: frames of all same-geometry videos interleave into shared
      device batches.
    - accurate mode: same interleaving; per-video DetSpanTracker state
      machines consume the per-frame results (order only matters per video).
    - fast/auto (keyframe) mode: the cheap scan pass runs per video; the
      expensive OCR pass shares batches across ALL videos' span frames.
    """
    from vse_tpu.core.config import Mode
    from vse_tpu.pipeline.extractor import DetSpanTracker, SubtitleExtractor

    config = config or VseConfig()
    n = len(video_paths)
    sub_areas = list(sub_areas) if sub_areas is not None else [None] * n
    extractors = []
    for i, p in enumerate(video_paths):
        ex = SubtitleExtractor(p, sub_area=sub_areas[i], config=config,
                               engine=engine)
        if engine is None:
            engine = ex.engine  # share ONE engine across the queue
        else:
            ex._engine = engine
        if output_paths is not None:
            ex.subtitle_output_path = output_paths[i]
        extractors.append(ex)

    mode = config.mode
    use_keyframe = mode != Mode.ACCURATE and all(
        a is not None for a in sub_areas
    )
    if mode == Mode.ACCURATE and all(a is not None for a in sub_areas):
        _many_accurate(extractors, engine, config)
    elif use_keyframe:
        _many_keyframe(extractors, engine, config)
    else:
        _many_fps(extractors, engine, config)

    out = {}
    for ex in extractors:
        if ex.sub_area is None:
            # same interactive-filter path as SubtitleExtractor.run()
            # (reference main.py:158-171): without the user area the batch
            # API must emit the same filtered SRT as a per-video run
            from vse_tpu.post.filters import (
                always_yes,
                filter_scene_text,
                filter_watermark,
            )

            ex.raw_records = filter_watermark(
                ex.raw_records,
                watermark_area_num=config.watermark_area_num,
                tolerant_pixel_x=config.tolerant_pixel_x,
                tolerant_pixel_y=config.tolerant_pixel_y,
                confirm=ex.confirm,
            )
            ex.raw_records = filter_scene_text(
                ex.raw_records,
                subtitle_area_deviation_pixel=config.subtitle_area_deviation_pixel,
                confirm=ex.confirm or always_yes,
            )
        ex.generate_subtitle_file()
        if config.word_segmentation:
            from vse_tpu.post.reformat import execute as reformat_execute

            reformat_execute(ex.subtitle_output_path, config.language)
        ex.update_progress(100, 100)
        out[ex.video_path] = ex.subtitle_output_path
    return out


def _geometry_groups(extractors):
    """Group by (H, W, upload_band): only videos sharing a geometry AND the
    same subtitle band can share compiled batches (band uploads keep the
    per-video byte discipline in the batch API too)."""
    groups: Dict[Tuple, List[int]] = defaultdict(list)
    for i, ex in enumerate(extractors):
        groups[(ex.frame_height, ex.frame_width, ex.upload_band())].append(i)
    return groups


def _many_fps(extractors, engine: OcrEngine, config: VseConfig) -> None:
    for (h, w, band), ids in _geometry_groups(extractors).items():
        origin = (band[0], 0) if band is not None else (0, 0)
        streams = []
        for i in ids:
            ex = extractors[i]
            stride = max(1, int(ex.fps // config.extract_frequency))
            streams.append(FrameStream(ex.video_path,
                                       batch_size=config.frame_batch,
                                       stride=stride))
        for batch in interleave_streams(streams, config.frame_batch,
                                        crop=band):
            # feed the full padded batch (TaggedBatch is already
            # batch_size-shaped): slicing to the valid count would mint a
            # fresh XLA shape bucket per distinct tail length (~30 s each
            # through the remote-compile tunnel); padded rows are black
            # frames that produce no boxes
            nv = int(batch.valid.sum())
            results = engine.predict_batch(batch.frames, origin=origin)
            for k in range(nv):
                ex = extractors[ids[int(batch.video_ids[k])]]
                ex._gate_and_record(int(batch.frame_nos[k]), *results[k])
        for i, s in zip(ids, streams):
            extractors[i]._frame_to_ms.update(s.frame_to_ms)


def _many_accurate(extractors, engine: OcrEngine, config: VseConfig) -> None:
    from vse_tpu.pipeline.extractor import DetSpanTracker

    for (h, w, band), ids in _geometry_groups(extractors).items():
        origin = (band[0], 0) if band is not None else (0, 0)
        streams = [
            FrameStream(extractors[i].video_path,
                        batch_size=config.frame_batch, stride=1)
            for i in ids
        ]
        trackers = {i: DetSpanTracker(extractors[i]) for i in ids}
        for batch in interleave_streams(streams, config.frame_batch,
                                        crop=band):
            nv = int(batch.valid.sum())  # full padded batch: one bucket
            results = engine.predict_batch(batch.frames, origin=origin)
            for k in range(nv):
                vid = ids[int(batch.video_ids[k])]
                trackers[vid].feed(int(batch.frame_nos[k]), *results[k])
        for i, s in zip(ids, streams):
            trackers[i].finish()
            extractors[i]._frame_to_ms.update(s.frame_to_ms)


def _shift_quads(dt_box: list, dy: int) -> list:
    return [[(x, y + dy) for (x, y) in quad] for quad in dt_box]


def _many_keyframe(extractors, engine: OcrEngine, config: VseConfig) -> None:
    from vse_tpu.video.decode import read_frames

    # pass 1 per video (cheap stats kernel); pass 2 pooled across videos,
    # band-cropped per extractor (boxes shifted back by the per-item band
    # offset — items with different bands can still share a compiled bucket
    # as long as the cropped shapes match); pass 3 per video: span
    # refinement by text change (extractor.refine_keyframe_spans)
    todo = []  # (ex_idx, band-cropped frame, dy, span_idx, frame_no)
    spans_by_ex: Dict[int, list] = {}
    for xi, ex in enumerate(extractors):
        spans = ex.scan_keyframe_spans()
        spans_by_ex[xi] = spans
        wanted, metas = ex.keyframe_sample_targets(spans)
        decoded = read_frames(ex.video_path, wanted)
        band = ex.upload_band()
        y0 = band[0] if band is not None else 0
        for f, (si, fn) in zip(decoded, metas):
            if f is not None:
                fc = f if band is None else f[band[0]:band[1]]
                todo.append((xi, fc, y0, si, fn))
    # group by cropped geometry so shapes share compiled buckets
    by_shape: Dict[Tuple[int, int], List[int]] = defaultdict(list)
    for idx, (_, fc, _, _, _) in enumerate(todo):
        by_shape[fc.shape[:2]].append(idx)
    B = config.frame_batch
    samples_by_ex: Dict[int, list] = defaultdict(list)
    for idxs in by_shape.values():
        for i in range(0, len(idxs), B):
            chunk_ids = idxs[i : i + B]
            chunk = np.stack([todo[j][1] for j in chunk_ids])
            if len(chunk_ids) < B:
                # pad the tail chunk to the compiled bucket (see _many_fps)
                pad = np.zeros((B - len(chunk_ids),) + chunk.shape[1:],
                               chunk.dtype)
                chunk = np.concatenate([chunk, pad])
            results = engine.predict_batch(chunk)
            for j, (dt_box, rec_res) in zip(chunk_ids, results):
                xi, _fc, dy, si, fn = todo[j]
                samples_by_ex[xi].append(
                    (si, fn, _shift_quads(dt_box, dy), rec_res, None)
                )
    for xi, ex in enumerate(extractors):
        samples = sorted(samples_by_ex.get(xi, []), key=lambda s: (s[0], s[1]))
        ex.refine_keyframe_spans(spans_by_ex[xi], samples)


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
            n_valid = int(batch.valid.sum())  # full padded batch: one bucket
            results = engine.predict_batch(batch.frames)
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
