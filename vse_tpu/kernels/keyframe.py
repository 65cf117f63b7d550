"""Pallas keyframe/text-presence scanner — the VideoSubFinder replacement.

The reference shells out to a prebuilt C++/CUDA binary that scans every frame
for subtitle-like text and emits keyframe spans (reference
backend/main.py:378-505; tunables in backend/subfinder/linux/settings/
general.cfg: segment_width=8, segment_height=3, moderate_threshold=0.4,
sub_frame_length=6). SURVEY.md C4 marks this the #1 native rebuild.

TPU-native design: one fused Pallas kernel computes, per frame of a cropped
subtitle band, a 4-stat vector:

  0: edge_energy    — mean |horizontal gradient| (text = dense vertical strokes)
  1: text_cells     — fraction of segment-grid cells whose edge density
                      exceeds `moderate_threshold` (VSF's segment voting)
  2: temporal_diff  — mean |frame - prev_frame| (cut/appearance detector)
  3: mean_lum       — mean luminance (cheap scene-change corroboration)

The host `find_spans` turns the [T, 4] stat stream into keyframe spans with
VSF-like hysteresis (min span length = sub_frame_length). The heavy part —
touching every pixel of every frame — runs entirely on TPU; the span logic
touches 4 floats per frame.

A pure-jnp reference (`frame_stats_jnp`) verifies the kernel and serves as
the CPU fallback.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


@dataclass(frozen=True)
class ScanParams:
    """Scanner tunables (named after the VSF general.cfg knobs they mirror)."""

    segment_width: int = 8
    segment_height: int = 4
    moderate_threshold: float = 0.4
    # edge magnitude (in [0,1] luminance units) for a pixel to count as edge
    edge_threshold: float = 0.08
    # min text-cell fraction for a frame to count as "has text"
    text_cell_frac: float = 0.02
    # frames shorter than this are dropped (VSF sub_frame_length)
    sub_frame_length: int = 6
    # temporal diff (mean abs lum delta) that splits a span
    change_threshold: float = 0.03


def _stats_from_gray(gray: jnp.ndarray, prev: jnp.ndarray, p: ScanParams) -> jnp.ndarray:
    """Shared math for the kernel body and the jnp reference.

    gray/prev: [H, W] float32 luminance in [0, 1]. Returns [4] float32.

    The segment-grid pooling runs as two matmuls against block-indicator
    matrices (cells = Ph @ edges @ PwT): a multi-axis reshape-reduce is not
    lowerable inside a Mosaic kernel, and on the MXU the matmul form is
    faster anyway.
    """
    H, W = gray.shape
    gx = jnp.abs(gray - jnp.roll(gray, 1, axis=1))
    # zero the wrapped column
    col = jax.lax.broadcasted_iota(jnp.int32, (H, W), 1)
    gx = jnp.where(col == 0, 0.0, gx)
    edge_energy = jnp.mean(gx)
    edges = (gx > p.edge_threshold).astype(jnp.float32)
    sh, sw = p.segment_height, p.segment_width
    # Ph[r, h] = 1 if h // sh == r ; PwT[w, c] = 1 if w // sw == c
    ph = (
        jax.lax.broadcasted_iota(jnp.int32, (H // sh, H), 1) // sh
        == jax.lax.broadcasted_iota(jnp.int32, (H // sh, H), 0)
    ).astype(jnp.float32)
    pwt = (
        jax.lax.broadcasted_iota(jnp.int32, (W, W // sw), 0) // sw
        == jax.lax.broadcasted_iota(jnp.int32, (W, W // sw), 1)
    ).astype(jnp.float32)
    cells = jnp.dot(
        jnp.dot(ph, edges, preferred_element_type=jnp.float32),
        pwt,
        preferred_element_type=jnp.float32,
    )
    cell_density = cells / float(sh * sw)
    text_cells = jnp.mean((cell_density > p.moderate_threshold).astype(jnp.float32))
    temporal_diff = jnp.mean(jnp.abs(gray - prev))
    mean_lum = jnp.mean(gray)
    return jnp.stack([edge_energy, text_cells, temporal_diff, mean_lum])


def _pad_hw(x: np.ndarray, p: ScanParams) -> np.ndarray:
    """Pad H to a multiple of lcm(8, segment_height) and W to a multiple of
    lcm(128, segment_width) so tiles and segment grids both divide evenly."""
    import math

    T, H, W = x.shape
    mh = (p.segment_height * 8) // math.gcd(p.segment_height, 8)
    mw = (p.segment_width * 128) // math.gcd(p.segment_width, 128)
    ph = (-H) % mh
    pw = (-W) % mw
    if ph or pw:
        x = np.pad(x, ((0, 0), (0, ph), (0, pw)))
    return x


def frame_stats_jnp(gray_frames: jnp.ndarray, p: ScanParams = ScanParams()) -> jnp.ndarray:
    """Reference/fallback: [T, H, W] float32 in [0,1] -> [T, 4] stats."""
    prev = jnp.concatenate([gray_frames[:1], gray_frames[:-1]], axis=0)
    return jax.vmap(lambda g, q: _stats_from_gray(g, q, p))(gray_frames, prev)


def _keyframe_kernel(cur_ref, prev_ref, out_ref, *, p: ScanParams):
    gray = cur_ref[0].astype(jnp.float32)
    prev = prev_ref[0].astype(jnp.float32)
    out_ref[0, 0, :] = _stats_from_gray(gray, prev, p)


@partial(jax.jit, static_argnames=("p", "interpret"))
def frame_stats_pallas(
    gray_frames: jnp.ndarray, p: ScanParams = ScanParams(), interpret: bool = False
) -> jnp.ndarray:
    """Pallas path: [T, H, W] float32 -> [T, 4]. One grid step per frame;
    frame t and t-1 stream HBM->VMEM via the block pipeline.

    The stats row is emitted as a [T, 1, 4] block — Mosaic requires the last
    two block dims to be (8,128)-tiled or equal to the array dims; a (1, 4)
    block over a [T, 4] array satisfies neither and fails TPU lowering.

    `interpret=True` runs the kernel in the Pallas interpreter (CPU CI)."""
    T, H, W = gray_frames.shape
    prev = jnp.concatenate([gray_frames[:1], gray_frames[:-1]], axis=0)
    out = pl.pallas_call(
        partial(_keyframe_kernel, p=p),
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, 4), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((T, 1, 4), jnp.float32),
        interpret=interpret,
    )(gray_frames, prev)
    return out[:, 0, :]


def rgb_to_gray(frames_u8: jnp.ndarray) -> jnp.ndarray:
    """[.., H, W, 3] uint8 -> [.., H, W] float32 luminance in [0, 1]."""
    f = frames_u8.astype(jnp.float32) / 255.0
    return f[..., 0] * 0.299 + f[..., 1] * 0.587 + f[..., 2] * 0.114


def frame_stats(
    gray_frames: np.ndarray, p: ScanParams = ScanParams(), force_jnp: bool = False
) -> np.ndarray:
    """Dispatch: Pallas on TPU, jnp elsewhere. Input [T, H, W] float32."""
    padded = _pad_hw(np.asarray(gray_frames, np.float32), p)
    use_pallas = (not force_jnp) and jax.default_backend() == "tpu"
    fn = frame_stats_pallas if use_pallas else jax.jit(
        frame_stats_jnp, static_argnames=("p",)
    )
    return np.asarray(fn(jnp.asarray(padded), p))


@partial(jax.jit, static_argnames=("p", "use_pallas"))
def _scan_stats_u8_jit(frames_u8: jnp.ndarray, p: ScanParams, use_pallas: bool):
    import math

    gray = rgb_to_gray(frames_u8)
    T, H, W = gray.shape
    mh = (p.segment_height * 8) // math.gcd(p.segment_height, 8)
    mw = (p.segment_width * 128) // math.gcd(p.segment_width, 128)
    ph, pw = (-H) % mh, (-W) % mw
    if ph or pw:
        gray = jnp.pad(gray, ((0, 0), (0, ph), (0, pw)))
    return frame_stats_pallas(gray, p) if use_pallas else frame_stats_jnp(gray, p)


def scan_stats_u8(
    frames_u8, p: ScanParams = ScanParams(), force_jnp: bool = False
) -> np.ndarray:
    """Fused scan stage on uint8 frames: gray conversion + tile padding +
    per-frame stats in ONE compiled program. Input [T, H, W, 3] uint8 (host
    or device); only the [T, 4] stat rows come back to the host — the old
    host-side pad path transferred the full float32 gray band D2H and back
    per batch (3 band-sized copies over the link instead of 1)."""
    use_pallas = (not force_jnp) and jax.default_backend() == "tpu"
    return np.asarray(_scan_stats_u8_jit(jnp.asarray(frames_u8), p, use_pallas))


@dataclass
class Span:
    start_frame: int  # indices into the scanned (possibly strided) sequence
    end_frame: int


def find_spans(
    stats: np.ndarray,
    frame_nos: np.ndarray,
    p: ScanParams = ScanParams(),
) -> List[Span]:
    """[T, 4] stats + original frame numbers -> keyframe spans.

    A frame "has text" when its text-cell fraction exceeds `text_cell_frac`.
    A span closes when text disappears or the temporal diff spikes (subtitle
    changed within a continuous text region). Spans shorter than
    `sub_frame_length` scanned frames are dropped (VSF's sub_frame_length
    semantic, general.cfg:23).

    The spike threshold adapts to the video's baseline motion (median
    temporal diff): on noisy/busy backgrounds every frame clears a fixed
    threshold and spans shatter into sub-minimum fragments (observed: zero
    spans on a noise-textured video whose text signal was 40x background).
    """
    has_text = stats[:, 1] > p.text_cell_frac
    baseline = float(np.median(stats[:, 2])) if len(stats) else 0.0
    spike_thresh = max(p.change_threshold, 2.5 * baseline)
    diff_spike = stats[:, 2] > spike_thresh
    spans: List[Span] = []
    start = None
    for t in range(len(stats)):
        if has_text[t]:
            if start is None:
                start = t
            elif diff_spike[t]:
                if t - start >= p.sub_frame_length:
                    spans.append(Span(int(frame_nos[start]), int(frame_nos[t - 1])))
                start = t
        else:
            if start is not None:
                if t - start >= p.sub_frame_length:
                    spans.append(Span(int(frame_nos[start]), int(frame_nos[t - 1])))
                start = None
    if start is not None and len(stats) - start >= p.sub_frame_length:
        spans.append(Span(int(frame_nos[start]), int(frame_nos[len(stats) - 1])))
    return spans
