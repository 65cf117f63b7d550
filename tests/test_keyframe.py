import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vse_tpu.kernels.keyframe import (
    ScanParams,
    Span,
    find_spans,
    frame_stats,
    frame_stats_jnp,
    frame_stats_pallas,
    rgb_to_gray,
)


def synth_frames(T=24, H=32, W=256, text_frames=None, seed=0):
    """Frames with a high-contrast striped 'text' block in the middle ones."""
    if text_frames is None:
        text_frames = range(6, 18)
    text_frames = [t for t in text_frames if t < T]
    rng = np.random.default_rng(seed)
    frames = np.full((T, H, W), 0.2, np.float32)
    frames += rng.normal(0, 0.005, size=frames.shape).astype(np.float32)
    for t in text_frames:
        # vertical stripes = strong horizontal gradients, like glyph strokes
        frames[t, 8:24, 32:224:4] = 1.0
    return np.clip(frames, 0, 1)


def test_stats_detect_text_frames():
    frames = synth_frames()
    stats = frame_stats(frames, force_jnp=True)
    p = ScanParams()
    text = stats[:, 1] > p.text_cell_frac
    assert text[6:18].all()
    assert not text[:6].any()
    assert not text[18:].any()


def test_temporal_diff_spikes_on_change():
    frames = synth_frames()
    stats = frame_stats(frames, force_jnp=True)
    # appearance at frame 6 produces a diff spike
    assert stats[6, 2] > stats[5, 2] * 5


def test_find_spans_basic():
    frames = synth_frames()
    stats = frame_stats(frames, force_jnp=True)
    spans = find_spans(stats, np.arange(len(frames)), ScanParams())
    assert len(spans) == 1
    assert spans[0].start_frame == 6
    assert spans[0].end_frame == 17


def test_find_spans_split_on_subtitle_change():
    frames = synth_frames(T=40, text_frames=range(6, 34))
    # change the "text" at frame 20: shift stripes
    frames[20:34, 8:24, :] = 0.2
    frames[20:34, 8:24, 34:226:4] = 1.0
    stats = frame_stats(frames, force_jnp=True)
    spans = find_spans(stats, np.arange(len(frames)), ScanParams())
    assert len(spans) == 2
    assert spans[0].start_frame == 6
    assert spans[1].end_frame == 33


def test_short_spans_dropped():
    frames = synth_frames(T=24, text_frames=range(6, 9))  # 3 frames < 6
    stats = frame_stats(frames, force_jnp=True)
    spans = find_spans(stats, np.arange(len(frames)), ScanParams())
    assert spans == []


def test_pallas_interpret_matches_jnp():
    frames = synth_frames(T=4, H=32, W=256)
    p = ScanParams()
    ref = np.asarray(frame_stats_jnp(jnp.asarray(frames), p))
    # interpret mode runs the production pallas_call wiring on CPU
    out = frame_stats_pallas(jnp.asarray(frames), p, interpret=True)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-6)


def test_rgb_to_gray():
    rgb = np.zeros((1, 2, 2, 3), np.uint8)
    rgb[..., 1] = 255  # pure green
    g = np.asarray(rgb_to_gray(jnp.asarray(rgb)))
    assert g[0, 0, 0] == pytest.approx(0.587, abs=1e-3)
