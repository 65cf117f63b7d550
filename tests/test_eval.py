import pytest

from vse_tpu.eval import evaluate_srt, normalize_text, time_iou
from vse_tpu.post.srt import SrtFile, SrtItem


def S(items):
    return SrtFile([SrtItem(i + 1, s, e, t) for i, (s, e, t) in enumerate(items)])


def test_perfect_match():
    ref = S([(0, 1000, "hello"), (2000, 3000, "world")])
    r = evaluate_srt(ref, ref)
    assert r.f1 == 1.0
    assert r.cer == 0.0


def test_missing_cue_lowers_recall():
    ref = S([(0, 1000, "hello"), (2000, 3000, "world")])
    pred = S([(0, 1000, "hello")])
    r = evaluate_srt(pred, ref)
    assert r.precision == 1.0
    assert r.recall == 0.5
    assert r.cer == pytest.approx(5 / 10)  # "world" fully deleted


def test_typo_within_sim_threshold_counts_tp_but_cer():
    ref = S([(0, 1000, "hello world")])
    pred = S([(0, 1000, "hello w0rld")])
    r = evaluate_srt(pred, ref)
    assert r.f1 == 1.0
    assert 0 < r.cer < 0.2


def test_time_shifted_beyond_iou_no_match():
    ref = S([(0, 1000, "hello")])
    pred = S([(5000, 6000, "hello")])
    r = evaluate_srt(pred, ref)
    assert r.f1 == 0.0


def test_normalize_text():
    assert normalize_text("  Ｈello　 World ") == "hello world"


def test_time_iou():
    assert time_iou(0, 10, 0, 10) == 1.0
    assert time_iou(0, 10, 5, 15) == pytest.approx(5 / 15)
    assert time_iou(0, 10, 20, 30) == 0.0
