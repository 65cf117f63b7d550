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


# ---- eval_golden partial-run merge (ADVICE r4 #1/#3): a subset run must
# refresh only the sections it computed, never clobber prior rows ----

def _run_golden_main(monkeypatch, tmp_path, argv, stage_rows):
    import importlib
    import sys as _sys

    _sys.path.insert(0, "tools")
    eg = importlib.import_module("eval_golden")

    def fake_drive(stage, args, notes):
        return stage_rows.get(stage)

    monkeypatch.setattr(eg, "drive_stage", fake_drive)
    monkeypatch.setattr(
        _sys, "argv",
        ["eval_golden.py", "--out", str(tmp_path / "EVAL.json"),
         "--workdir", str(tmp_path)] + argv)
    eg.main()
    import json
    with open(tmp_path / "EVAL.json", encoding="utf-8") as f:
        return json.load(f)


def _prior_report(tmp_path, langs=("ru", "ka"), modes=("fast", "accurate")):
    import json
    prior = {
        "written_by": "tools/eval_golden.py",
        "corpus": [], "script_lines": 0,
        "modes": [{"mode": m, "f1": 0.9} for m in modes],
        "keyframe_vs_accurate": {"scanner_recall": 1.0, "per_video": []},
        "language_variants": [{"language": la, "f1": 0.8} for la in langs],
        "notes": ["prior note"],
    }
    with open(tmp_path / "EVAL.json", "w", encoding="utf-8") as f:
        json.dump(prior, f)


def test_eval_golden_lang_subset_merges_per_language(monkeypatch, tmp_path):
    _prior_report(tmp_path)
    rep = _run_golden_main(
        monkeypatch, tmp_path,
        ["--modes", "--lang-variants", "ru", "el"],
        {"lang_ru": {"language": "ru", "f1": 0.95},
         "lang_el": {"language": "el", "f1": 0.91}})
    rows = {r["language"]: r for r in rep["language_variants"]}
    assert rows["ru"]["f1"] == 0.95          # refreshed
    assert rows["el"]["f1"] == 0.91          # added
    assert rows["ka"]["f1"] == 0.8           # carried forward, not deleted
    assert [r["mode"] for r in rep["modes"]] == ["fast", "accurate"]
    assert rep["keyframe_vs_accurate"]["scanner_recall"] == 1.0
    assert "prior note" in rep["notes"]


def test_eval_golden_mode_subset_merges_per_mode(monkeypatch, tmp_path):
    _prior_report(tmp_path)
    rep = _run_golden_main(
        monkeypatch, tmp_path, ["--modes", "fast"],
        {"mode_fast": {"mode": "fast", "f1": 0.99}})
    rows = {r["mode"]: r for r in rep["modes"]}
    assert rows["fast"]["f1"] == 0.99        # refreshed
    assert rows["accurate"]["f1"] == 0.9     # carried forward
    # keyframe_vs_accurate can't be recomputed from a fast-only run
    assert rep["keyframe_vs_accurate"]["scanner_recall"] == 1.0
    # prior language rows untouched
    assert {r["language"] for r in rep["language_variants"]} == {"ru", "ka"}


def test_eval_golden_failed_lang_stage_notes_drop(monkeypatch, tmp_path):
    _prior_report(tmp_path)
    rep = _run_golden_main(
        monkeypatch, tmp_path, ["--modes", "--lang-variants", "ru"],
        {"lang_ru": None})
    assert all(r["language"] != "ru" for r in rep["language_variants"])
    assert any("lang_ru" in n for n in rep["notes"])
