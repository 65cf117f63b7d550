"""Cross-script homoglyph folding tests (vse_tpu/post/homoglyph.py).

The bilingual cyrillic/greek heads cannot distinguish DejaVu pixel-
identical twins (а/a, е/e, р/p …) — the decode post-pass folds them
toward the per-line majority script (see EVAL lang_ru: unfolded output
scored CER 0.38 on visually-perfect text)."""

from vse_tpu.post.homoglyph import normalize_script


def test_cyrillic_majority_folds_latin_twins():
    assert normalize_script("пpивeт миp", "cyrillic") == "привет мир"
    assert normalize_script("вeчep был тихим", "cyrillic") == \
        "вечер был тихим"


def test_latin_majority_folds_cyrillic_twins():
    assert normalize_script("hello wоrld", "cyrillic") == "hello world"


def test_greek_folding():
    assert normalize_script("το βραδυ ηταv ησυχo", "el") == \
        "το βραδυ ηταν ησυχο"
    assert normalize_script("OPEN THE DOOR", "el") == "OPEN THE DOOR"


def test_digit_guard():
    # digit twins fold only when the line has no real digit context
    assert normalize_script("3везда", "cyrillic") == "Звезда"
    assert normalize_script("в 3:16 утра", "cyrillic") == "в 3:16 утра"


def test_other_families_pass_through():
    assert normalize_script("пpивeт", "latin") == "пpивeт"
    assert normalize_script("hello", "ka") == "hello"


def test_no_letters_no_change():
    assert normalize_script("123 456", "cyrillic") == "123 456"
    assert normalize_script("", "cyrillic") == ""


def test_engine_applies_fold(monkeypatch):
    """_to_logical routes cyrillic/el families through the fold."""
    from vse_tpu.pipeline.ocr_engine import OcrEngine

    class _Spec:
        rec_family = "cyrillic"

    eng = OcrEngine.__new__(OcrEngine)
    eng.spec = _Spec()
    assert eng._to_logical("пpивeт") == "привет"
    _Spec.rec_family = "en"
    assert eng._to_logical("пpивeт") == "пpивeт"
