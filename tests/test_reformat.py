import pytest

from vse_tpu.post.reformat import (
    VERB_FORM_MAP,
    execute,
    load_typo_map,
    punctuation_fixes,
    reformat_text,
    resegment_text,
    typo_fix,
)
from vse_tpu.post.srt import SrtFile, SrtItem
from vse_tpu.post.wordseg import Segmenter


@pytest.fixture(scope="module")
def seg():
    return Segmenter()


def test_typo_map_entries():
    tm = load_typo_map()
    assert typo_fix("l'm here", tm) == "I'm here"
    assert typo_fix("Iife is good", tm) == "life is good"
    assert typo_fix("威筋", tm) == "威胁"


# table-driven tests of the punctuation pass (reference reformat.py:152-190)
@pytest.mark.parametrize(
    "inp,out",
    [
        ("helloWorld", "hello World"),          # space before capital
        ("wait ,what ?", "wait, what?"),        # space before punct removed
        ("it ' s", "it's"),                     # apostrophe spaces
        ("50 %", "50%"),                        # percent join
        ("word -like", "word-like"),            # dash join
        ("end·", "end."),                        # trailing middle dot
        # the final punct-spacing rule re-adds the space the Dr-rule removed,
        # mirroring the reference's rule order (reformat.py:172 then :180)
        ("Dr. Smith", "Dr. Smith"),
        ("a，b", "a, b"),                        # CJK comma + space after
        ("first。second", "first. second"),     # CJK period
        ("“quote”", '"quote"'),                 # CJK quotes
        ("  leading", "leading"),               # leading spaces
        ("line\n  next", "line\nnext"),         # post-newline spaces
    ],
)
def test_punctuation_fixes(inp, out):
    assert punctuation_fixes(inp) == out


def test_resegment_splits_joined_words(seg):
    assert resegment_text("thisis", seg) == "this is"
    assert resegment_text("Whatdoyouwant", seg) == "What do you want"
    # known single words are left alone
    assert resegment_text("hello world", seg) == "hello world"


def test_resegment_restores_contractions(seg):
    out = resegment_text("imgoing", seg)
    assert out == "I'm going"


def test_reformat_text_full(seg):
    tm = load_typo_map()
    out = reformat_text("l'm  fine ,thanks", "en", tm, seg)
    assert out == "I'm fine, thanks"


def test_reformat_chinese_linebreak(seg):
    tm = load_typo_map()
    out = reformat_text("你好  hello", "ch", tm, seg)
    assert out == "你好\nhello"


def test_execute_on_file(tmp_path):
    p = tmp_path / "t.srt"
    SrtFile([SrtItem(1, 0, 1000, "l'm  here ,ok")]).save(str(p))
    assert execute(str(p), "en")
    back = SrtFile.open(str(p))
    assert back[0].text == "I'm here, ok"


def test_execute_never_corrupts_on_bad_line(tmp_path):
    p = tmp_path / "t.srt"
    SrtFile([SrtItem(1, 0, 1000, "x" * 2000)]).save(str(p))  # too long: skipped
    assert execute(str(p), "en")
    assert SrtFile.open(str(p))[0].text == "x" * 2000
