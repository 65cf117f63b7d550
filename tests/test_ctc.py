import jax.numpy as jnp
import numpy as np
import pytest

from vse_tpu.core.charset import Charset, get_charset, script_family
from vse_tpu.ops.ctc import (
    ctc_greedy_decode,
    ctc_loss,
    ctc_prefix_beam_decode,
    decode_batch_to_texts,
)


def logits_from_path(path, num_classes, strength=10.0):
    T = len(path)
    logits = np.zeros((T, num_classes), np.float32)
    for t, c in enumerate(path):
        logits[t, c] = strength
    return logits


def test_greedy_collapses_repeats_and_blanks():
    # path: a a blank a b b -> "a a b" => ids [1, 1, 2]
    logits = logits_from_path([1, 1, 0, 1, 2, 2], num_classes=4)
    ids, mask, scores = ctc_greedy_decode(jnp.asarray(logits)[None])
    got = [int(i) for i, m in zip(np.array(ids[0]), np.array(mask[0])) if m]
    assert got == [1, 1, 2]
    assert float(scores[0]) > 0.99


def test_greedy_empty_sequence_score_one():
    logits = logits_from_path([0, 0, 0], num_classes=3)
    ids, mask, scores = ctc_greedy_decode(jnp.asarray(logits)[None])
    assert not np.array(mask[0]).any()
    assert float(scores[0]) == pytest.approx(1.0)


def test_greedy_matches_host_reference_random(rng):
    B, T, C = 5, 20, 12
    logits = rng.normal(size=(B, T, C)).astype(np.float32)
    ids, mask, _ = ctc_greedy_decode(jnp.asarray(logits))
    for b in range(B):
        best = logits[b].argmax(-1)
        ref = []
        prev = -1
        for c in best:
            if c != 0 and c != prev:
                ref.append(int(c))
            prev = int(c)
        got = [int(i) for i, m in zip(np.array(ids[b]), np.array(mask[b])) if m]
        assert got == ref


def test_prefix_beam_agrees_with_greedy_on_peaked_dist():
    logits = logits_from_path([1, 0, 2, 2, 0, 3], num_classes=5, strength=20.0)
    log_probs = logits - np.log(np.exp(logits).sum(-1, keepdims=True))
    ids, score = ctc_prefix_beam_decode(log_probs, beam_width=4)
    assert ids == [1, 2, 3]
    assert score > 0.9


def test_ctc_loss_decreases_on_correct_logits():
    # loss of correct path should be much lower than random
    labels = np.array([[1, 2, 3]], np.int32)
    good = logits_from_path([1, 0, 2, 0, 3, 0], num_classes=5)[None]
    bad = np.zeros_like(good)
    lp = np.zeros((1, 6), np.float32)
    lab_pad = np.zeros((1, 3), np.float32)
    l_good = float(ctc_loss(jnp.asarray(good), jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(lab_pad)))
    l_bad = float(ctc_loss(jnp.asarray(bad), jnp.asarray(lp), jnp.asarray(labels), jnp.asarray(lab_pad)))
    assert l_good < l_bad


def test_charset_roundtrip_and_decode_pipeline():
    cs = get_charset("en")
    ids = cs.encode("Hello?")
    assert cs.decode_ids(ids) == "Hello?"
    # unknown chars dropped
    assert cs.decode_ids(cs.encode("héllo")) == "hllo"
    # end-to-end through the greedy decoder
    text = "abc"
    path = []
    for i in cs.encode(text):
        path.extend([i, 0])
    logits = logits_from_path(path, cs.num_classes)
    ids, mask, _ = ctc_greedy_decode(jnp.asarray(logits)[None])
    assert decode_batch_to_texts(ids, mask, cs) == ["abc"]


def test_script_family_mapping():
    # reference backend/tools/paddle_model_config.py:25-45
    assert script_family("german") == "latin"
    assert script_family("fa") == "arabic"
    assert script_family("ru") == "cyrillic"
    assert script_family("hi") == "devanagari"
    assert script_family("ch") == "ch"
    assert script_family("japan") == "japan"


def test_charset_folded_and_without_space():
    cs = get_charset("en")
    f = cs.folded()
    assert f.fold_case
    assert all(c == c.lower() for c in f.chars)
    assert f.decode_ids(f.encode("Hello World")) == "hello world"
    ns = f.without_space()
    assert " " not in ns.chars
    assert ns.fold_case  # preserved through without_space
    assert ns.decode_ids(ns.encode("Hello World")) == "helloworld"
