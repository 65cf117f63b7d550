#!/usr/bin/env python
"""Round-5 retraining campaign driver (VERDICT r4 #1/#2/#3).

Serializes ALL TPU work (the axon tunnel tolerates exactly one client):
for each script family, wait for its pre-rendered dataset, train FROM
SCRATCH under the production-geometry augmentation, then gate with
tools/eval_rec.py (n=256, prod geometry — the exact numbers
tests/test_rec_quality.py asserts). Families that fail their gate are
extended +8000 steps with a FRESH optimizer schedule (--fresh-opt) and
re-gated, up to a retry cap.

Why from-scratch: the v1 campaign resumed stale checkpoints and extended
them — but plain resume restores the adam step count, so extension steps
ran at the ~0-LR cosine tail and learned nothing (measured: cyrillic
40k->80k extensions moved CER 0.33->0.27 against a 0.05 gate). The en
head, trained from scratch under the geometry augmentation, passes at
0.041. el/cyrillic additionally get the g5 text distribution (native
wordlists + core-weighted single-script soup — vse_tpu/train/wordlists.py).

The driver itself never imports jax (no second TPU client); children are
watched for the axon wedge signature (log stalls with near-zero CPU growth)
and killed+retried — training resumes from periodic checkpoints, so a
retry is cheap.

  python tools/campaign_r5.py                  # full campaign
  python tools/campaign_r5.py --families el ch # subset

Progress: /tmp/campaign_r5.log, per-family gates appended to
/tmp/campaign_r5.jsonl (the last record per family wins).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# (cli language, checkpoint family dir, dataset gen tag, gate cer, gate em,
#  from-scratch step target)
# g6 for every family: near-full-height fonts (ink-tight crop geometry,
# ops/image.py refine_boxes_ink) + native wordlists (train/wordlists.py).
FAMILIES = [
    ("en",          "en",          "g6", 0.05, 0.6,  40000),
    ("ar",          "arabic",      "g6", 0.05, 0.5,  40000),
    ("cyrillic",    "cyrillic",    "g6", 0.05, 0.6,  40000),
    ("el",          "el",          "g6", 0.05, 0.6,  40000),
    ("korean",      "korean",      "g6", 0.05, 0.6,  40000),
    ("th",          "th",          "g6", 0.05, 0.5,  40000),
    ("devanagari",  "devanagari",  "g6", 0.05, 0.5,  40000),
    ("ta",          "ta",          "g6", 0.05, 0.5,  40000),
    ("te",          "te",          "g6", 0.05, 0.5,  40000),
    ("ka",          "ka",          "g6", 0.06, 0.55, 40000),
    ("latin",       "latin",       "g6", 0.05, 0.6,  40000),
    ("ch",          "ch",          "g6", 0.05, 0.5,  32000),
    ("japan",       "japan",       "g6", 0.05, 0.5,  32000),
    ("chinese_cht", "chinese_cht", "g6", 0.05, 0.5,  32000),
]

RETRY_EXTEND = 8000  # per failed gate, with --fresh-opt
RETRY_LR = "3e-4"
MAX_GATE_RETRIES = 2
STALL_SECS = 1500    # no log output for this long => wedged child
DS_WAIT_SECS = 7200  # render queue runs ~10 min/dataset on the 1-core host


def log(msg: str):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)


def ds_path(lang: str, gen: str) -> str:
    return f"/tmp/vse_rec_ds_{lang}_600x64_w1s2{gen}.npz"


def ckpt_step(family: str, variant: str = "mobile") -> int:
    meta = os.path.join(REPO, "checkpoints", f"rec_{family}_{variant}",
                        "vse_meta.json")
    try:
        with open(meta) as f:
            return int(json.load(f).get("step", 0))
    except (OSError, ValueError):
        return 0


def run_watched(cmd, logfile: str, stall_secs: int = STALL_SECS,
                max_kills: int = 2) -> int:
    """Run cmd appending to logfile; kill+retry when output stalls (the
    axon wedge: elapsed climbs, CPU and logs do not)."""
    for attempt in range(max_kills + 1):
        log(f"+ {' '.join(cmd)} (attempt {attempt + 1})")
        with open(logfile, "ab") as lf:
            lf.write(f"\n===== {time.ctime()} {' '.join(cmd)}\n".encode())
            lf.flush()
            p = subprocess.Popen(cmd, cwd=REPO, stdout=lf,
                                 stderr=subprocess.STDOUT)
            last_size = os.path.getsize(logfile)
            last_change = time.time()
            while True:
                rc = p.poll()
                if rc is not None:
                    if rc == 0:
                        return 0
                    log(f"child exited rc={rc}; see {logfile}")
                    break  # retry (resume makes this cheap)
                time.sleep(20)
                size = os.path.getsize(logfile)
                if size != last_size:
                    last_size, last_change = size, time.time()
                elif time.time() - last_change > stall_secs:
                    log(f"WEDGE: no output {stall_secs}s — kill pid {p.pid}")
                    p.send_signal(signal.SIGKILL)
                    p.wait()
                    break
    return 1


def gate(lang: str, n: int = 256) -> dict:
    out = "/tmp/campaign_gate_out.txt"
    try:
        os.remove(out)
    except OSError:
        pass
    rc = run_watched(
        [sys.executable, os.path.join(REPO, "tools", "eval_rec.py"),
         "--language", lang, "--n", str(n)],
        out, stall_secs=1500, max_kills=2)
    try:
        with open(out) as f:
            lines = [ln for ln in f.read().splitlines() if ln.startswith("{")]
        r = json.loads(lines[-1])
    except (OSError, IndexError, json.JSONDecodeError):
        r = {"error": f"gate produced no JSON (rc={rc})"}
    r["language"] = lang
    r["gated_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("/tmp/campaign_r5.jsonl", "a") as f:
        f.write(json.dumps(r) + "\n")
    return r


def _train(lang: str, target: int, extra) -> int:
    return run_watched(
        [sys.executable, "-m", "vse_tpu.train.pretrain", "rec",
         "--language", lang, "--steps", str(target),
         "--batch", "64", "--pregen", "600", *extra],
        f"/tmp/train_{lang}.log")


def train_family(lang, family, gen, cer_bar, em_bar, scratch_steps) -> bool:
    dsp = ds_path(lang, gen)
    t0 = time.time()
    while not os.path.exists(dsp):
        if time.time() - t0 > DS_WAIT_SECS:
            log(f"{lang}: dataset {dsp} never appeared — SKIP")
            return False
        time.sleep(30)
    # the render queue writes the file non-atomically; wait for it to settle
    while True:
        s1 = os.path.getsize(dsp)
        time.sleep(10)
        if os.path.getsize(dsp) == s1 and s1 > 1 << 20:
            break

    # From-scratch: remove the stale pre-campaign checkpoint ONCE (git
    # history keeps it) so pretrain's resume logic starts cold; a marker
    # distinguishes "stale" from "interrupted run of this campaign", which
    # wedge-kill retries then resume at the correct cosine position.
    prior = ckpt_step(family)
    ckdir = os.path.join(REPO, "checkpoints", f"rec_{family}_mobile")
    marker = f"/tmp/campaign_r5_fresh_{family}_g6t1"
    if os.path.isdir(ckdir) and not os.path.exists(marker):
        import shutil

        shutil.rmtree(ckdir)
        log(f"{lang}: removed stale checkpoint (step {prior})")
    with open(marker, "w") as f:
        f.write(time.ctime())
    target = scratch_steps
    rc = _train(lang, target, [])
    if rc != 0:
        log(f"{lang}: training failed after retries — SKIP family")
        return False
    for trial in range(MAX_GATE_RETRIES + 1):
        r = gate(lang)
        log(f"{lang}: gate {r}")
        if "error" not in r and r["cer"] <= cer_bar and r["exact_match"] >= em_bar:
            log(f"{lang}: PASS (cer {r['cer']} em {r['exact_match']})")
            return True
        if trial == MAX_GATE_RETRIES:
            break
        target += RETRY_EXTEND
        log(f"{lang}: gate failed — fresh-opt extension to {target}")
        rc = _train(lang, target, ["--fresh-opt", "--lr", RETRY_LR])
        if rc != 0:
            log(f"{lang}: extension failed — stopping retries")
            break
    log(f"{lang}: still failing after retries")
    return False


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", nargs="*",
                    default=[f[0] for f in FAMILIES])
    ap.add_argument("--server", nargs="*", default=[],
                    help="families to also train a server head for")
    ap.add_argument("--server-steps", type=int, default=24000)
    args = ap.parse_args()

    results = {}
    for lang, family, gen, cer_bar, em_bar, scratch in FAMILIES:
        if lang not in args.families:
            continue
        log(f"===== family {lang} (ckpt step {ckpt_step(family)})")
        results[lang] = train_family(lang, family, gen, cer_bar, em_bar,
                                     scratch)
        log(f"PROGRESS: {json.dumps(results)}")
    for lang in args.server:
        family = dict((f[0], f[1]) for f in FAMILIES).get(lang, lang)
        step = ckpt_step(family, "server")
        if step >= args.server_steps:
            log(f"{lang} server: already at {step}")
            continue
        rc = run_watched(
            [sys.executable, "-m", "vse_tpu.train.pretrain", "rec",
             "--language", lang, "--variant", "server",
             "--steps", str(args.server_steps), "--batch", "64",
             "--pregen", "600"],
            f"/tmp/train_{lang}_server.log")
        results[f"{lang}_server"] = rc == 0
    log(f"CAMPAIGN DONE: {json.dumps(results)}")
    failed = [k for k, v in results.items() if not v]
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
