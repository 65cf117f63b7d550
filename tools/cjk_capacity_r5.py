#!/usr/bin/env python
"""Tail-of-round-5 CJK capacity retrain (VERDICT r4 #3, after the japan /
chinese_cht plateau at the mobile defaults — see models/crnn.py:59 for the
feature-collapse diagnosis that motivated the hidden/cnn_scale overrides).

Waits for the TPU to free (a pid file, e.g. the eval_golden run), then for
each failing ideograph family: retrain FROM SCRATCH at hidden=128 /
cnn_scale=0.75, gate on-chip with tools/eval_rec.py (n=256, prod geometry —
the exact numbers tests/test_rec_quality.py asserts), and keep whichever
head gates better (git restores the committed checkpoint when the new one
is worse, and the gate record is only appended when it improves, so
GATES.json can only move toward the truth).

Everything is deadline-boxed: training children run under a wall-clock
budget (pretrain checkpoints every 1000 steps, so a deadline kill loses
<1000 steps and the head is still gateable), and a family is skipped
outright when too little budget remains to both train and gate it.

  python tools/cjk_capacity_r5.py --wait-pid-file /tmp/eval.pid \
      --deadline-min 45
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tools"))

from after_campaign_r5 import wait_pid  # noqa: E402
from campaign_r5 import gate, log, run_watched  # noqa: E402

FAMILIES = [("japan", 20000), ("chinese_cht", 20000)]
HIDDEN = "128"
CNN_SCALE = "0.75"
GATE_BUDGET_S = 360  # eval_rec n=256 incl. compile; measured ~2-4 min


def committed_cer(family: str) -> float:
    try:
        with open(os.path.join(REPO, "GATES.json")) as f:
            g = json.load(f)
        for row in g["families"]:
            if row["family"] == family:
                return float(row["measured"]["cer"])
    except (OSError, KeyError, ValueError):
        pass
    return 1.0


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--wait-pid-file", default="")
    ap.add_argument("--deadline-min", type=float, default=45.0)
    args = ap.parse_args()
    deadline = time.time() + args.deadline_min * 60

    if args.wait_pid_file and os.path.exists(args.wait_pid_file):
        with open(args.wait_pid_file) as f:
            pid = int(f.read().strip())
        log(f"waiting for TPU holder pid {pid}")
        wait_pid(pid)
        log("TPU free")

    for family, steps in FAMILIES:
        remain = deadline - time.time()
        if remain < GATE_BUDGET_S + 240:
            log(f"{family}: only {remain:.0f}s left — skip")
            continue
        ckdir = os.path.join(REPO, "checkpoints", f"rec_{family}_mobile")
        log(f"===== {family}: capacity retrain (hidden {HIDDEN}, "
            f"cnn_scale {CNN_SCALE}, {steps} steps, "
            f"{remain / 60:.0f} min budget)")
        # from-scratch at the new width: the committed (narrow) checkpoint
        # can't seed it; git history keeps it for restore-on-regression
        if os.path.isdir(ckdir):
            import shutil

            shutil.rmtree(ckdir)
        train_budget = int(deadline - time.time() - GATE_BUDGET_S)
        rc = run_watched(
            ["timeout", str(train_budget), sys.executable, "-m",
             "vse_tpu.train.pretrain", "rec", "--language", family,
             "--steps", str(steps), "--batch", "64", "--pregen", "600",
             "--hidden", HIDDEN, "--cnn-scale", CNN_SCALE],
            # max_kills=0: a deadline (`timeout`) kill must NOT retry — a
            # second attempt would double the wall budget past the deadline
            f"/tmp/train_{family}_wide.log", stall_secs=900, max_kills=0)
        if not os.path.isdir(ckdir):
            log(f"{family}: no checkpoint produced (rc={rc}) — restoring "
                "committed head")
            subprocess.run(["git", "checkout", "--", ckdir], cwd=REPO)
            continue
        r = gate(family)
        old = committed_cer(family)
        new = r.get("cer", 1.0)
        log(f"{family}: gate {r} (committed cer {old})")
        if "error" in r or new >= old:
            log(f"{family}: new head is not better ({new} vs {old}) — "
                "restoring committed checkpoint, dropping gate record")
            subprocess.run(["git", "checkout", "--", ckdir], cwd=REPO)
            # drop the just-appended jsonl record so write_gates keeps the
            # committed (better) row
            with open("/tmp/campaign_r5.jsonl") as f:
                lines = f.read().splitlines()
            lines = [ln for ln in lines
                     if json.loads(ln).get("language") != family]
            with open("/tmp/campaign_r5.jsonl", "w") as f:
                f.write("\n".join(lines) + ("\n" if lines else ""))
        else:
            log(f"{family}: IMPROVED {old} -> {new}")
        run_watched([sys.executable,
                     os.path.join(REPO, "tools", "write_gates.py")],
                    "/tmp/write_gates.log", stall_secs=600, max_kills=1)
    log("CJK CAPACITY QUEUE DONE")


if __name__ == "__main__":
    main()
