#!/usr/bin/env python
"""Post-campaign TPU work queue (round 5).

Waits for the mobile retraining campaign (tools/campaign_r5.py) to exit,
then runs the remaining on-chip work SERIALLY (the axon tunnel tolerates
exactly one client):

  1. server rec heads for en/latin/cyrillic, from scratch under the g6
     recipe (the pre-existing rec_en_server predates the ink-tight
     geometry and is stale — VERDICT r4 #7), each gated with
     eval_rec --mode accurate (reports which variant loaded);
  2. the full slow gate suite tests/test_rec_quality.py on the chip,
     output to /tmp/gate_suite.log (VERDICT r4 #1 "run the gate suite");
  3. tools/write_gates.py -> GATES.json;
  4. eval_golden full run: all modes + all language variants
     (VERDICT r4 #2);
  5. bench.py snapshot -> /tmp/bench_r5.json.

Everything is wedge-watched (kill+retry on log stalls) via the campaign's
run_watched. Run detached:  setsid python tools/after_campaign_r5.py \
    --campaign-pid <pid> >> /tmp/after_campaign.log 2>&1 &
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from campaign_r5 import ckpt_step, gate, log, run_watched  # noqa: E402

SERVER_FAMILIES = [("en", "en"), ("latin", "latin"), ("cyrillic", "cyrillic")]
SERVER_STEPS = 24000


def wait_pid(pid: int):
    while True:
        try:
            os.kill(pid, 0)
        except ProcessLookupError:
            return
        time.sleep(60)


def train_server(lang: str, family: str) -> dict:
    ckdir = os.path.join(REPO, "checkpoints", f"rec_{family}_server")
    marker = f"/tmp/campaign_r5_fresh_{family}_server_g6"
    if os.path.isdir(ckdir) and not os.path.exists(marker):
        log(f"{lang} server: removing stale pre-g6 checkpoint "
            f"(step {ckpt_step(family, 'server')})")
        shutil.rmtree(ckdir)
    with open(marker, "w") as f:
        f.write(time.ctime())
    rc = run_watched(
        [sys.executable, "-m", "vse_tpu.train.pretrain", "rec",
         "--language", lang, "--variant", "server",
         "--steps", str(SERVER_STEPS), "--batch", "64", "--pregen", "600"],
        f"/tmp/train_{lang}_server.log")
    if rc != 0:
        return {"error": "training failed"}
    # --mode accurate resolves the server head (tools/eval_rec.py:102)
    out = "/tmp/campaign_gate_out.txt"
    try:
        os.remove(out)
    except OSError:
        pass
    rc = run_watched(
        [sys.executable, os.path.join(REPO, "tools", "eval_rec.py"),
         "--language", lang, "--n", "256", "--mode", "accurate"],
        out, stall_secs=1500, max_kills=2)
    try:
        with open(out) as f:
            lines = [ln for ln in f.read().splitlines()
                     if ln.startswith("{")]
        r = json.loads(lines[-1])
    except (OSError, IndexError, json.JSONDecodeError):
        r = {"error": f"gate produced no JSON (rc={rc})"}
    r["language"] = lang
    r["gated_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    with open("/tmp/campaign_r5_server.jsonl", "a") as f:
        f.write(json.dumps(r) + "\n")
    return r


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaign-pid", type=int, default=0)
    ap.add_argument("--skip-server", action="store_true")
    ap.add_argument("--skip-gates", action="store_true")
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    if args.campaign_pid:
        log(f"waiting for campaign pid {args.campaign_pid}")
        wait_pid(args.campaign_pid)
        log("campaign exited")

    if not args.skip_server:
        for lang, family in SERVER_FAMILIES:
            log(f"===== server head {lang}")
            r = train_server(lang, family)
            log(f"{lang} server: gate {r}")

    if not args.skip_gates:
        log("===== slow gate suite on chip")
        os.environ["VSE_TESTS_ON_TPU"] = "1"  # conftest escape hatch
        run_watched(
            [sys.executable, "-m", "pytest",
             "tests/test_rec_quality.py", "-v", "-rA"],
            "/tmp/gate_suite.log", stall_secs=2400, max_kills=1)
        os.environ.pop("VSE_TESTS_ON_TPU", None)
        run_watched(
            [sys.executable, os.path.join(REPO, "tools", "write_gates.py")],
            "/tmp/write_gates.log", stall_secs=600, max_kills=1)

    if not args.skip_eval:
        log("===== eval_golden full run (modes + all language variants)")
        # invalidate r4 stage files ONCE (the heads changed), then run
        # without --fresh so wedge-kill retries resume per stage
        workdir = "/tmp/vse_golden_work"
        if not os.path.exists("/tmp/eval_golden_r5_fresh"):
            for f in os.listdir(workdir) if os.path.isdir(workdir) else []:
                if f.startswith("stage_"):
                    os.remove(os.path.join(workdir, f))
            with open("/tmp/eval_golden_r5_fresh", "w") as f:
                f.write(time.ctime())
        langs = ["ru", "el", "ka", "ar", "korean", "th", "ch", "japan",
                 "hi", "ta", "te"]
        os.environ.setdefault("VSE_EVAL_STAGE_TIMEOUT", "1800")
        for attempt in range(3):
            rc = run_watched(
                [sys.executable, os.path.join(REPO, "tools",
                                              "eval_golden.py"),
                 "--lang-variants", *langs],
                "/tmp/eval_golden_r5.log", stall_secs=2400, max_kills=2)
            if rc == 0:
                break
            log(f"eval_golden rc={rc}; resuming (attempt {attempt + 2})")

    if not args.skip_bench:
        log("===== bench snapshot")
        run_watched(
            [sys.executable, os.path.join(REPO, "bench.py")],
            "/tmp/bench_r5.log", stall_secs=2400, max_kills=2)

    log("AFTER-CAMPAIGN QUEUE DONE")


if __name__ == "__main__":
    main()
