#!/usr/bin/env python
"""End-of-round-5 TPU work queue, re-prioritized after the japan gate
plateau ate the schedule (wedge + two fresh-opt extensions still leave CER
~0.14 vs the 0.05 bar).

Order (one TPU client at a time; waits for tools/campaign_r5.py to exit):
  1. drop the stale pre-g6 rec_en_server checkpoint so accurate mode falls
     back to the gated en mobile head (CER 0.0) instead of an un-gated
     geometry-stale server head (the r4 incident class);
  2. tools/write_gates.py -> GATES.json (campaign jsonl + prior rows);
  3. eval_golden: ALL modes + ALL 11 language variants (VERDICT r4 #2 —
     the decisive item, so it runs BEFORE server-head training);
  4. server heads en/latin/cyrillic (VERDICT r4 #7), each gated with
     eval_rec --mode accurate, then write_gates again;
  5. bench.py snapshot.

Run detached:
  setsid python tools/final_queue_r5.py --campaign-pid <pid> \
      >> /tmp/final_queue.log 2>&1 &
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

from after_campaign_r5 import SERVER_FAMILIES, train_server, wait_pid  # noqa: E402
from campaign_r5 import log, run_watched  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--campaign-pid", type=int, default=0)
    ap.add_argument("--skip-eval", action="store_true")
    ap.add_argument("--skip-server", action="store_true")
    ap.add_argument("--skip-bench", action="store_true")
    args = ap.parse_args()

    if args.campaign_pid:
        log(f"waiting for campaign pid {args.campaign_pid}")
        wait_pid(args.campaign_pid)
        log("campaign exited")

    stale_srv = os.path.join(REPO, "checkpoints", "rec_en_server")
    if os.path.isdir(stale_srv) and not os.path.exists(
            "/tmp/campaign_r5_fresh_en_server_g6"):
        log("dropping stale pre-g6 rec_en_server (accurate mode falls back "
            "to the gated en mobile head until the g6 server head lands)")
        shutil.rmtree(stale_srv)

    run_watched([sys.executable, os.path.join(REPO, "tools",
                                              "write_gates.py")],
                "/tmp/write_gates.log", stall_secs=600, max_kills=1)

    if not args.skip_eval:
        log("===== eval_golden full run (modes + all language variants)")
        langs = ["ru", "el", "ka", "ar", "korean", "th", "ch", "japan",
                 "hi", "ta", "te"]
        os.environ.setdefault("VSE_EVAL_STAGE_TIMEOUT", "1500")
        for attempt in range(3):
            rc = run_watched(
                [sys.executable, os.path.join(REPO, "tools",
                                              "eval_golden.py"),
                 "--lang-variants", *langs],
                "/tmp/eval_golden_r5.log", stall_secs=1800, max_kills=2)
            if rc == 0:
                break
            log(f"eval_golden rc={rc}; resuming (attempt {attempt + 2})")

    if not args.skip_server:
        for lang, family in SERVER_FAMILIES:
            log(f"===== server head {lang}")
            r = train_server(lang, family)
            log(f"{lang} server: gate {r}")
            run_watched([sys.executable, os.path.join(REPO, "tools",
                                                      "write_gates.py")],
                        "/tmp/write_gates.log", stall_secs=600, max_kills=1)

    if not args.skip_bench:
        log("===== bench snapshot")
        run_watched([sys.executable, os.path.join(REPO, "bench.py")],
                    "/tmp/bench_r5.log", stall_secs=2400, max_kills=2)

    log("FINAL QUEUE DONE")


if __name__ == "__main__":
    main()
