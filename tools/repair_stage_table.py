"""Re-derive the r5 official scaling run's best-round per-stage table
with plan_sig pairing (supplementary artifact; the generated
BENCH/BASELINE.md table from the run itself is left as-recorded).

The official run predates stagelog's plan_sig key, and its driver
(bench/run.py) collects every query from one line — so the recorded
table paired by (callsite name, occurrence) degraded to positional and
misaligned where AQE split the two levels into different stage counts
(BENCH/ANALYSIS.md §Round-5 wart). The event logs of every leg are still
on disk; this tool re-parses the best round's two legs and pairs by
(plan_sig, occurrence).

Each leg's app ran an untimed corpus count plus 2 timed extraction runs
(best-of-2); for each plan signature the WARM instance (latest
submission) is used, giving a well-defined JIT-warm comparison.

Pairing uses a LEVEL-PORTABLE signature: plan_sig with
WholeStageCodegen/stage numbers stripped and node counts kept —
codegen ids renumber when AQE makes different runtime choices at the
two levels (it did: the big level broadcast a join the small level
shuffled), so the raw ids never pair across levels. Genuinely
level-specific stages stay unpaired rather than mispairing.

Usage: python tools/repair_stage_table.py <round_idx> <after_epoch_ms> [event_dir]
Writes BENCH/stages_r5_best_round.json.
"""
from __future__ import annotations

import glob
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from angola_erp_ocr_spark.stagelog import parse_stages, stage_scaling_table

import re
from collections import Counter


def portable_sig(sig: str) -> str:
    """plan_sig → level-portable form: the SET of plan-node kinds.
    Codegen ids and counts renumber/refuse under AQE's level-specific
    choices, and AQEShuffleRead is a runtime insertion, not a plan node —
    all are stripped. Same-sig stages still disambiguate by occurrence
    index in stage_scaling_table."""
    nodes = {re.sub(r"\s*\(\d+\)", "", n).strip() for n in sig.split("|")}
    nodes.discard("AQEShuffleRead")
    return "|".join(sorted(nodes))


def leg_meta(path: str) -> dict | None:
    """(app name, spark.master, start ms) from the log head."""
    meta = {}
    with open(path, encoding="utf-8") as f:
        for line in f:
            if ('"SparkListenerEnvironmentUpdate"' not in line
                    and '"SparkListenerApplicationStart"' not in line):
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:
                continue
            if ev.get("Event") == "SparkListenerApplicationStart":
                meta["app"] = ev.get("App Name")
                meta["start_ms"] = ev.get("Timestamp")
            else:
                props = ev.get("Spark Properties", {})
                meta["master"] = props.get("spark.master")
            if len(meta) >= 3:
                return meta
    return meta or None


def warm_stages(path: str) -> list[dict]:
    """Per plan signature, keep the latest-submitted instance (the warm
    second timed run; once-only stages keep their single instance)."""
    latest: dict[str, dict] = {}
    for s in parse_stages(path):
        sig = portable_sig(s.get("plan_sig") or s["name"])
        s = dict(s, plan_sig=sig)
        if sig not in latest or s["submitted_ms"] > latest[sig]["submitted_ms"]:
            latest[sig] = s
    return sorted(latest.values(), key=lambda s: s["submitted_ms"])


def main() -> None:
    round_idx = int(sys.argv[1]) if len(sys.argv) > 1 else 0
    after_ms = int(sys.argv[2]) if len(sys.argv) > 2 else 0
    event_dir = sys.argv[3] if len(sys.argv) > 3 else "/tmp/spark-graft-events"
    legs = {"local[2]": [], "local[8]": []}
    for p in glob.glob(os.path.join(event_dir, "local-*")):
        if p.endswith(".inprogress"):
            continue
        m = leg_meta(p)
        if (m and m.get("app") == "extract_job" and m.get("master") in legs
                and (m.get("start_ms") or 0) >= after_ms):
            legs[m["master"]].append((m["start_ms"], p))
    for k in legs:
        legs[k].sort()
    if round_idx >= min(len(legs["local[2]"]), len(legs["local[8]"])):
        raise SystemExit(f"round {round_idx} not found: "
                         f"{len(legs['local[2]'])} small / "
                         f"{len(legs['local[8]'])} big legs in {event_dir}")
    small_log = legs["local[2]"][round_idx][1]
    big_log = legs["local[8]"][round_idx][1]
    table = stage_scaling_table(warm_stages(small_log), warm_stages(big_log))
    out = {
        "source": "re-derived from the official r5 run's event logs "
                  "(plan_sig pairing, warm instance per signature)",
        "round": round_idx,
        "small_leg_log": os.path.basename(small_log),
        "big_leg_log": os.path.basename(big_log),
        "pairing": "2v8",
        "table": table,
    }
    dst = os.path.join(REPO, "BENCH", "stages_r5_best_round.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    for r in table:
        print(f"{r['idx']:2d} eff={str(r.get('efficiency')):>6} "
              f"wall {str(r.get('wall_ms_small')):>7}/"
              f"{str(r.get('wall_ms_big')):>7} "
              f"{'UNPAIRED-' + r['unpaired'] if r.get('unpaired') else ''}"
              f" {r['name'][:60]}")
    print(f"wrote {dst}")


if __name__ == "__main__":
    main()
