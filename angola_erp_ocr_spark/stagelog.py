"""Per-stage wall/compute decomposition from Spark event logs.

The scaling gate (BASELINE.json: N→4N efficiency ≥ 0.8) needs STAGE-level
evidence, not just end-to-end wall: on one box the shuffle/sort tail is
DRAM-bandwidth-bound in a way 4N real executors (each bringing its own
memory controllers) would not be, so the honest decomposition separates
the map/OCR stage's scaling from the tail's (VERDICT r2 task 2). Spark
writes one JSON event per line when ``spark.eventLog.enabled`` is true;
``SparkListenerStageCompleted`` carries submission/completion times plus
the internal metric accumulables (executor run time, shuffle bytes) — no
listener registration or UI needed, works under ``spark-submit``.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any

# "WholeStageCodegen (3)" → "WholeStageCodegen": see parse_stages
_SCOPE_ID_RE = re.compile(r"\s*\(\d+\)")

_ACC = {
    "internal.metrics.executorRunTime": "exec_run_ms",
    "internal.metrics.executorCpuTime": "exec_cpu_ns",
    "internal.metrics.shuffle.write.bytesWritten": "shuffle_write_bytes",
    "internal.metrics.shuffle.read.localBytesRead": "shuffle_read_local",
    "internal.metrics.shuffle.read.remoteBytesRead": "shuffle_read_remote",
}


def event_log_path(spark) -> str | None:
    """Resolve this app's event-log file (handles the .inprogress suffix)."""
    conf = spark.sparkContext.getConf()
    if conf.get("spark.eventLog.enabled", "false") != "true":
        return None
    d = conf.get("spark.eventLog.dir", "/tmp/spark-events")
    if d.startswith("file:"):
        d = d[len("file:"):]
        while d.startswith("//"):
            d = d[1:]
    app_id = spark.sparkContext.applicationId
    for suffix in ("", ".inprogress"):
        p = os.path.join(d, app_id + suffix)
        if os.path.exists(p):
            return p
    return None


def parse_stages(log_path: str, t_min_ms: int | None = None,
                 t_max_ms: int | None = None) -> list[dict[str, Any]]:
    """Completed stages (optionally windowed by submission time, epoch ms).

    Returns rows sorted by submission time:
        {stage_id, name, tasks, submitted_ms, wall_ms, exec_run_ms,
         exec_cpu_ms, shuffle_write_mb, shuffle_read_mb}
    """
    out: list[dict[str, Any]] = []
    with open(log_path, encoding="utf-8") as f:
        for line in f:
            if '"SparkListenerStageCompleted"' not in line:
                continue
            try:
                ev = json.loads(line)
            except json.JSONDecodeError:  # torn tail line of a live log
                continue
            info = ev.get("Stage Info", {})
            sub = info.get("Submission Time")
            comp = info.get("Completion Time")
            if sub is None or comp is None:
                continue
            if t_min_ms is not None and sub < t_min_ms:
                continue
            if t_max_ms is not None and sub > t_max_ms:
                continue
            acc = {a.get("Name"): a.get("Value")
                   for a in info.get("Accumulables", [])}
            m = {dst: int(acc.get(src, 0) or 0) for src, dst in _ACC.items()}
            # plan-node fingerprint from the stage's RDD scopes (r5):
            # the set of scope KINDS ("Exchange", "WholeStageCodegen",
            # "Window", "MapInPandas", …) identifies WHAT the stage
            # computes. Stage NAME is only the materialization callsite
            # — in a driver that collects every query from one line, all
            # stages share it and name-based pairing degrades to
            # positional (the r5 official-run wart). Codegen ids are
            # stripped (they renumber when AQE makes level-specific
            # choices, e.g. broadcasting a join only at the wide level)
            # and AQEShuffleRead is dropped (a runtime insertion, not a
            # plan node) — both measured to break cross-level pairing on
            # the r5 official run before normalization.
            scopes = set()
            for r in info.get("RDD Info", []):
                sc = r.get("Scope")
                if sc:
                    try:
                        nm = json.loads(sc).get("name")
                    except (json.JSONDecodeError, AttributeError):
                        nm = None
                    if nm:
                        nm = _SCOPE_ID_RE.sub("", nm).strip()
                        if nm != "AQEShuffleRead":
                            scopes.add(nm)
            out.append({
                "stage_id": info.get("Stage ID"),
                "name": (info.get("Stage Name") or "")[:80],
                "plan_sig": "|".join(sorted(scopes)) or
                            (info.get("Stage Name") or "")[:80],
                "tasks": info.get("Number of Tasks"),
                "submitted_ms": sub,
                "wall_ms": comp - sub,
                "exec_run_ms": m["exec_run_ms"],
                "exec_cpu_ms": m["exec_cpu_ns"] // 1_000_000,
                "shuffle_write_mb": round(
                    m["shuffle_write_bytes"] / 1e6, 2),
                "shuffle_read_mb": round(
                    (m["shuffle_read_local"] + m["shuffle_read_remote"]) / 1e6,
                    2),
            })
    out.sort(key=lambda s: s["submitted_ms"])
    return out


def stage_scaling_table(small: list[dict], big: list[dict],
                        factor: int = 4,
                        negligible_ms: int = 1000) -> list[dict[str, Any]]:
    """Pair the two levels' stages by PLAN-NODE FINGERPRINT —
    (``plan_sig``, occurrence index in submission order) — not list
    position.

    Positional zip (the round-3 bug, VERDICT r3 task 2) silently misaligns
    when AQE re-plans differently under the two levels' different
    ``spark.sql.shuffle.partitions`` (extra/reordered stages), producing
    uninterpretable per-stage "efficiencies" (0.03 / 9.27-class rows in
    BENCH/scaling_2v8.json r3). ``plan_sig`` (r5) is the stage's
    RDD-scope set — Exchange / WholeStageCodegen(n) / Window / python
    nodes — which identifies WHAT the stage computes independently of
    where it was collected from; stage NAME (the materialization
    callsite, the pre-r5 key) is the fallback for rows parsed by older
    code, but is degenerate when one driver line collects every query
    (all stages share the callsite and name-pairing collapses to
    positional — the r5 official-run wart, BENCH/ANALYSIS.md §Round-5).

    Rows where BOTH levels' wall is below ``negligible_ms`` are flagged
    ``negligible: true`` — fixed scheduler/JIT overhead where a wall-clock
    ratio is noise, not data. Stages present at only one level are emitted
    with ``unpaired: '<level>'`` and no efficiency, never dropped silently.
    """
    def keyed(stages: list[dict]) -> dict[tuple[str, int], dict]:
        seen: dict[str, int] = {}
        out = {}
        for s in stages:
            sig = s.get("plan_sig") or s["name"]
            k = (sig, seen.get(sig, 0))
            seen[sig] = k[1] + 1
            out[k] = s
        return out

    ka, kb = keyed(small), keyed(big)
    rows = []
    # Display order = order-preserving MERGE of the two runs' per-run
    # submission sequences, not raw submitted_ms: the two runs' clocks
    # are unrelated, so with absolute timestamps every big-only
    # (unpaired) stage would sort after ALL small-run stages regardless
    # of plan position (ADVICE r4). The big run's sequence is primary
    # (it sees every stage the small run does plus AQE extras);
    # small-only stages slot in before the next shared stage that
    # follows them in the small run's own order.
    def seq(keyed_stages: dict) -> list:
        return sorted(keyed_stages, key=lambda k: keyed_stages[k]["submitted_ms"])

    seq_small, seq_big = seq(ka), seq(kb)
    merged, emitted, si = [], set(), 0
    for k in seq_big:
        if k in ka:
            while si < len(seq_small) and seq_small[si] != k:
                kk = seq_small[si]
                if kk not in kb and kk not in emitted:
                    merged.append(kk)
                    emitted.add(kk)
                si += 1
            if si < len(seq_small):
                si += 1
        if k not in emitted:
            merged.append(k)
            emitted.add(k)
    for k in seq_small:
        if k not in emitted:
            merged.append(k)
            emitted.add(k)
    for i, k in enumerate(merged):
        a, b = ka.get(k), kb.get(k)
        if a is None or b is None:
            side = a or b
            rows.append({
                "idx": i, "name": k[0][:80], "occurrence": k[1],
                "unpaired": "small" if a else "big",
                "tasks_small": a["tasks"] if a else None,
                "tasks_big": b["tasks"] if b else None,
                "wall_ms_small": a["wall_ms"] if a else None,
                "wall_ms_big": b["wall_ms"] if b else None,
                "exec_run_ms_small": a["exec_run_ms"] if a else None,
                "exec_run_ms_big": b["exec_run_ms"] if b else None,
                "shuffle_read_mb": side["shuffle_read_mb"],
                "efficiency": None,
                "negligible": side["wall_ms"] < negligible_ms,
            })
            continue
        eff = (a["wall_ms"] / (factor * b["wall_ms"])
               if b["wall_ms"] > 0 else None)
        negligible = (a["wall_ms"] < negligible_ms
                      and b["wall_ms"] < negligible_ms)
        rows.append({
            "idx": i,
            "name": k[0][:80],
            "occurrence": k[1],
            "tasks_small": a["tasks"], "tasks_big": b["tasks"],
            "wall_ms_small": a["wall_ms"], "wall_ms_big": b["wall_ms"],
            "exec_run_ms_small": a["exec_run_ms"],
            "exec_run_ms_big": b["exec_run_ms"],
            "shuffle_read_mb": max(a["shuffle_read_mb"], b["shuffle_read_mb"]),
            "efficiency": (round(eff, 3)
                           if eff is not None and not negligible else None),
            "negligible": negligible,
        })
    return rows
