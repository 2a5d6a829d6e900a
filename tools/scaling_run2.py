"""Scaling protocol RUN 2 (round 4) — pre-registered before execution.

Motivation (committed before this script ever ran; see the commit that
adds this file): run 1 of the round-4 protocol (BENCH/BASELINE.md,
BENCH/result_r4_scaling.json) measured best 1.034 / median 0.745 over 8
interleaved 2v8 rounds, with its pre-registered small-level exclusion
rule firing ZERO times — small-level throughput was stable (±14%) while
big-level throughput spread 2.4×. Conclusion: host interference lands on
the wide level, where a rule keyed on any measured pipeline throughput
cannot exclude it without touching the gated ratio itself.

Run 2 therefore instruments the HOST directly, independently of the
pipeline:

  * Host-noise probe: 8 processes taskset-pinned to cores 0-7 (the same
    cores both legs run on), each executing a fixed numpy kernel
    (deterministic FLOP count). Probe metric = wall seconds for all 8 to
    finish. The probe measures machine capability, not the pipeline — it
    is independent of pairing, level, and the efficiency ratio.
  * Probe schedule: before the small leg, between the legs, after the
    big leg — 3 probes per round.
  * PRE-REGISTERED exclusion rule: a round is excluded iff any of its 3
    probes is >15% SLOWER than the median probe wall across the whole
    run (slower only: noise can only slow the probe; a fast probe is
    never evidence against a round).
  * Round count: deadline-based, NOT results-based — rounds run until
    the wall-clock deadline passed on the command line (minimum 3
    rounds), then stop. The deadline exists so this run cannot collide
    with the external driver's own end-of-round bench (an orphaned
    overlapping run is the documented measurement-poisoning hazard).
  * Reporting: ALL rounds, ALL probe walls, efficiencies with and
    without exclusions, best and median — whatever they turn out to be.
    The official gate reading for round 4 remains RUN 1 (registered
    first); run 2 tests whether the quiet-host capability and the
    median reproduce under host-aware exclusion.

Everything else is identical to run 1: same corpus
(/tmp/spark_graft_bench_corpus_g3_1000000, generation 3, _DONE-marked),
same taskset-pinned `spark-submit --py-files` legs, same best-of-2 per
leg, same 2v8 pairing, interleaved (small, big) per round.

Usage:  python tools/scaling_run2.py <deadline_hhmm_utc>   e.g. 0350
Output: BENCH/scaling_run2.json
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CORPUS = "/tmp/spark_graft_bench_corpus_g3_1000000"
N_SMALL, N_BIG = 2, 8
PROBE_EXCLUDE_SLOWER_PCT = 0.15
MIN_ROUNDS = 3

_PROBE_KERNEL = (
    "import numpy as np\n"
    "rng = np.random.default_rng(7)\n"
    "a = rng.random((1100, 1100)); b = rng.random((1100, 1100))\n"
    "for _ in range(14): a = 0.5 * (a @ b) / a.max()\n"
)


def probe() -> float:
    """Fixed-work 8-core host-capability probe; returns wall seconds."""
    t0 = time.monotonic()
    procs = [
        subprocess.Popen(
            ["taskset", "-c", str(core), sys.executable, "-c", _PROBE_KERNEL],
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
        for core in range(8)
    ]
    for p in procs:
        p.wait()
    return time.monotonic() - t0


def one_run(ncpu: int) -> dict:
    cmd = [
        "taskset", "-c", f"0-{ncpu - 1}",
        "spark-submit", "--master", f"local[{ncpu}]",
        "--driver-memory", os.environ.get("SPARK_DRIVER_MEM", "48g"),
        "--conf", f"spark.sql.shuffle.partitions={2 * ncpu}",
        "--conf", "spark.sql.adaptive.enabled=true",
        "--conf", "spark.ui.enabled=false",
        "--py-files", "/tmp/angola_erp_ocr_spark.zip",
        os.path.join(REPO, "bench", "run.py"),
        "--corpus", CORPUS, "--time-only", "--runs", "2",
    ]
    proc = subprocess.run(cmd, capture_output=True, text=True, timeout=3600)
    json_lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if proc.returncode != 0 or not json_lines:
        raise RuntimeError(f"local[{ncpu}] failed rc={proc.returncode}: "
                           f"{proc.stderr[-1500:]}")
    return json.loads(json_lines[-1])


def main() -> None:
    deadline_hhmm = sys.argv[1]
    now = time.gmtime()
    deadline = time.mktime((now.tm_year, now.tm_mon, now.tm_mday,
                            int(deadline_hhmm[:2]), int(deadline_hhmm[2:]),
                            0, 0, 0, 0))
    if deadline < time.mktime(now):  # deadline past midnight rollover
        deadline += 86400.0
    assert os.path.exists(os.path.join(CORPUS, "_DONE")), "corpus missing"
    subprocess.run(["sh", os.path.join(REPO, "tools", "make_pyfiles.sh")],
                   check=True, capture_output=True)

    rounds: list[dict] = []
    # per-round wall estimate refined as rounds complete; start pessimistic
    est_round_s = 720.0
    while len(rounds) < MIN_ROUNDS or time.time() + est_round_s < deadline:
        t0 = time.time()
        p_before = probe()
        a = one_run(N_SMALL)
        p_mid = probe()
        b = one_run(N_BIG)
        p_after = probe()
        eff = b["docs_per_sec"] / (a["docs_per_sec"] * (N_BIG / N_SMALL))
        rounds.append({
            "small_docs_per_sec": round(a["docs_per_sec"], 1),
            "big_docs_per_sec": round(b["docs_per_sec"], 1),
            "efficiency": round(eff, 3),
            "probe_walls_sec": [round(p_before, 2), round(p_mid, 2),
                                round(p_after, 2)],
        })
        est_round_s = max(time.time() - t0, 420.0)
        print(f"round {len(rounds)}: eff={eff:.3f} probes="
              f"{rounds[-1]['probe_walls_sec']}", flush=True)

    all_probes = [w for r in rounds for w in r["probe_walls_sec"]]
    med_probe = statistics.median(all_probes)
    excluded = [i for i, r in enumerate(rounds)
                if any(w > med_probe * (1 + PROBE_EXCLUDE_SLOWER_PCT)
                       for w in r["probe_walls_sec"])]
    included = [i for i in range(len(rounds)) if i not in excluded] or \
        list(range(len(rounds)))
    eff_all = [r["efficiency"] for r in rounds]
    eff_inc = [rounds[i]["efficiency"] for i in included]
    out = {
        "pairing": f"{N_SMALL}v{N_BIG}",
        "corpus": CORPUS,
        "rounds": rounds,
        "probe_median_wall_sec": round(med_probe, 2),
        "exclusion_rule": ("pre-registered (see tools/scaling_run2.py "
                           "docstring, committed before execution): drop "
                           "rounds where any 8-core host probe is >15% "
                           "slower than the run-wide median probe wall"),
        "excluded_rounds": excluded,
        "efficiency_all_rounds": eff_all,
        "best_all": round(max(eff_all), 3),
        "median_all": round(statistics.median(eff_all), 3),
        "best_included": round(max(eff_inc), 3),
        "median_included": round(statistics.median(eff_inc), 3),
        "stopping": "deadline-based (time, not results); min 3 rounds",
    }
    path = os.path.join(REPO, "BENCH", "scaling_run2.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({k: out[k] for k in
                      ("best_all", "median_all", "best_included",
                       "median_included", "excluded_rounds")}))
    print(f"written: {path}")


if __name__ == "__main__":
    main()
