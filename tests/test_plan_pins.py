"""Plan-shape + skew regression tripwires (r5, VERDICT r4 task 6).

Before this file, an accidental physical-plan change — a lost broadcast, a
new exchange, a filter that stopped pushing down — surfaced only when a
human read the next round's bench artifacts. Now it fails a pytest:

* every headline query's normalized plan digest must match the committed
  pin (BENCH/plans_pinned.json; regenerate after an INTENTIONAL change
  with `python tools/pin_plans.py` and explain the diff in the commit);
* the flagship extraction's per-partition lineage must stay balanced
  (max/median wall within the committed bound) on the deterministic
  corpus — the small-scale canary for the skew defenses SCALE.md budgets
  at 100 TB.
"""
from __future__ import annotations

import json
import os
import statistics

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = "/root/testdata/sf0.01"

# committed skew bound: measured max/median partition wall is ~1.2 at 1M
# docs (BENCH/BASELINE.md) and < 2 on the 2k-doc corpus; 3.0 trips only on
# a real imbalance (a lost page-level repartition, a hot-key regression),
# not on scheduler jitter. Guarded by a median floor — ratios of
# sub-30 ms walls are timer noise, not skew.
SKEW_MAX_OVER_MEDIAN = 3.0
MEDIAN_FLOOR_MS = 30


def test_headline_plan_digests_match_pins(spark):
    import __spark_entry__ as contract

    from angola_erp_ocr_spark.planpin import (PIN_FILE, PINNED_QUERIES,
                                              plan_digest)

    with open(os.path.join(REPO, PIN_FILE)) as f:
        pinned = json.load(f)["digests"]
    assert sorted(pinned) == sorted(PINNED_QUERIES)
    qs = contract.queries()
    moved = {}
    for name in PINNED_QUERIES:
        got = plan_digest(qs[name](spark, SF_DIR))
        if got != pinned[name]:
            moved[name] = (pinned[name], got)
    assert not moved, (
        f"physical plan shape changed for {sorted(moved)}: {moved} — if "
        f"intentional, regenerate with `python tools/pin_plans.py` and "
        f"explain the plan diff (BENCH/plans_pinned_full.json) in the "
        f"commit message")


def test_flagship_partition_walls_stay_balanced(spark, tmp_path):
    """Skew canary: per-partition lineage of a real extract run."""
    from angola_erp_ocr_spark.plans.lineage import write_with_lineage
    from angola_erp_ocr_spark.plans.pipeline import extract
    from angola_erp_ocr_spark.synth import build_corpus

    raw, _golden, media = build_corpus(spark, 6000)
    # pin the reducer count (AQE coalesces the tiny test corpus to one
    # partition otherwise); the hash partitioning on doc_id is the same
    # key the production plan shuffles on, so a hot-key regression shows
    # up as one partition's wall dwarfing the median
    extracted = extract(raw, media).repartition(8, "doc_id")
    stats = write_with_lineage(extracted, str(tmp_path / "out"),
                               run_id="skew-canary")
    walls = sorted(r["wall_ms"] for r in stats["partition_rows"])
    # ≥2 non-empty write partitions (AQE may still merge reducers on the
    # tiny test corpus; the BALANCE across whatever ran is the invariant)
    assert len(walls) >= 2
    med = statistics.median(walls)
    if med >= MEDIAN_FLOOR_MS:
        assert walls[-1] / med <= SKEW_MAX_OVER_MEDIAN, (
            f"partition wall skew {walls[-1]}/{med} exceeds "
            f"{SKEW_MAX_OVER_MEDIAN} — a page-level parallelism or "
            f"partitioning regression")
    # every partition emitted, none silently empty-crashed
    assert stats["docs_out"] == 6000


def test_salting_escape_hatch_spreads_pathological_doc(spark):
    """SCALE.md's 10^4-page escape hatch, tested (r5 VERDICT task 1):
    a single document's 10,000 pages, arriving doc-clustered in ONE input
    partition, spread near-uniformly after repartition_pages_by_ref —
    max/median partition load ≤ 1.5, every partition non-empty."""
    from pyspark.sql import functions as F

    from angola_erp_ocr_spark.plans.scale import repartition_pages_by_ref

    pages = spark.range(0, 10_000, 1, 1).select(
        F.format_string("page://patho/%d", F.col("id")).alias("media_ref"),
        F.lit(0).alias("page_no"))
    spread = repartition_pages_by_ref(pages, 32)
    counts = sorted(
        r["n"] for r in spread.groupBy(
            F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("n")).collect())
    assert len(counts) == 32                     # no empty executor slots
    med = counts[len(counts) // 2]
    assert counts[-1] / med <= 1.5, f"page spread skewed: {counts}"


def test_worker_channel_is_unix_domain_socket(spark):
    """Config tripwire (r5): the JVM↔Python-worker channel must stay on
    Unix domain sockets. Loopback TCP on this host livelocks under the
    bidirectional Arrow pressure of a long mapInPandas stage (measured at
    the 10M protocol runs: dropped 64 KB segments against a collapsed
    5 KB receive window, rto backed off to 120 s, stage hung on one task
    — BENCH/ANALYSIS.md §Round-5). Losing this conf would resurface as a
    probabilistic multi-minute hang at scale, far from the cause."""
    assert (spark.conf.get("spark.python.unix.domain.socket.enabled")
            == "true")
