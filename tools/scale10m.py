"""10M-document scale protocol with a pathological 10^4-page skew class
(r5, VERDICT r4 task 1) — protocol v2.

Everything scale-shaped was previously evidenced at 1M docs with heavy
documents capped at 50-300 pages; SCALE.md's skew section claimed the
design survives 10^4-page documents without testing it. This runner is
the test, one order of magnitude up.

PROTOCOL v2 — registered before its first execution; v1 and its result
(BENCH/scale10m_10000000.json at commit 53b3696, wall max/median 1.728
FAIL) stay in git history. Why v1's wall gate was the wrong instrument:

  Diagnosis from v1's own committed lineage (256 partitions, 32 cores):
  docs/partition max/median 1.015, spans/partition max/median 1.147,
  wall-vs-spans correlation 0.08, and ALL 12 slowest partitions had
  partition_id < 32 — the first scheduling wave of a cold local JVM
  (wave-1 median 3,908 ms vs later-wave 2,625 ms; later-waves-only
  ratio 1.486). The data is balanced; the wall ratio measured JIT/codegen
  warm-up, which in local mode lands on 12.5% of tasks (1 of 8 waves).
  On the 8,000-core target, scan/extract stages run ~100 waves
  (SCALE.md §stage-1) and executors are long-lived and JIT-warm, so the
  cold first wave is a local-mode artifact, not plan skew.

  v2 therefore measures (registered BEFORE the v2 run):
  1. DATA-balance gate straight from lineage — the question the
     pathological class actually asks ("can one 10^4-page doc capsize a
     partition?"): spans/partition max/median <= 1.5. Spans measure the
     work/output volume a heavy doc contributes; docs/partition is
     reported but NOT gated (amended before the first 10M v2 execution:
     the 100k smoke showed AQE partition coalescing legitimately leaves
     doc-counts uneven in small outputs — 1.274 at 34 partitions — while
     spans stay balanced; doc COUNT imbalance is not a heavy-doc skew
     signal).
  2. The wall gate (max/median <= 1.5) on a WARM measured pass: one
     untimed-for-the-gate warm-up extract+write precedes it, so the
     measured pass sees a JIT-warm JVM, as every steady-state wave does.
     Cold-pass walls are still reported (cold_* keys), nothing hidden.
     The wall gate is defined at the protocol scale (>= 1M docs): below
     that, median partition walls are a few hundred ms and the ratio
     measures scheduler jitter, not work.
  3. Host probes (bench.host_probe, the r5 official scaling-noise
     instrument) bracket the measured pass — a slow shared-VM window is
     visible in the artifact instead of masquerading as skew. A wall
     reading is PROBE-CLEAN iff both probes are <= 1.15 x the r4 run-2
     reference median (2.94 s, BENCH/scaling_run2.json) — same
     slower-only rule as bench.py's official exclusion. A probe-noisy
     attempt may be repeated on a quieter host; since interference can
     only SLOW the measured pass, retrying until probe-clean cannot
     inflate the result past its noise-free value. Every attempt's JSON
     is recorded.
  4. Span-sequence equality vs the independent golden (gate: 1.0,
     pathological docs checked separately) on the measured pass's
     committed output.
  5. Dominant-shuffle bytes vs a linear-in-docs prediction calibrated at
     the 100k smoke scale (v1 measured 98.5 MB / 100k docs = 985 B/doc;
     lineage-spans form: 56.2 B/span). Gate: measured/predicted in
     [2/3, 1.5] across the 100x extrapolation. v1's model (13.4 rows/doc
     x 110 B x 0.261 parquet-lz4 factor = 385 B/doc) under-predicted 3x
     because shuffle blocks are ROW-wise lz4, not columnar parquet —
     measured in-shuffle density is 56-73 B/span, i.e. ~0.55-0.66x the
     raw row bytes, nowhere near parquet's 0.26x. SCALE.md §stage-2 is
     corrected from this measurement.

Results → BENCH/scale10m_{n}.json (+ one human-readable summary line).

Usage:
    python tools/scale10m.py [n_docs]
    # fast smoke (2 patho docs in 100k):
    SPARK_GRAFT_PATHO_START=50000 SPARK_GRAFT_PATHO_EVERY=25000 \
        python tools/scale10m.py 100000
    # v1-style single cold pass (no warm-up):
    SPARK_GRAFT_SCALE_COLD=1 python tools/scale10m.py 100000
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

EVENT_LOG_DIR = "/tmp/spark-graft-events-scale"

# Linear-in-docs dominant-shuffle model, calibrated at the 100k smoke
# (BENCH/scale10m_100000.json v1: 98.5 MB / 100k docs). The 10M run is a
# 100x extrapolation of this constant.
CAL_BYTES_PER_DOC = float(os.environ.get("SPARK_GRAFT_CAL_BPD", "985"))
PRED_RATIO_LO, PRED_RATIO_HI = 2 / 3, 1.5

SKEW_GATE = 1.5          # wall max/median, measured (warm) pass
DATA_SPANS_GATE = 1.5    # spans/partition max/median (docs: report-only)
SPAN_GATE = 1.0
PROBE_REF_WALL = 2.94    # r4 run-2 median probe wall (BENCH/scaling_run2.json)
PROBE_CLEAN_PCT = 0.15   # slower-only, same rule as bench.py --scaling


def _ratio(mx, md):
    """max/median, or None when the median is 0 (tiny smoke corpora can
    leave AQE-coalesced partitions with 0-ms walls or 0 spans; a
    ZeroDivisionError here would kill the run AFTER the expensive
    measured pass — r5 review finding). A None ratio fails its gate."""
    return round(mx / md, 3) if md else None


def _lineage_stats(rows: list[dict], cpus: int) -> dict:
    """Balance + wave decomposition from write_with_lineage partition rows."""
    walls = sorted(r["wall_ms"] for r in rows)
    docs = sorted(r["docs_out"] for r in rows)
    spans = sorted(r["spans_emitted"] for r in rows)
    med = statistics.median
    wave1 = [r["wall_ms"] for r in rows if r["partition_id"] < cpus]
    later = [r["wall_ms"] for r in rows if r["partition_id"] >= cpus]
    try:
        corr = statistics.correlation(
            [float(r["wall_ms"]) for r in rows],
            [float(r["spans_emitted"]) for r in rows])
    except statistics.StatisticsError:
        corr = None
    return {
        "partitions": len(rows),
        "wall_max_ms": walls[-1],
        "wall_median_ms": med(walls),
        "wall_max_over_median": _ratio(walls[-1], med(walls)),
        "docs_max_over_median": _ratio(docs[-1], med(docs)),
        "spans_max_over_median": _ratio(spans[-1], med(spans)),
        "wall_spans_correlation": round(corr, 3) if corr is not None else None,
        "wave1_wall_median_ms": med(wave1) if wave1 else None,
        "later_waves_wall_median_ms": med(later) if later else None,
        "later_waves_wall_max_over_median":
            _ratio(max(later), med(later)) if later else None,
    }


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    cold_only = os.environ.get("SPARK_GRAFT_SCALE_COLD") == "1"

    os.makedirs(EVENT_LOG_DIR, exist_ok=True)
    from angola_erp_ocr_spark import synth
    from angola_erp_ocr_spark.plans.lineage import write_with_lineage
    from angola_erp_ocr_spark.plans.pipeline import extract
    from angola_erp_ocr_spark.session import get_spark
    from angola_erp_ocr_spark.stagelog import event_log_path, parse_stages
    from bench import host_probe
    from pyspark.sql import functions as F

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark(
        app_name="scale10m", master=f"local[{cpus}]",
        shuffle_partitions=8 * cpus,  # bigger corpus → more, AQE coalesces
        extra_conf={
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": f"file://{EVENT_LOG_DIR}",
            # single plain-JSON file (Spark 4 defaults to a rolling zstd
            # directory, which stagelog can't stream-parse)
            "spark.eventLog.rolling.enabled": "false",
            "spark.eventLog.compress": "false",
        })
    spark.sparkContext.setLogLevel("ERROR")

    patho = dict(pages=synth.PATHO_PAGES, start=synth.PATHO_START,
                 every=synth.PATHO_EVERY)
    patho_ids = synth.patho_doc_ids(n_docs)
    n_patho = len(patho_ids)
    corpus = synth.scale_corpus_dir(n_docs)
    tag = corpus.rsplit("_corpus_g3_", 1)[1]
    marker = os.path.join(corpus, "_DONE")
    t_gen = 0.0
    if not os.path.exists(marker):
        t0 = time.monotonic()
        raw, golden, media = synth.build_corpus(
            spark, n_docs, partitions=8 * cpus)
        raw.write.mode("overwrite").parquet(f"{corpus}/documents_raw")
        golden.write.mode("overwrite").parquet(
            f"{corpus}/documents_expected")
        media.write.mode("overwrite").parquet(f"{corpus}/media_pages")
        t_gen = time.monotonic() - t0
        open(marker, "w").close()
        print(f"corpus materialized in {t_gen:.0f}s: {corpus}", flush=True)

    raw = spark.read.parquet(f"{corpus}/documents_raw")
    media = spark.read.parquet(f"{corpus}/media_pages")
    golden = spark.read.parquet(f"{corpus}/documents_expected")

    def one_pass(out_dir: str, run_id: str) -> tuple[dict, float]:
        t0 = time.monotonic()
        stats = write_with_lineage(
            extract(raw.select("doc_id", "spans"), media), out_dir, run_id)
        return stats, time.monotonic() - t0

    # ---- pass 1: cold (JIT warm-up; timed + reported, not the wall gate)
    cold = None
    if not cold_only:
        cstats, cwall = one_pass(f"/tmp/spark_graft_scale_warm_{tag}",
                                 f"scale-warm-{tag}")
        cold = {"wall_sec": round(cwall, 1),
                **{f"{k}": v for k, v in
                   _lineage_stats(cstats["partition_rows"], cpus).items()}}
        print(f"cold pass: {cwall:.1f}s wall, "
              f"max/median {cold['wall_max_over_median']}", flush=True)

    # ---- pass 2 (or only pass when cold_only): the measured pass
    out_dir = f"/tmp/spark_graft_scale_out_{tag}"
    probe_before = host_probe()
    e0 = int(time.time() * 1000)
    stats, wall = one_pass(out_dir, f"scale-{tag}")
    e1 = int(time.time() * 1000)
    probe_after = host_probe()

    lin = _lineage_stats(stats["partition_rows"], cpus)

    # span equality from the WRITTEN table (the committed artifact, not a
    # recompute), pathological docs included
    written = spark.read.parquet(f"{out_dir}/documents_extracted")
    row = (
        written.alias("o").join(golden.alias("g"), "doc_id")
        .agg(F.count(F.lit(1)).alias("n"),
             F.sum((F.col("o.spans") == F.col("g.spans")).cast("int"))
             .alias("ok"))
        .collect()[0]
    )
    span_rate = (row["ok"] or 0) / max(row["n"], 1)
    # the pathological docs specifically (ids from synth.patho_doc_ids,
    # the one definition of the membership rule)
    if n_patho:
        prow = (
            written.alias("o").join(golden.alias("g"), "doc_id")
            .where(F.col("doc_id").isin(patho_ids))
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum((F.col("o.spans") == F.col("g.spans")).cast("int"))
                 .alias("ok"),
                 F.max(F.size("o.spans")).alias("max_spans"))
            .collect()[0]
        )
        patho_check = dict(n=prow["n"], ok=prow["ok"],
                           max_spans=prow["max_spans"])
    else:
        patho_check = None

    # dominant-shuffle bytes (measured pass window) vs the calibrated
    # linear model
    log = event_log_path(spark)
    stages = parse_stages(log, t_min_ms=e0 - 50, t_max_ms=e1 + 50) \
        if log else []
    shuffle_write_mb = max((s["shuffle_write_mb"] for s in stages),
                           default=0.0)
    pred_mb = CAL_BYTES_PER_DOC * n_docs / 1e6
    ratio = shuffle_write_mb / pred_mb if pred_mb else None
    result = {
        "protocol": "v2-warm" if not cold_only else "v1-cold",
        "n_docs": n_docs,
        "n_pathological_docs": n_patho,
        "pathological_pages_per_doc": patho["pages"] if n_patho else 0,
        "corpus": corpus,
        "corpus_gen_wall_sec": round(t_gen, 1),
        "extract_write_wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "docs_out": stats["docs_out"],
        "spans_emitted": stats["spans_emitted"],
        "host_probe_walls_sec": [round(probe_before, 2),
                                 round(probe_after, 2)],
        "probe_clean": bool(
            max(probe_before, probe_after)
            <= PROBE_REF_WALL * (1 + PROBE_CLEAN_PCT)),
        "lineage": lin,
        "cold_pass": cold,
        "skew_gate_wall_1_5": bool(
            lin["wall_max_over_median"] is not None
            and lin["wall_max_over_median"] <= SKEW_GATE),
        "skew_gate_spans_1_5": bool(
            lin["spans_max_over_median"] is not None
            and lin["spans_max_over_median"] <= DATA_SPANS_GATE),
        "span_equality_rate": span_rate,
        "span_gate_1_0": span_rate >= SPAN_GATE,
        "pathological_docs_check": patho_check,
        "dominant_shuffle_write_mb_measured": round(shuffle_write_mb, 1),
        "dominant_shuffle_mb_predicted": round(pred_mb, 1),
        "shuffle_prediction_ratio": round(ratio, 3) if ratio else None,
        "shuffle_prediction_gate": bool(
            ratio is not None and PRED_RATIO_LO <= ratio <= PRED_RATIO_HI),
        "prediction_model": (f"{CAL_BYTES_PER_DOC:.0f} B/doc, calibrated at "
                             "the 100k smoke (scale10m_100000.json v1); "
                             "gate [0.667, 1.5]"),
        "cpus": cpus,
        "stage_table": [
            {k: s[k] for k in ("name", "tasks", "wall_ms", "exec_run_ms",
                               "shuffle_read_mb", "shuffle_write_mb")}
            for s in sorted(stages, key=lambda s: -s["wall_ms"])[:12]],
    }
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    out_json = os.path.join(REPO, "BENCH", f"scale10m_{n_docs}.json")
    with open(out_json, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items()
                      if k != "stage_table"}), flush=True)
    print(f"wrote {out_json}")
    spark.stop()


if __name__ == "__main__":
    main()
