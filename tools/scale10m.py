"""10M-document scale protocol with a pathological 10^4-page skew class
(r5, VERDICT r4 task 1).

Everything scale-shaped was previously evidenced at 1M docs with heavy
documents capped at 50-300 pages; SCALE.md's skew section claimed the
design survives 10^4-page documents without testing it. This runner is
the test, one order of magnitude up:

  1. materializes a deterministic corpus of N docs (default 10M) that
     includes synth's pathological class — one 10^4-page document per
     million docs starting at id 2M (8 such docs at N=10M, each carrying
     ~50k golden spans);
  2. runs the UNMODIFIED flagship ``extract`` over it and writes the
     result through ``write_with_lineage`` — the committed lineage rows
     ARE the skew evidence (gate: partition wall max/median ≤ 1.5);
  3. verifies span-sequence equality against the independently generated
     golden table (gate: pass rate = 1.0, pathological docs included);
  4. parses the Spark event log and checks the measured dominant
     shuffle's bytes against SCALE.md §stage-2's prediction model
     (rows/doc × bytes/row × lz4 factor), closing the loop between the
     capacity plan and a measured run.

Results → BENCH/scale10m.json (+ one human-readable summary line).

Usage:
    SPARK_DRIVER_MEM=48g python tools/scale10m.py [n_docs]
    # fast smoke (2 patho docs in 100k):
    SPARK_GRAFT_PATHO_START=50000 SPARK_GRAFT_PATHO_EVERY=25000 \
        python tools/scale10m.py 100000
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

# SCALE.md §stage-2 prediction model, measured on the 1M corpus:
# candidate rows/doc and bytes/row pre-compression, lz4 factor from the
# 230 TB → ~60 TB compressed estimate.
PRED_ROWS_PER_DOC = 13.4
PRED_BYTES_PER_ROW = 110
PRED_LZ4_FACTOR = 60 / 230

SKEW_GATE = 1.5
SPAN_GATE = 1.0


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000

    os.makedirs(EVENT_LOG_DIR, exist_ok=True)
    from angola_erp_ocr_spark import synth
    from angola_erp_ocr_spark.plans.lineage import write_with_lineage
    from angola_erp_ocr_spark.plans.pipeline import extract
    from angola_erp_ocr_spark.session import get_spark
    from angola_erp_ocr_spark.stagelog import event_log_path, parse_stages
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
    n_patho = max(0, (n_docs - 1 - patho["start"]) // patho["every"] + 1) \
        if n_docs > patho["start"] else 0
    tag = f"{n_docs}_p{patho['pages']}s{patho['start']}e{patho['every']}"
    corpus = f"/tmp/spark_graft_scale_corpus_g3_{tag}"
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

    out_dir = f"/tmp/spark_graft_scale_out_{tag}"
    run_id = f"scale-{tag}"
    e0 = int(time.time() * 1000)
    t0 = time.monotonic()
    stats = write_with_lineage(
        extract(raw.select("doc_id", "spans"), media), out_dir, run_id)
    wall = time.monotonic() - t0
    e1 = int(time.time() * 1000)

    walls = sorted(r["wall_ms"] for r in stats["partition_rows"])
    med_wall = statistics.median(walls)
    skew = walls[-1] / med_wall if med_wall > 0 else None

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
    # the pathological docs specifically
    if n_patho:
        patho_ids = [f"doc{patho['start'] + k * patho['every']:08d}"
                     for k in range(n_patho)]
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

    # dominant-shuffle bytes vs SCALE.md §stage-2 prediction
    log = event_log_path(spark)
    stages = parse_stages(log, t_min_ms=e0 - 50, t_max_ms=e1 + 50) \
        if log else []
    shuffle_write_mb = max((s["shuffle_write_mb"] for s in stages),
                           default=0.0)
    pred_mb = (PRED_ROWS_PER_DOC * n_docs * PRED_BYTES_PER_ROW
               * PRED_LZ4_FACTOR) / 1e6
    result = {
        "n_docs": n_docs,
        "n_pathological_docs": n_patho,
        "pathological_pages_per_doc": patho["pages"] if n_patho else 0,
        "corpus": corpus,
        "corpus_gen_wall_sec": round(t_gen, 1),
        "extract_write_wall_sec": round(wall, 1),
        "docs_per_sec": round(n_docs / wall, 1),
        "docs_out": stats["docs_out"],
        "spans_emitted": stats["spans_emitted"],
        "lineage_partitions": stats["partitions"],
        "partition_wall_max_ms": walls[-1],
        "partition_wall_median_ms": med_wall,
        "partition_wall_max_over_median": round(skew, 3) if skew else None,
        "skew_gate_1_5": bool(skew is not None and skew <= SKEW_GATE),
        "span_equality_rate": span_rate,
        "span_gate_1_0": span_rate >= SPAN_GATE,
        "pathological_docs_check": patho_check,
        "dominant_shuffle_write_mb_measured": round(shuffle_write_mb, 1),
        "dominant_shuffle_mb_predicted": round(pred_mb, 1),
        "shuffle_prediction_ratio": (round(shuffle_write_mb / pred_mb, 3)
                                     if pred_mb else None),
        "prediction_model": (f"{PRED_ROWS_PER_DOC} rows/doc x "
                             f"{PRED_BYTES_PER_ROW} B x lz4 "
                             f"{PRED_LZ4_FACTOR:.3f} (SCALE.md stage 2)"),
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
