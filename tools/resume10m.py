"""Kill-and-resume demonstration at the 10M-doc protocol scale (r5).

The north rule requires the pipeline to be "resumable from checkpoint
with per-partition lineage ... so any failed run resumes from the last
committed snapshot". The snapshot/resume machinery is pytest-proven at
small scale (tests/test_resume_lineage.py: append-accumulates, crash
invisibility, anti-join resume); this tool exercises the same claim
END-TO-END at 10M docs with a real SIGKILL:

  phase "run"    — extract the corpus in ``--chunks`` hash-partitioned
                   chunks (xxhash64(doc_id) % chunks), committing one
                   snapshot per chunk — the production shape for a long
                   job that wants restartability finer than
                   all-or-nothing. With RESUME10M_KILL_AFTER=<sec> a
                   watchdog thread SIGKILLs the WHOLE process group
                   (driver + JVM + python workers) mid-flight — a real
                   crash, not a graceful stop.
  phase "resume" — read the committed snapshots, anti-join the corpus
                   (plans.pipeline.resume_filter), extract ONLY the
                   missing documents, commit, then verify:
                   * the killed chunk's partial write is INVISIBLE
                     (committed count before resume = whole chunks);
                   * final span equality vs the independent golden = 1.0
                     over all 10M docs (pathological docs included);
                   * lineage carries both run phases' rows.
                   Writes BENCH/resume10m_<n>.json.

Usage:
    RESUME10M_KILL_AFTER=240 python tools/resume10m.py run [n_docs]
    # (process dies by SIGKILL — that is the point)
    python tools/resume10m.py resume [n_docs]
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHUNKS = int(os.environ.get("RESUME10M_CHUNKS", "4"))


def _corpus_dir(n_docs: int) -> str:
    # shared definition — the reader can never disagree with the writer
    # (tools/scale10m.py) on which corpus a run used
    from angola_erp_ocr_spark.synth import scale_corpus_dir
    return scale_corpus_dir(n_docs)


def main() -> None:
    phase = sys.argv[1] if len(sys.argv) > 1 else "run"
    n_docs = int(sys.argv[2]) if len(sys.argv) > 2 else 10_000_000
    out_dir = f"/tmp/spark_graft_resume_{n_docs}"
    table_dir = f"{out_dir}/documents_extracted"

    kill_after = float(os.environ.get("RESUME10M_KILL_AFTER", "0"))
    if phase == "run" and kill_after:
        def _kill():
            time.sleep(kill_after)
            print(f"WATCHDOG: SIGKILL process group at t={kill_after}s",
                  flush=True)
            os.killpg(os.getpgid(0), signal.SIGKILL)
        threading.Thread(target=_kill, daemon=True).start()

    from pyspark.sql import functions as F

    from angola_erp_ocr_spark.plans.lineage import lineage_rows
    from angola_erp_ocr_spark.plans.pipeline import extract, resume_filter
    from angola_erp_ocr_spark.plans.snapshot import (read_snapshots,
                                                     snapshot_append)
    from angola_erp_ocr_spark.session import get_spark

    corpus = _corpus_dir(n_docs)
    if not os.path.exists(os.path.join(corpus, "_DONE")):
        raise SystemExit(f"corpus missing: {corpus} (run tools/scale10m.py "
                         f"{n_docs} first)")
    spark = get_spark(app_name=f"resume10m-{phase}")
    spark.sparkContext.setLogLevel("ERROR")
    raw = spark.read.parquet(f"{corpus}/documents_raw").select(
        "doc_id", "spans")
    media = spark.read.parquet(f"{corpus}/media_pages")
    chunk_col = F.pmod(F.xxhash64("doc_id"), F.lit(CHUNKS))

    if phase == "run":
        import shutil
        shutil.rmtree(out_dir, ignore_errors=True)
        for c in range(CHUNKS):
            t0 = time.monotonic()
            part = raw.where(chunk_col == c)
            manifest = snapshot_append(
                extract(part, media), table_dir, f"chunk-{c}")
            lineage_rows(
                spark.read.parquet(manifest["data_dir"]), f"chunk-{c}"
            ).write.mode("append").parquet(f"{out_dir}/lineage")
            print(f"chunk {c}: committed snapshot seq={manifest['seq']} "
                  f"rows={manifest['n_rows']} in "
                  f"{time.monotonic() - t0:.1f}s", flush=True)
        print("run phase completed WITHOUT dying — rerun with a smaller "
              "RESUME10M_KILL_AFTER for the interruption demo", flush=True)
        spark.stop()
        return

    # ---- phase: resume
    committed_before = read_snapshots(spark, table_dir)
    n_before = committed_before.count() if committed_before is not None else 0
    t0 = time.monotonic()
    todo = (resume_filter(raw, committed_before)
            if committed_before is not None else raw)
    n_todo = todo.count()
    manifest = snapshot_append(extract(todo, media), table_dir, "resume")
    lineage_rows(
        spark.read.parquet(manifest["data_dir"]), "resume"
    ).write.mode("append").parquet(f"{out_dir}/lineage")
    resume_wall = time.monotonic() - t0

    final = read_snapshots(spark, table_dir)
    golden = spark.read.parquet(f"{corpus}/documents_expected")
    row = (final.alias("o").join(golden.alias("g"), "doc_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum((F.col("o.spans") == F.col("g.spans")).cast("int"))
                .alias("ok")).collect()[0])
    lineage = spark.read.parquet(f"{out_dir}/lineage")
    by_run = {r["run_id"]: r["n"] for r in lineage.groupBy("run_id")
              .agg(F.count(F.lit(1)).alias("n")).collect()}
    result = {
        "n_docs": n_docs,
        "chunks": CHUNKS,
        "committed_docs_before_resume": n_before,
        "resumed_docs": n_todo,
        "resume_wall_sec": round(resume_wall, 1),
        "final_committed_docs": row["n"],
        "span_equality_rate": (row["ok"] or 0) / max(row["n"], 1),
        "no_duplicates": bool(
            final.count() == final.select("doc_id").distinct().count()),
        "partial_write_invisible": bool(n_before + n_todo == n_docs),
        "lineage_partition_rows_by_run": by_run,
    }
    dst = os.path.join(REPO, "BENCH", f"resume10m_{n_docs}.json")
    with open(dst, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result), flush=True)
    print(f"wrote {dst}")
    spark.stop()


if __name__ == "__main__":
    main()
