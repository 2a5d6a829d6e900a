"""Per-partition lineage rows: (run_id, partition_id, docs_in, docs_out,
spans_emitted, wall_ms) — the resumability/skew audit trail (SURVEY §4.4,
replacing the reference's frappe.publish_realtime progress events,
ocr_read.py:105, 176-187).

Because Spark pipelines narrow stages, timing the iteration of a partition
inside ``mapInPandas`` measures the real upstream compute for that
partition — the max/median wall_ms ratio across partitions is the skew
report the bench records.
"""

from __future__ import annotations

import time
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from ..schema import LINEAGE


def lineage_rows(extracted: DataFrame, run_id: str) -> DataFrame:
    """Consume documents_extracted; emit one lineage row per partition."""

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        docs = 0
        spans = 0
        for pdf in batches:
            docs += len(pdf)
            spans += int(pdf["spans"].map(len).sum()) if len(pdf) else 0
        wall_ms = int((time.monotonic() - t0) * 1000)
        pid = TaskContext.get().partitionId() if TaskContext.get() else -1
        yield pd.DataFrame(
            [dict(run_id=run_id, partition_id=pid, docs_in=docs, docs_out=docs,
                  spans_emitted=spans, wall_ms=wall_ms)],
            columns=["run_id", "partition_id", "docs_in", "docs_out",
                     "spans_emitted", "wall_ms"],
        )

    return extracted.mapInPandas(per_partition, schema=LINEAGE)


def write_with_lineage(extracted: DataFrame, out_dir: str, run_id: str) -> dict:
    """Write extracted spans + lineage (parquet; Iceberg's writeTo would slot
    in here when the runtime jars are present). Returns summary stats."""
    extracted.write.mode("overwrite").parquet(f"{out_dir}/documents_extracted")
    spark = extracted.sparkSession
    reread = spark.read.parquet(f"{out_dir}/documents_extracted")
    lin = lineage_rows(reread, run_id)
    lin.write.mode("append").parquet(f"{out_dir}/lineage")
    stats = (
        spark.read.parquet(f"{out_dir}/lineage")
        .where(f"run_id = '{run_id}'")
        .agg({"docs_out": "sum", "spans_emitted": "sum", "wall_ms": "max"})
        .collect()[0]
    )
    return {
        "docs_out": stats["sum(docs_out)"],
        "spans_emitted": stats["sum(spans_emitted)"],
        "max_partition_wall_ms": stats["max(wall_ms)"],
    }
