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
    """Write extracted spans + lineage in ONE scan (Iceberg's writeTo would
    slot in for the data write when the runtime jars are present).

    The old shape re-read the full output to compute lineage — a second
    scan of the result set, a real extra pass at 100 TB (VERDICT r2).
    Here a pass-through ``mapInPandas`` wrapper counts each partition
    WHILE the write consumes it, and each task drops its counters as a
    tiny side file next to the table (tmp + atomic rename, named by
    partition id, so a task retry overwrites rather than duplicates).
    The driver then folds the side files into the ``lineage`` parquet
    table — same schema and audit semantics, one scan of the data.
    ``out_dir`` must be storage every executor can reach (it already must
    be: the table itself is written there).
    """
    import glob
    import json
    import os
    import uuid

    raw_dir = os.path.join(out_dir, "lineage_raw", run_id)
    os.makedirs(raw_dir, exist_ok=True)
    schema = extracted.schema

    def counted(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from pyspark import TaskContext

        t0 = time.monotonic()
        docs = 0
        spans = 0
        for pdf in batches:
            docs += len(pdf)
            spans += int(pdf["spans"].map(len).sum()) if len(pdf) else 0
            yield pdf
        wall_ms = int((time.monotonic() - t0) * 1000)
        ctx = TaskContext.get()
        pid = ctx.partitionId() if ctx else -1
        row = dict(run_id=run_id, partition_id=pid, docs_in=docs,
                   docs_out=docs, spans_emitted=spans, wall_ms=wall_ms)
        tmp = os.path.join(raw_dir, f".p{pid}.{uuid.uuid4().hex[:8]}.tmp")
        with open(tmp, "w", encoding="utf-8") as f:
            json.dump(row, f)
        os.replace(tmp, os.path.join(raw_dir, f"p{pid}.json"))

    wrapped = extracted.mapInPandas(counted, schema=schema)
    wrapped.write.mode("overwrite").parquet(f"{out_dir}/documents_extracted")

    spark = extracted.sparkSession
    rows = []
    for p in sorted(glob.glob(os.path.join(raw_dir, "p*.json"))):
        with open(p, encoding="utf-8") as f:
            rows.append(json.load(f))
    lin = spark.createDataFrame(rows, schema=LINEAGE)
    lin.write.mode("append").parquet(f"{out_dir}/lineage")
    return {
        "docs_out": sum(r["docs_out"] for r in rows),
        "spans_emitted": sum(r["spans_emitted"] for r in rows),
        "max_partition_wall_ms": max((r["wall_ms"] for r in rows),
                                     default=None),
    }
