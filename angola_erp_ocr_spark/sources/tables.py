"""Sources & sinks (SURVEY §2.1 S1–S4, K1–K3).

The reference resolves ERP-relative file paths per request and re-reads
every file from disk (S1, ocr_read.py:107-121 + 8 duplicated copies in
api/util.py). Here paths are a pure column expression and bytes arrive
either as a lake table scan or a `binaryFile` directory read — no per-row
I/O anywhere.

Writes target Iceberg when the runtime jars are present (`writeTo`), else
a parquet directory with the same append/overwrite semantics — the
resume/lineage discipline (plans/lineage.py) is identical either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def resolve_path(col, base: str = "/srv/erp"):
    """S1 (ocr_read.py:107-121): normalize ERP path conventions.

    ``/files/…``, ``/private/files/…``, ``/assets/…`` are site-relative;
    absolute paths and http(s) URLs pass through; bare names live under
    ``/files/``. Pure expression — Catalyst constant-folds the base.
    """
    return (
        F.when(col.rlike("^https?://"), col)
        .when(
            col.startswith("/files/")
            | col.startswith("/private/files/")
            | col.startswith("/assets/"),
            F.concat(F.lit(base), col),
        )
        .when(col.startswith("/"), col)
        .otherwise(F.concat(F.lit(base + "/files/"), col))
    )


def read_documents(spark: SparkSession, source: str) -> DataFrame:
    """Scan the documents table: an Iceberg/catalog table name or a
    parquet path. Predicate pushdown / partition pruning apply either way.
    """
    if os.path.sep in source or source.endswith(".parquet"):
        return spark.read.parquet(source)
    return spark.read.table(source)


def read_binary_media(spark: SparkSession, path: str,
                      glob: str = "*") -> DataFrame:
    """S2-adjacent ingest: raw page images / PDFs as binary rows
    (path, modificationTime, length, content) via Spark's binaryFile
    source — the bulk-load path that turns a file dump into the
    media_pages table."""
    return (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", glob)
        .load(path)
    )


def _iceberg_available(df: DataFrame, table: str) -> bool:
    try:
        df.sparkSession.catalog.tableExists(table)
        conf = df.sparkSession.conf
        return any(
            "iceberg" in (conf.get(k, "") or "")
            for k in ("spark.sql.extensions",)
        )
    except Exception:
        return False


def write_documents(df: DataFrame, target: str, mode: str = "append") -> None:
    """K1/K2 sink: Iceberg `writeTo` when the runtime is present, else a
    parquet directory with identical semantics (the sandbox path)."""
    if os.path.sep not in target and _iceberg_available(df, target):
        w = df.writeTo(target)
        (w.append() if mode == "append" else w.createOrReplace())
        return
    df.write.mode(mode).parquet(target)


def write_csv_debug(df: DataFrame, path: str) -> None:
    """K3 (util/ocr_pdf.py:214-220): debug CSV beside the pipeline."""
    df.write.mode("overwrite").option("header", "true").csv(path)
