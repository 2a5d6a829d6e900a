"""The flagship extraction plan: documents_raw → documents_extracted.

One declarative DAG (SURVEY §3.1 "Spark restatement"):

    documents(doc_id, spans)
      → posexplode                              (span rows)
      → segment ids (cumulative media count)    (window)
      ├ digital text spans: parse "x,y|content" (regexp, JVM)
      └ media spans: join media_pages → mapInPandas OCR decode (D3 words)
          → conf gate → line assembly (hash agg) → P6 normalize
      → union candidates
      → boilerplate strip (AVOID_RE + repeated-block ≥k per doc)
      → total order (seg, rank, y, x) → offsets (window)
      → re-assemble array<span> per doc (hash agg, sort_array)

Scale notes (100 TB / 10^12 docs):
  * The unit of parallelism through the OCR stage is the *page*, not the
    doc — a 300-page doc fans out to 300 independent rows before any
    grouping, so heavy docs can't capsize a task (SURVEY §4 skew defense).
  * Joins: spans↔media_pages is an equi-join on media_ref (unique per page,
    no hot keys). All dimension joins elsewhere broadcast.
  * The only per-doc shuffle is the final assembly groupBy(doc_id); its
    payload is already reduced to final span structs.
  * Everything before/after the single mapInPandas stage is whole-stage
    codegen (regex, windows, aggregations).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import normalize_col
from ..operators import layout
from ..operators.ocr import assemble_lines, ocr_words, readable_words

SPAN_POS_RE = r"^(\d+),(\d+)\|"


def explode_spans(documents: DataFrame) -> DataFrame:
    """documents(doc_id, spans) → span rows with segment ids."""
    s = documents.select(
        "doc_id", F.posexplode("spans").alias("pos", "span")
    ).select(
        "doc_id",
        F.col("span.kind").alias("kind"),
        F.col("span.text").alias("text"),
        F.col("span.media_ref").alias("media_ref"),
        F.col("span.offset").alias("offset"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("offset")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return s.withColumn(
        "seg", F.sum(F.when(F.col("kind") == "media", 1).otherwise(0)).over(w)
    )


def digital_candidates(span_rows: DataFrame) -> DataFrame:
    """Parse positioned digital text spans "x,y|content" → line candidates."""
    t = span_rows.where(F.col("kind") == "text")
    # nullif-guarded parse: a span without the "x,y|" prefix must NOT abort
    # the job (reference R5 crash-stops become QA-tolerant rows; at 10^12
    # docs a single malformed row can't be allowed to kill the run). Lines
    # with unparseable coords sort after positioned lines (nulls last).
    return t.select(
        "doc_id",
        "seg",
        F.lit(2).alias("rank"),
        F.nullif(F.regexp_extract("text", SPAN_POS_RE, 2), F.lit(""))
        .cast("int").alias("y"),
        F.nullif(F.regexp_extract("text", SPAN_POS_RE, 1), F.lit(""))
        .cast("int").alias("x"),
        F.regexp_replace("text", SPAN_POS_RE, "").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )


def media_candidates(span_rows: DataFrame, media_pages: DataFrame) -> DataFrame:
    """Media markers + OCR-decoded, normalized line candidates."""
    markers = span_rows.where(F.col("kind") == "media").select(
        "doc_id", "seg", "media_ref"
    )
    marker_rows = markers.select(
        "doc_id", "seg", F.lit(0).alias("rank"),
        F.lit(-1).alias("y"), F.lit(-1).alias("x"),
        F.lit("").alias("text"), "media_ref",
    )
    pages = media_pages.join(markers.select("media_ref"), "media_ref", "left_semi")
    lines = assemble_lines(readable_words(ocr_words(pages)))
    decoded = (
        lines.withColumn("text", normalize_col(F.col("text")))
        .join(markers, "media_ref")  # page → (doc_id, seg); media_ref unique
        .select(
            "doc_id", "seg", F.lit(1).alias("rank"), "y", "x", "text", "media_ref"
        )
    )
    return marker_rows.unionByName(decoded)


def extract(documents: DataFrame, media_pages: DataFrame | None = None,
            repeat_k: int = 3) -> DataFrame:
    """Full extraction → documents_extracted(doc_id, spans)."""
    rows = explode_spans(documents)
    cands = digital_candidates(rows)
    if media_pages is not None:
        cands = cands.unionByName(media_candidates(rows, media_pages))

    # boilerplate suppression applies to lines (rank>0); markers always kept
    lines = layout.strip_boilerplate(
        cands.where(F.col("rank") > 0), scope=["doc_id"], repeat_k=repeat_k
    )
    kept = cands.where(F.col("rank") == 0).unionByName(lines)

    order_w = Window.partitionBy("doc_id").orderBy(
        F.col("seg").asc(), F.col("rank").asc(),
        F.col("y").asc_nulls_last(), F.col("x").asc_nulls_last(),
        F.col("text").asc(),  # final tiebreak keeps the order total
    )
    spans = kept.withColumn("offset", F.row_number().over(order_w) - 1).select(
        "doc_id",
        F.struct(
            F.when(F.col("rank") == 0, F.lit("media")).otherwise(F.lit("text"))
            .alias("kind"),
            F.col("text"),
            F.col("media_ref"),
            F.col("offset").cast("int").alias("offset"),
        ).alias("span"),
    )
    return spans.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(
                F.collect_list(F.struct(F.col("span.offset").alias("o"),
                                        F.col("span").alias("s")))
            ),
            lambda e: e["s"],
        ).alias("spans")
    )


def resume_filter(documents: DataFrame, committed: DataFrame) -> DataFrame:
    """Anti-join raw input against already-committed doc_ids (SURVEY §4.4):
    restart processes only the missing documents."""
    return documents.join(committed.select("doc_id"), "doc_id", "left_anti")
