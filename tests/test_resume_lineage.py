"""Resumability + lineage (SURVEY §4.4, north rule: resumable from
checkpoint with per-partition lineage): kill-after-partial-commit must
resume to a table state identical to an uninterrupted run."""

from __future__ import annotations

from pyspark.sql import functions as F

from angola_erp_ocr_spark.operators.ocr import (
    assemble_lines,
    ocr_lines,
    ocr_words,
    readable_words,
)
from angola_erp_ocr_spark.plans.lineage import write_with_lineage
from angola_erp_ocr_spark.plans.pipeline import extract, resume_filter
from angola_erp_ocr_spark.synth import build_corpus


def test_resume_equals_uninterrupted(spark, tmp_path):
    raw, golden, media = build_corpus(spark, 40)
    raw = raw.select("doc_id", "spans")

    # uninterrupted run
    full = extract(raw, media)

    # interrupted: only half the docs committed, then resume
    out = str(tmp_path / "out")
    part1 = raw.where(F.crc32(F.col("doc_id")) % 2 == 0)
    extract(part1, media).write.mode("overwrite").parquet(
        f"{out}/documents_extracted")

    committed = spark.read.parquet(f"{out}/documents_extracted")
    todo = resume_filter(raw, committed)
    assert todo.count() == 40 - committed.count()
    extract(todo, media).write.mode("append").parquet(
        f"{out}/documents_extracted")

    resumed = spark.read.parquet(f"{out}/documents_extracted")
    assert resumed.count() == 40
    assert resumed.exceptAll(full).count() == 0
    assert full.exceptAll(resumed).count() == 0


def test_resume_is_noop_when_complete(spark):
    raw, _golden, media = build_corpus(spark, 10)
    raw = raw.select("doc_id", "spans")
    done = extract(raw, media)
    assert resume_filter(raw, done).count() == 0


def test_write_with_lineage_accounts_everything(spark, tmp_path):
    raw, _golden, media = build_corpus(spark, 25)
    out = extract(raw.select("doc_id", "spans"), media)
    stats = write_with_lineage(out, str(tmp_path / "o"), run_id="r1")
    assert stats["docs_out"] == 25
    total_spans = (
        spark.read.parquet(str(tmp_path / "o" / "documents_extracted"))
        .select(F.sum(F.size("spans"))).collect()[0][0]
    )
    assert stats["spans_emitted"] == total_spans
    lin = spark.read.parquet(str(tmp_path / "o" / "lineage"))
    assert lin.where("run_id = 'r1'").count() >= 1
    assert lin.agg(F.sum("docs_in")).collect()[0][0] == 25


def test_fused_ocr_lines_matches_unfused(spark):
    """ocr_lines (decode+gate+assembly in one mapInPandas) must be
    row-identical to the compositional word-table path."""
    _raw, _golden, media = build_corpus(spark, 30)
    fused = ocr_lines(media)
    unfused = assemble_lines(readable_words(ocr_words(media)))
    assert fused.exceptAll(unfused).count() == 0
    assert unfused.exceptAll(fused).count() == 0
