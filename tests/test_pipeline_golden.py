"""Golden span-sequence equality: the BASELINE.json per-row invariant.

Pass = exact equality on (kind, text, media_ref, order) per document,
between the engine's extraction and the generator's independently computed
golden sequence (SURVEY §5 strategy 1).
"""

from __future__ import annotations

from angola_erp_ocr_spark.plans.pipeline import extract, resume_filter
from angola_erp_ocr_spark.synth import build_corpus


def as_tuples(spans):
    return [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in spans]


def test_span_sequence_equality(spark):
    raw, golden, media = build_corpus(spark, 60)
    ext = extract(raw, media)
    g = {r["doc_id"]: as_tuples(r["spans"]) for r in golden.collect()}
    e = {r["doc_id"]: as_tuples(r["spans"]) for r in ext.collect()}
    assert set(g) == set(e)
    mismatched = [d for d in g if g[d] != e[d]]
    assert mismatched == []


def test_idempotence(spark):
    """Running extraction twice yields the same result (SURVEY §5.4)."""
    raw, _, media = build_corpus(spark, 12)
    a = extract(raw, media)
    b = extract(raw, media)
    rows_a = {r["doc_id"]: as_tuples(r["spans"]) for r in a.collect()}
    rows_b = {r["doc_id"]: as_tuples(r["spans"]) for r in b.collect()}
    assert rows_a == rows_b


def test_resume_filter_anti_join(spark):
    """Resume = anti-join committed doc_ids; processes only the remainder."""
    raw, _, media = build_corpus(spark, 10)
    committed = raw.select("doc_id").limit(4)
    remaining = resume_filter(raw, committed)
    assert remaining.count() == raw.count() - 4


def test_text_only_extraction(spark):
    """Pipeline works without a media table (digital-only corpora)."""
    raw, golden, media = build_corpus(spark, 8)
    digital_only = raw.where(
        "not exists(spans, s -> s.kind = 'media')"
    )
    if digital_only.count() == 0:
        return
    ext = extract(digital_only, None)
    g = {r["doc_id"]: as_tuples(r["spans"]) for r in golden.collect()}
    for r in ext.collect():
        assert as_tuples(r["spans"]) == g[r["doc_id"]]
