"""J4 — OCR language registry (reference: the tesseract language-pack
availability check + `wordlist_langs.txt` ladder, util/ocr_pdf.py:1170-1183;
`get_languages` guard before `--l LANGS` is passed, api/util.py:8211-8212).

The reference asks pytesseract which language packs are installed and
falls back when a requested pack is missing. Spark restatement: the
registry is a broadcast CONFIG TABLE (lang, wordlist_size); a requested
language spec ("por", "por+eng", …) resolves per document by splitting on
'+', joining every component against the registry, and falling back to
``FALLBACK_LANG`` when any component is unavailable — one explode + one
broadcast join + one all() aggregation, no per-row Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# stand-in for the installed tesseract packs / wordlist_langs.txt head
AVAILABLE_LANGS: list[tuple[str, int]] = [
    ("por", 1200), ("eng", 3000), ("spa", 900), ("fra", 800),
]
FALLBACK_LANG = "eng"


def language_registry(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame(AVAILABLE_LANGS, ["lang", "wordlist_size"])


def resolve_languages(requests: DataFrame, registry: DataFrame,
                      id_col: str = "doc_id",
                      lang_col: str = "requested_lang") -> DataFrame:
    """(id, requested_lang) → (id, requested_lang, lang_ok, resolved_lang).

    ``lang_ok`` = every '+'-joined component exists in the registry;
    ``resolved_lang`` = the request itself when ok, else the fallback —
    the reference's behavior of quietly dropping to a safe pack rather
    than crashing the OCR call on a missing traineddata file.

    Null / empty requests keep their row (split(null) would explode to
    zero rows and silently drop the document — ADVICE r4): they emit
    ``lang_ok=false, resolved_lang=FALLBACK_LANG``, the same safe-pack
    fallback a missing component gets.
    """
    comp = requests.select(
        F.col(id_col).alias("id"), F.col(lang_col).alias("requested_lang"),
        F.explode(F.split(
            # null/empty → a single component no registry row matches,
            # so the doc survives the explode and resolves to fallback
            F.when(F.col(lang_col).isNull() | (F.col(lang_col) == ""),
                   F.lit("__missing__"))
            .otherwise(F.col(lang_col)), r"\+")).alias("lang"))
    reg = F.broadcast(registry.select("lang", F.lit(True).alias("_known")))
    joined = comp.join(reg, "lang", "left")
    return (
        joined.groupBy("id", "requested_lang")
        .agg(F.min(F.coalesce(F.col("_known"), F.lit(False))).alias("lang_ok"))
        .select(
            F.col("id").alias(id_col), "requested_lang", "lang_ok",
            F.when(F.col("lang_ok"), F.col("requested_lang"))
            .otherwise(F.lit(FALLBACK_LANG)).alias("resolved_lang"))
    )
