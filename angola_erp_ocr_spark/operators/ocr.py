"""I1–I10: the OCR stage as one Arrow-batched ``mapInPandas`` transform.

The reference renders PDF pages and calls Tesseract per page
(ocr_read.py:133-162; util/ocr_pdf.py:242-455 ``ocr_img`` with its
preprocessing ladder I1–I4). Here the rendered page is a glyph-grid binary
(see ``glyph.py``) and "OCR" is its exact decode — the Spark-side shape is
the real thing: media pages arrive as Arrow batches, the stage emits the
word/box stream D3 (media_ref, page_no, block, par, line, word_idx, text,
conf, x, y, w, h) with zero per-row Python at the DataFrame level.

Image preprocessing (grayscale/threshold/deskew, I1–I4) and real decoders
would slot into ``_decode_batch`` unchanged; they are pure batch functions
of the binary column. Real image/audio libs are absent in this sandbox —
see ``operators/multimodal.py`` for the gated stubs.

Quality gates mirror the reference: words kept at conf > 30
(util/ocr_pdf.py:390-392); pages with no readable words are surfaced via
``page_confidence`` (ERRO_QUALIDADE, util/ocr_pdf.py:237-239, 382-383).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..glyph import decode_page
from ..schema import WORD_BOX

CONF_THRESHOLD = 30  # util/ocr_pdf.py:390-392


def _decode_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """Decode one Arrow batch of glyph-grid pages into word rows."""
    out = {k: [] for k in ("media_ref", "page_no", "block", "par", "line",
                           "word_idx", "text", "conf", "x", "y", "w", "h")}
    for media_ref, page_no, blob in zip(pdf["media_ref"], pdf["page_no"],
                                        pdf["glyph_grid"]):
        for wd in decode_page(bytes(blob)):
            out["media_ref"].append(media_ref)
            out["page_no"].append(int(page_no))
            for k in ("block", "par", "line", "word_idx", "text", "conf",
                      "x", "y", "w", "h"):
                out[k].append(wd[k])
    return pd.DataFrame(out)


def ocr_words(media_pages: DataFrame) -> DataFrame:
    """media_pages(media_ref, page_no, glyph_grid, dpi) → word table (D3)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield _decode_batch(pdf)

    return media_pages.select("media_ref", "page_no", "glyph_grid").mapInPandas(
        run, schema=WORD_BOX
    )


def readable_words(words: DataFrame) -> DataFrame:
    """Quality gate: keep words with conf > threshold."""
    return words.where(F.col("conf") > CONF_THRESHOLD)


def page_confidence(words: DataFrame) -> DataFrame:
    """I7/A1 (util/ocr_pdf.py:222-240): per-page mean confidence, excluding
    tesseract's -1 sentinel rows; pages failing the gate flagged."""
    return (
        words.where(F.col("conf") != -1)
        .groupBy("media_ref", "page_no")
        .agg(
            F.avg("conf").alias("mean_conf"),
            F.count(F.when(F.col("conf") > CONF_THRESHOLD, 1)).alias("readable_words"),
        )
        .withColumn("quality_ok", F.col("readable_words") > 0)
    )


def assemble_lines(words: DataFrame) -> DataFrame:
    """L6 (util/ocr_pdf.py:177-194): word stream → line table.

    Words group on (media_ref, page_no, block, par, line); text joins in
    word_idx order; the line's (x, y) anchor is the min word box. A single
    hash aggregation — no windows, no Python.
    """
    return (
        words.groupBy("media_ref", "page_no", "block", "par", "line")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("word_idx", "text"))
                    ),
                    lambda s: s["text"],
                ),
                " ",
            ).alias("text"),
            F.min("x").alias("x"),
            F.min("y").alias("y"),
        )
    )
