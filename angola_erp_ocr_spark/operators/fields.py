"""L9–L14: document classification and header-field extraction.

The reference devotes ~1,900 lines to per-class first-match-wins line scans
(api/util.py:160-454, 918-1011, 1046-1123, 1228-1803, 2270-2390). Here every
field is one ``min_by(value, line_no)`` aggregation — all fields extracted in
a single pass over the line table, partial-aggregated map-side by Catalyst
(SURVEY §4 R3).

Input: a line table (doc_id, line_no, text) in reading order (from the
extraction pipeline or ``layout.reading_order``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.normalize import CASH_RE, DATE_RE, IBAN_RE, SERIES_RE, iban_regroup_col
from ..schema import CLASS_KEYWORDS
from .layout import mark_items_region, with_next_line

NIF_LABELED_RE = r"NIF[: ]+(\d{10})"
NIF_BARE_RE = r"(\d{10})"
CURRENCY_RE = r"\b(AKZ|AOA|KZ|USD|EUR)\b"
PCT_RE = r"^\d+%$"
INT_RE = r"^\d+$"
CASH_TOKEN_RE = r"^\d{1,3}([. ]\d{3})*,\d{2}$|^\d{1,3}(,\d{3})*\.\d{2}$|^\d+\.\d{2}$"

# currency → country dim (P13, api/util.py:435-441, 10724-10746); broadcast.
CURRENCY_COUNTRY = [
    ("AKZ", "Angola"), ("AOA", "Angola"), ("KZ", "Angola"),
    ("USD", "United States"), ("EUR", "European Union"),
]

# Supplier-name heuristic word lists (api/util.py:172-199): a line whose
# tokens hit `evitapalavras` can't be the company name; a line containing
# RUA/AVENIDA is the address.
SUPPLIER_AVOID_WORDS = ["Original", "2!Via", "2ºVia", "Duplicado"]
ADDRESS_WORDS = ["RUA", "AVENIDA"]


def classify_doc(lines: DataFrame) -> DataFrame:
    """L14: keyword-routing cascade → (doc_id, doc_class).

    One aggregation: concat the doc's text, then a when-cascade in the
    reference's precedence order (api/util.py:903..2165). The fuzzed keyword
    variants fold into the alternation regexes.
    """
    doc_text = lines.groupBy("doc_id").agg(
        F.upper(F.concat_ws("\n", F.collect_list("text"))).alias("all_text")
    )
    expr: Column = F.lit("noise")
    for cls, pat in reversed(CLASS_KEYWORDS):
        expr = F.when(F.col("all_text").rlike(pat), F.lit(cls)).otherwise(expr)
    return doc_text.select("doc_id", expr.alias("doc_class"))


def _first(value: Column, line_no: Column | None = None) -> Column:
    """First-match-wins (L13 / R3): earliest line whose predicate produced a
    value — `min_by` keyed on line_no, ignoring null candidates."""
    line_no = line_no if line_no is not None else F.col("line_no")
    return F.min_by(F.struct(line_no.alias("n"), value.alias("v")),
                    F.when(value.isNotNull(), line_no))["v"]


def _extracted(text: Column, pattern: str, group: int = 0) -> Column:
    got = F.regexp_extract(text, pattern, group)
    return F.when(got != "", got)


def extract_header_fields(lines: DataFrame,
                          taxpayers: DataFrame | None = None) -> DataFrame:
    """All header fields in ONE aggregation pass per doc (L13).

    Lookahead fields (VALOR PAGO / INVOICE NUMBER markers consume the next
    line, L11) are lead() columns computed before the aggregation.

    Supplier name (api/util.py:164-185): the first non-empty line whose
    tokens avoid `evitapalavras` ('Original', '2!Via', '2ºVia',
    'Duplicado'), with a leading '/' stripped. Supplier address
    (api/util.py:187-199): the first line containing RUA or AVENIDA.
    When a ``taxpayers(nif, company_name)`` dim is given, the authoritative
    registry name overwrites the scraped supplier (the validar_nif
    enrichment, api/util.py:212-219 — J2 as a broadcast join).
    """
    t = F.col("text")
    toks = F.split(F.trim(t), " ")
    has_avoid = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in SUPPLIER_AVOID_WORDS]))
    has_addr = F.arrays_overlap(
        toks, F.array(*[F.lit(w) for w in ADDRESS_WORDS]))
    led = with_next_line(lines, ["doc_id"])
    cand = led.select(
        "doc_id",
        "line_no",
        F.when((F.trim(t) != "") & ~has_avoid,
               F.regexp_replace(F.trim(t), "^/", "")).alias("c_supplier"),
        F.when(has_addr, F.trim(t)).alias("c_supplier_address"),
        _extracted(t, f"({SERIES_RE})").alias("c_invoice_number"),
        F.coalesce(
            _extracted(t, NIF_LABELED_RE, 1),
            F.when(t.rlike("NIF"), _extracted(t, NIF_BARE_RE, 1)),
        ).alias("c_supplier_nif"),
        _extracted(t, f"({DATE_RE})").alias("c_invoice_date"),
        _extracted(F.upper(t), CURRENCY_RE, 1).alias("c_currency"),
        F.when(t.rlike(IBAN_RE),
               iban_regroup_col(_extracted(t, f"({IBAN_RE})"))).alias("c_iban"),
        F.when(
            F.upper(t).rlike("TOTAL|MONTANTE|VALOR|TAXABLE"),
            _extracted(t, f"({CASH_RE})"),
        ).alias("c_total_direct"),
        F.when(
            F.upper(t).rlike("VALOR PAGO|INVOICE NUMBER"),
            F.col("next_text"),
        ).alias("c_next_value"),
    )
    agg = cand.groupBy("doc_id").agg(
        _first(F.col("c_supplier")).alias("supplier_scraped"),
        _first(F.col("c_supplier_address")).alias("supplier_address"),
        _first(F.col("c_invoice_number")).alias("invoice_number"),
        _first(F.col("c_supplier_nif")).alias("supplier_nif"),
        _first(F.col("c_invoice_date")).alias("invoice_date"),
        _first(F.col("c_currency")).alias("currency"),
        _first(F.col("c_iban")).alias("iban"),
        _first(F.col("c_total_direct")).alias("total_direct"),
        _first(F.col("c_next_value")).alias("next_value"),
    )
    # VALOR PAGO marker: amount lives on the following line (L11)
    currency_dim = lines.sparkSession.createDataFrame(
        CURRENCY_COUNTRY, ["currency", "country"]
    )
    if taxpayers is not None:
        # NIF-enrichment overwrite (api/util.py:212-219): registry name wins
        dim = taxpayers.select(F.col("nif").alias("supplier_nif"),
                               F.col("company_name"))
        agg = (
            agg.join(F.broadcast(dim), "supplier_nif", "left")
            .withColumn("supplier",
                        F.coalesce(F.col("company_name"),
                                   F.col("supplier_scraped")))
            .drop("company_name")
        )
    else:
        agg = agg.withColumn("supplier", F.col("supplier_scraped"))
    agg = agg.drop("supplier_scraped")
    return (
        agg.withColumn(
            "total_amount",
            F.coalesce(
                F.col("total_direct"),
                _extracted(F.col("next_value"), f"({CASH_RE})"),
            ),
        )
        .withColumn(
            "invoice_number",
            F.coalesce(
                F.col("invoice_number"),
                F.when(F.col("next_value").rlike(SERIES_RE), F.col("next_value")),
            ),
        )
        .join(F.broadcast(currency_dim), "currency", "left")  # P13/J3
        .drop("total_direct", "next_value")
    )


# ---------------------------------------------------------------------------
# L9 — reversed-token item-row parser (aprender_OCR api/util.py:3837-3896,
# retorna_descricao 7918-8004): right-to-left token scan as pure HOFs.
# ---------------------------------------------------------------------------

def parse_item_line(text: Column) -> Column:
    toks = F.split(F.trim(text), r"\s+")
    rev = F.reverse(toks)
    cash = lambda x: x.rlike(CASH_TOKEN_RE)  # noqa: E731
    is_int = lambda x: x.rlike(INT_RE)  # noqa: E731
    cash_toks = F.filter(rev, cash)
    total = F.try_element_at(cash_toks, F.lit(1))
    rate = F.try_element_at(cash_toks, F.lit(2))
    iva = F.when(F.try_element_at(rev, F.lit(1)).rlike(PCT_RE), F.try_element_at(rev, F.lit(1)))
    head = F.try_element_at(toks, F.lit(1))
    item_id = F.when(is_int(head), head)
    body = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    qty = F.try_element_at(F.filter(body, is_int), F.lit(1))
    desc = F.array_join(
        F.filter(body, lambda x: ~cash(x) & ~is_int(x) & ~x.rlike(PCT_RE)), " "
    )
    return F.struct(
        item_id.alias("item_id"),
        F.nullif(desc, F.lit("")).alias("description"),
        qty.alias("quantity"),
        rate.alias("rate"),
        total.alias("total"),
        iva.alias("iva"),
    )


def extract_items(lines: DataFrame) -> DataFrame:
    """Items-region rows (L7/L8 flags) → parsed item structs per doc,
    ordered by line_no. Rows lacking both a total and an id are stitches/
    noise and are dropped (L10 continuation handling is in stitch_items)."""
    region = mark_items_region(lines, ["doc_id"])
    items = region.where("in_items").select(
        "doc_id", "line_no", parse_item_line(F.col("text")).alias("item")
    ).where(F.col("item.total").isNotNull() | F.col("item.item_id").isNotNull())
    return items.groupBy("doc_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("line_no", "item"))),
            lambda s: s["item"],
        ).alias("items")
    )


def extract_fields(lines: DataFrame,
                   taxpayers: DataFrame | None = None) -> DataFrame:
    """Full D7 record: classification + header fields + items, one row/doc."""
    cls = classify_doc(lines)
    hdr = extract_header_fields(lines, taxpayers)
    items = extract_items(lines)
    return (
        cls.join(hdr, "doc_id", "left")
        .join(items, "doc_id", "left")
        .select(
            "doc_id", "doc_class", "supplier", "supplier_address",
            "supplier_nif", "invoice_number",
            "invoice_date", "currency", "country", "iban", "total_amount",
            "items",
        )
    )


# ---------------------------------------------------------------------------
# L10 — multi-line item stitching (api/util.py:2778-2790, 2828-2863,
# 3465-3547): serial numbers / continuation text lines attach to the
# PREVIOUS item row's description. The reference keeps an oldIDXDescription
# index; here the anchor is a last(ignorenulls) window, continuations
# aggregate per anchor — no state, one shuffle.
# ---------------------------------------------------------------------------

def stitch_items(lines: DataFrame) -> DataFrame:
    """Items-region lines → one row per item with continuations appended.

    An *anchor* line parses to an item with a total or an item id; any
    other in-region line is a continuation of the most recent anchor.
    Returns (doc_id, anchor_line, item_id, description, quantity, rate,
    total, iva) with description = anchor desc + stitched continuations.
    """
    region = mark_items_region(lines, ["doc_id"]).where("in_items")
    parsed = region.select(
        "doc_id", "line_no", "text",
        parse_item_line(F.col("text")).alias("item"),
    ).withColumn(
        "is_anchor",
        F.col("item.total").isNotNull() | F.col("item.item_id").isNotNull(),
    )
    w = (
        Window.partitionBy("doc_id").orderBy("line_no")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    anchored = parsed.withColumn(
        "anchor_line",
        F.last(F.when(F.col("is_anchor"), F.col("line_no")), ignorenulls=True)
        .over(w),
    ).where(F.col("anchor_line").isNotNull())  # pre-anchor stragglers drop
    grouped = anchored.groupBy("doc_id", "anchor_line").agg(
        F.min_by("item", F.when(F.col("is_anchor"), F.col("line_no"))).alias("item"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(~F.col("is_anchor"),
                               F.struct("line_no", "text"))
                    )
                ),
                lambda s: s["text"],
            ),
            " ",
        ).alias("cont"),
    )
    desc = F.when(
        F.col("cont") == "", F.col("item.description")
    ).otherwise(
        F.concat_ws(" ", F.col("item.description"), F.col("cont"))
    )
    return grouped.select(
        "doc_id",
        F.col("anchor_line").cast("int").alias("anchor_line"),
        F.col("item.item_id").alias("item_id"),
        desc.alias("description"),
        F.col("item.quantity").alias("quantity"),
        F.col("item.rate").alias("rate"),
        F.col("item.total").alias("total"),
        F.col("item.iva").alias("iva"),
    )
