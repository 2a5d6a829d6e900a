"""Field-extraction (L9–L14) and rule-engine (§2.11) tests."""

from __future__ import annotations

from pyspark.sql import functions as F

from angola_erp_ocr_spark.operators.fields import (
    classify_doc,
    extract_fields,
    extract_header_fields,
    extract_items,
    parse_item_line,
)
from angola_erp_ocr_spark.operators.rules import apply_scalar_rules, apply_table_rule
from angola_erp_ocr_spark.plans.pipeline import extract
from angola_erp_ocr_spark.synth import build_corpus


def _lines(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "line_no", "text"])


INVOICE_LINES = [
    ("d1", 0, "TAX INVOICE"),
    ("d1", 1, "INVOICE NUMBER"),
    ("d1", 2, "FT EN01 2023/123"),
    ("d1", 3, "INVOICE DATE 2023/05/17"),
    ("d1", 4, "SUPPLIER NIF 5412345678"),
    ("d1", 5, "CURRENCY USD"),
    ("d1", 6, "ITEM DESCRIPTION QTY RATE TOTAL IVA"),
    ("d1", 7, "1 WIDGET-1 2 100.00 200.00 14%"),
    ("d1", 8, "2 GADGET-2 3 10.00 30.00 14%"),
    ("d1", 9, "TAXABLE AMT 230.00"),
]

MCX_LINES = [
    ("d2", 0, "MULTICAIXA EXPRESS"),
    ("d2", 1, "MONTANTE 12.345,00 AKZ"),
    ("d2", 2, "IBAN AO06.40.0000.123.4567.8901.2"),
    ("d2", 3, "OPERACAO 123456789"),
]

ZAP_LINES = [
    ("d3", 0, "ZAP FIBRA"),
    ("d3", 1, "VALOR PAGO"),
    ("d3", 2, "1.500,00 AKZ"),
]


def test_classify_doc(spark):
    got = {r["doc_id"]: r["doc_class"]
           for r in classify_doc(_lines(spark, INVOICE_LINES + MCX_LINES + ZAP_LINES)).collect()}
    assert got == {"d1": "en_invoice", "d2": "mcx_express", "d3": "zap_fibra"}


def test_header_fields_invoice(spark):
    row = extract_header_fields(_lines(spark, INVOICE_LINES)).first()
    assert row["invoice_number"] == "FT EN01 2023/123"
    assert row["supplier_nif"] == "5412345678"
    assert row["invoice_date"] == "2023/05/17"
    assert row["currency"] == "USD"
    assert row["country"] == "United States"
    assert row["total_amount"] == "230.00"


def test_header_fields_mcx_iban_regrouped(spark):
    row = extract_header_fields(_lines(spark, MCX_LINES)).first()
    assert row["iban"] == "AO06.0040.0000.0123.4567.8901.0002"
    assert row["total_amount"] == "12.345,00"
    assert row["country"] == "Angola"


def test_valor_pago_lookahead(spark):
    row = extract_header_fields(_lines(spark, ZAP_LINES)).first()
    assert row["total_amount"] == "1.500,00"


def test_parse_item_line(spark):
    df = spark.createDataFrame([("1 WIDGET-1 2 100.00 200.00 14%",)], ["t"])
    it = df.select(parse_item_line(F.col("t")).alias("i")).first()["i"]
    assert it["item_id"] == "1"
    assert it["description"] == "WIDGET-1"
    assert it["quantity"] == "2"
    assert it["rate"] == "100.00"
    assert it["total"] == "200.00"
    assert it["iva"] == "14%"


def test_extract_items_region(spark):
    rows = extract_items(_lines(spark, INVOICE_LINES)).first()["items"]
    assert [r["item_id"] for r in rows] == ["1", "2"]
    assert [r["total"] for r in rows] == ["200.00", "30.00"]


def test_extract_fields_from_pipeline_output(spark):
    """End-to-end: corpus → span extraction → line table → fields."""
    raw, _, media = build_corpus(spark, 24)
    ext = extract(raw, media)
    lines = ext.select(
        "doc_id", F.posexplode("spans").alias("line_no", "s")
    ).where("s.kind = 'text'").select("doc_id", "line_no", F.col("s.text").alias("text"))
    fields = extract_fields(lines)
    truth = {r["doc_id"]: r["doc_class"] for r in raw.select("doc_id", "doc_class").collect()}
    got = {r["doc_id"]: r for r in fields.collect()}
    assert set(got) == set(truth)
    ok = sum(1 for d, c in truth.items() if got[d]["doc_class"] == c)
    assert ok == len(truth), [
        (d, truth[d], got[d]["doc_class"]) for d in truth
        if got[d]["doc_class"] != truth[d]][:5]
    # every non-noise doc found at least a NIF / amount / invoice number
    for d, c in truth.items():
        if c in ("en_invoice", "ao_modelo_factura"):
            assert got[d]["invoice_number"] is not None, (d, c)
            assert got[d]["items"], (d, c)


def test_scalar_rules(spark):
    docs = spark.createDataFrame(
        [("d1", "en_invoice", "junk FT EN01 2023/123 more 2023/05/17 junk"),
         ("d2", "mcx_express", "MONTANTE 1.234,56 AKZ fim")],
        ["doc_id", "doc_class", "text"])
    rules = [
        ("en_invoice", "invoice_number", r"((FT|FR)[ /][A-Z0-9]+[ /]?\d{2,4}/\d+)", 1, "string"),
        ("en_invoice", "invoice_date", r"(\d{4}/\d{2}/\d{2})", 1, "date"),
        ("mcx_express", "valor_pago", r"(\d{1,3}(\.\d{3})*,\d{2}) ?AKZ", 1, "decimal"),
    ]
    got = {r["doc_id"]: r for r in apply_scalar_rules(docs, rules).collect()}
    assert got["d1"]["invoice_number"] == "FT EN01 2023/123"
    assert got["d1"]["invoice_date"] == "2023-05-17"
    assert got["d2"]["valor_pago"] == "1.234,56"


def test_table_rule_explodes_children(spark):
    docs = spark.createDataFrame(
        [("d1", "en_invoice", "1 A 10.00\n2 B 20.00\n3 C 30.00")],
        ["doc_id", "doc_class", "text"])
    kids = apply_table_rule(docs, "en_invoice", r"(\d+ [A-Z] \d+\.\d{2})", 1).collect()
    assert [k["value"] for k in kids] == ["1 A 10.00", "2 B 20.00", "3 C 30.00"]


SUPPLIER_LINES = [
    ("d4", 0, "Original"),                      # avoid word — not the name
    ("d4", 1, "/ACME COMERCIO LDA"),            # first clean line, leading /
    ("d4", 2, "RUA DA MISSAO 12 LUANDA"),       # address marker word
    ("d4", 3, "NIF: 5498765432"),
    ("d4", 4, "TOTAL 100,00 AKZ"),
]


def test_supplier_name_and_address(spark):
    row = extract_header_fields(_lines(spark, SUPPLIER_LINES)).first()
    assert row["supplier"] == "ACME COMERCIO LDA"      # '/' stripped
    assert row["supplier_address"] == "RUA DA MISSAO 12 LUANDA"
    assert row["supplier_nif"] == "5498765432"


def test_supplier_nif_enrichment_overwrites(spark):
    """api/util.py:212-219 — the registry name wins over the scraped one."""
    taxpayers = spark.createDataFrame(
        [("5498765432", "ACME COMERCIO E SERVICOS SA")],
        ["nif", "company_name"])
    row = extract_header_fields(
        _lines(spark, SUPPLIER_LINES), taxpayers).first()
    assert row["supplier"] == "ACME COMERCIO E SERVICOS SA"
    # docs whose NIF is not in the registry keep the scraped name
    other = [(d, n, t.replace("5498765432", "5400000000"))
             for d, n, t in SUPPLIER_LINES]
    row2 = extract_header_fields(_lines(spark, other), taxpayers).first()
    assert row2["supplier"] == "ACME COMERCIO LDA"
