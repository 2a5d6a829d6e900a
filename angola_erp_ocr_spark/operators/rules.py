"""§2.11 — the config-driven extraction engine (OCR Import mappings).

The reference's `find_field` runs `re.findall(rule.regexp, text)` and picks
index `rule.value` (ocr_import_mapping.py:49-63); `generate_doctype` walks
the mapping child table, with `Table`-type rules spawning one child doc per
`re.finditer` match (ocr_import.py:40-68). The unsafe `Python`/eval rule
type is deliberately NOT reproduced (SURVEY §2.11) — Spark SQL expressions
in the rule table give the same expressiveness safely.

Rules are config (tiny, driver-side); they compile into generated
`regexp_extract_all` columns — no UDFs, fully codegen'd. Scalar rules yield
one column per field; table rules yield exploded child rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def apply_scalar_rules(
    docs: DataFrame, rules: list[tuple[str, str, str, int, str]],
    text_col: str = "text", class_col: str = "doc_class",
) -> DataFrame:
    """docs: one row per document with full text + doc_class.
    rules: (doc_class, field, regexp, group_idx, dtype) — scalar dtypes.

    Emits one column per distinct field; a field's value comes from the
    first rule whose doc_class matches (rule order = precedence, mirroring
    mapping-row order in the reference).
    """
    fields: dict[str, list[tuple[str, str, int, str]]] = {}
    for doc_class, field, regexp, group_idx, dtype in rules:
        if dtype != "table":
            fields.setdefault(field, []).append((doc_class, regexp, group_idx, dtype))

    out = docs
    for field, variants in fields.items():
        expr = F.lit(None).cast("string")
        for doc_class, regexp, group_idx, dtype in reversed(variants):
            # findall + index pick: regexp_extract_all + element_at
            hit = F.try_element_at(
                F.regexp_extract_all(F.col(text_col), F.lit(regexp), F.lit(group_idx)),
                F.lit(1),
            )
            # dtype conversion applies to THIS variant's value only —
            # wrapping the whole cascaded expression would re-parse (and
            # mangle) values contributed by other variants of the field
            value = hit
            if dtype == "date":
                value = F.date_format(
                    F.coalesce(
                        F.try_to_timestamp(hit, F.lit("yyyy/MM/dd")),
                        F.try_to_timestamp(hit, F.lit("dd-MM-yyyy")),
                    ),
                    "yyyy-MM-dd",
                )
            expr = F.when(
                (F.col(class_col) == doc_class) & hit.isNotNull(), value
            ).otherwise(expr)
        out = out.withColumn(field, expr)
    return out


def apply_table_rule(
    docs: DataFrame, doc_class: str, regexp: str, group_idx: int = 0,
    text_col: str = "text", class_col: str = "doc_class",
) -> DataFrame:
    """Table-type rule: one child row per finditer match (UDTF-equivalent):
    explode(regexp_extract_all(...)). Returns (doc_id, match_no, value)."""
    return (
        docs.where(F.col(class_col) == doc_class)
        .select(
            "doc_id",
            F.posexplode(
                F.regexp_extract_all(F.col(text_col), F.lit(regexp), F.lit(group_idx))
            ).alias("match_no", "value"),
        )
    )
