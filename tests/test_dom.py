"""DOM-heuristic HTML span extraction (operators/dom.py; S3 HTML mode —
reference api/util.py:2457-2515: lxml .//div walk, left:px style parse,
text_content(), skip-unpositioned-via-continue)."""

from __future__ import annotations

from pyspark.sql import functions as F

from angola_erp_ocr_spark.operators.dom import (decode_entities,
                                                parse_html_divs,
                                                strip_dom_boilerplate)

PAGE = (
    '<div style="position:absolute; left:0px; top:980px;">'
    "<span>Pagina 1 de 1</span><br></div>"
    '<div style="position:absolute; left:0px; top:0px;"></div>'
    '<div style="position:absolute; border: textbox 1px solid; '
    'writing-mode:lr-tb; left:292px; top:1157px; width:27px; height:12px;">'
    '<span style="font-family: Helvetica; font-size:9px">TOTAL '
    "1.234,56 AOA</span><br></div>"
    '<div style="position:absolute; left:40px; top:100px;">'
    "<span>R&amp;D &lt;laudo&gt; &quot;ok&quot; &#39;x&#39; "
    "&amp;amp;</span><br></div>"
    "<div><span>unpositioned trailer</span></div>"
)


def _parse(spark, **kw):
    df = spark.createDataFrame([("d1", PAGE)], "doc_id string, html string")
    return parse_html_divs(df, **kw).orderBy("div_no")


def test_parse_positions_text_and_document_order(spark):
    rows = _parse(spark).collect()
    # the unpositioned trailer is dropped (reference's IndexError→continue)
    assert [r.div_no for r in rows] == [0, 1, 2, 3]
    assert (rows[2].x, rows[2].y) == (292, 1157)
    # nested span stripped, text_content concatenation
    assert rows[2].text == "TOTAL 1.234,56 AOA"
    # empty anchor div parses to empty text, not a crash
    assert rows[1].text == ""


def test_entity_decode_and_single_pass_amp(spark):
    rows = _parse(spark).collect()
    # &amp; decodes LAST: '&amp;amp;' is literal '&amp;' — a double
    # decode would produce '&'
    assert rows[3].text == "R&D <laudo> \"ok\" 'x' &amp;"
    one = (spark.range(1)
           .select(decode_entities(F.lit("&amp;lt;")).alias("t"))
           .first().t)
    assert one == "&lt;"


def test_keep_unpositioned_yields_null_coords(spark):
    rows = _parse(spark, keep_unpositioned=True).collect()
    assert [r.div_no for r in rows] == [0, 1, 2, 3, 4]
    assert rows[4].x is None and rows[4].y is None
    assert rows[4].text == "unpositioned trailer"


def test_coords_come_from_style_attribute_only(spark):
    """A div whose TEXT mentions 'left:99px' but whose style has no
    left: must stay unpositioned (the reference reads div.get('style'),
    api/util.py:2492) — body text can never position a span."""
    page = ('<div style="position:absolute; top:5px;">'
            "<span>margin left:99px</span></div>")
    df = spark.createDataFrame([("d1", page)], "doc_id string, html string")
    assert parse_html_divs(df).count() == 0  # no left: in style → skipped
    row = parse_html_divs(df, keep_unpositioned=True).first()
    assert row.x is None and row.y == 5
    assert row.text == "margin left:99px"


def test_carried_column_collision_raises(spark):
    df = spark.createDataFrame([("d1", "t", "<div></div>")],
                               "doc_id string, text string, html string")
    import pytest
    with pytest.raises(ValueError, match="collide"):
        parse_html_divs(df)


def test_encode_entities_inverts_decode(spark):
    from angola_erp_ocr_spark.operators.dom import encode_entities
    raw = "a&b <c> \"d\" 'e' &amp;"
    got = (spark.range(1)
           .select(decode_entities(encode_entities(F.lit(raw))).alias("t"))
           .first().t)
    assert got == raw


def test_strip_dom_boilerplate_drops_furniture_and_empties(spark):
    out = strip_dom_boilerplate(_parse(spark)).orderBy("div_no").collect()
    # 'Pagina 1 de 1' (AVOID_RE page-number furniture) and the empty
    # anchor are gone; content divs survive
    assert [r.div_no for r in out] == [2, 3]


# ---------------------------------------------------------------------------
# Property: arbitrary div soups render->parse exactly against a pure-Python
# reference (positions from style only, text_content semantics, entities)
# ---------------------------------------------------------------------------

from hypothesis import given, settings, strategies as st  # noqa: E402

_TXT = st.text(alphabet="ab &<>\"'9;px:left", min_size=0, max_size=18)


def _esc(s: str) -> str:
    for ch, ent in (("&", "&amp;"), ("<", "&lt;"), (">", "&gt;"),
                    ('"', "&quot;"), ("'", "&#39;")):
        s = s.replace(ch, ent)
    return s


_DIV = st.tuples(
    st.one_of(st.none(), st.integers(0, 999)),     # x (None = no left:)
    st.integers(0, 999),                            # y
    _TXT,                                           # raw text
    st.booleans(),                                  # wrap in <span>...</span>
)


@settings(max_examples=6, deadline=None)
@given(st.lists(_DIV, min_size=0, max_size=12))
def test_parse_html_divs_matches_python_reference(spark, divs):
    html, want = [], []
    for i, (x, y, raw, span) in enumerate(divs):
        style = ("position:absolute; " +
                 (f"left:{x}px; " if x is not None else "") + f"top:{y}px;")
        body = f"<span>{_esc(raw)}</span><br>" if span else _esc(raw)
        html.append(f'<div style="{style}">{body}</div>')
        want.append((i, x, y if x is not None else y, raw.strip()))
    df = spark.createDataFrame([("d", "".join(html))],
                               "doc_id string, html string")
    got = [(r.div_no, r.x, r.y, r.text)
           for r in parse_html_divs(df, keep_unpositioned=True)
           .orderBy("div_no").collect()]
    assert got == want
    kept = [(r.div_no, r.x) for r in parse_html_divs(df)
            .orderBy("div_no").collect()]
    assert kept == [(i, x) for i, x, _, _ in want if x is not None]
