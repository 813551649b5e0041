"""Unit tests for the pure-Python extraction core (the oracle itself).

Edge cases per FIXTURES.md §1 and SURVEY §7.4 risk #6 (HTML edge cases).
"""

from documentai_spark.core.extract import extract_turn
from documentai_spark.core.html_extract import extract_html
from documentai_spark.core.layout_extract import extract_layout
from documentai_spark.core.textkind import detect_kind


def test_detect_kind():
    assert detect_kind("hello world") == "plain"
    assert detect_kind("<p>hi</p>") == "html"
    assert detect_kind("<a href='/x'>link</a>") == "html"
    assert detect_kind("line one\n\nline two") == "layout"
    assert detect_kind("col1  col2  col3\nrow") == "layout"
    assert detect_kind("one\ntwo") == "plain"  # no block sep, no columns
    assert detect_kind("") == "plain"
    assert detect_kind(None) == "plain"
    # tag names are case-insensitive (HTML is)
    assert detect_kind("<P>hi</P>") == "html"
    assert detect_kind("<TABLE><TR><TD>x</TD></TR></TABLE>") == "html"
    assert detect_kind("<BR/>") == "html"
    # but case-folding is ASCII-only: U+017F (long s) is not an 's'
    assert detect_kind("ſpan test <ſpan>") == "plain"
    # tab-separated cells are table rows too (layout_extract._CELL_SPLIT
    # splits on tabs, so detection must route them to the extractor)
    assert detect_kind("Name\tQty\nSteel\t5") == "layout"
    assert detect_kind("Name \t Qty\nrow") == "layout"  # space-padded tab
    assert detect_kind("Name\tQty") == "plain"  # single line stays plain


def test_tab_table_reaches_layout_extractor():
    """A tab-only table must route 'layout' AND parse into cells — the
    capability existed (_CELL_SPLIT handles tabs) but was unreachable
    while detection only recognized double-space separators."""
    kind, text, spans = extract_turn("Name\tQty\nSteel\t5")
    assert kind == "layout"
    cells = [s for s in spans if s[2] == "cell"]
    assert [c[3] for c in cells] == ["Name", "Qty", "Steel", "5"]


def test_plain_identity():
    kind, text, spans = extract_turn("hello world")
    assert kind == "plain" and text == "hello world"
    assert spans == [(0, 11, "line", "hello world")]


def test_html_strips_boilerplate():
    html = ('<html><body>'
            '<ul><li><a href="/a">a</a></li><li><a href="/b">b</a></li></ul>'
            '<p>this paragraph has more than ten words of real main content '
            'in it today</p>'
            '<div><a href="/about">about</a> <a href="/terms">terms</a></div>'
            '</body></html>')
    text, spans = extract_html(html)
    assert "main content" in text
    assert "about" not in text and "href" not in text
    assert len(spans) == 1 and spans[0][2] == "p"


def test_html_pure_boilerplate_empty():
    html = ('<html><body><ul><li><a href="/x">x</a></li></ul>'
            '<div><a href="/y">y</a></div></body></html>')
    text, spans = extract_html(html)
    assert text == "" and spans == []


def test_html_heading_kept_only_with_content():
    with_content = ("<h1>Title Here</h1><p>" + "word " * 12 + "</p>")
    text, _ = extract_html(with_content)
    assert text.startswith("Title Here\n")
    only_heading = "<h1>Title Here</h1>"
    text2, _ = extract_html(only_heading)
    assert text2 == ""


def test_html_table_cells():
    html = "<table><tr><td>a b</td><td>c</td></tr><tr><td>d</td></tr></table>"
    text, spans = extract_html(html)
    assert text == "a b c\nd"
    assert [(s[0], s[1], s[2]) for s in spans] == [
        (0, 3, "cell"), (4, 5, "cell"), (6, 7, "cell")]
    for b, e, _, t in spans:
        assert text[b:e] == t


def test_html_single_cell_table():
    text, spans = extract_html("<table><tr><td>only</td></tr></table>")
    assert text == "only" and spans == [(0, 4, "cell", "only")]


def test_html_unclosed_tags_lenient():
    text, _ = extract_html("<p>" + "word " * 11 + "<p>" + "tail " * 11)
    assert text.count("\n") == 1  # two paragraphs despite no </p>


def test_html_whitespace_collapse():
    html = "<p>  lots   of \n  spaces " + "pad " * 10 + "</p>"
    text, _ = extract_html(html)
    assert "  " not in text and not text.startswith(" ")


def test_layout_blocks_and_tables():
    src = "alpha beta\n\ngamma  delta  epsilon\nplain line"
    text, spans = extract_layout(src)
    assert text == "alpha beta\ngamma delta epsilon\nplain line"
    kinds = [s[2] for s in spans]
    assert kinds == ["line", "cell", "cell", "cell", "line"]
    for b, e, _, t in spans:
        assert text[b:e] == t


def test_layout_goods_row_six_fields():
    row = "widget a  1234.56  10  PCS  9.99  99,900.00"
    text, spans = extract_layout(row + "\n\nnext block")
    assert len([s for s in spans if s[2] == "cell"]) == 6


def test_empty_and_whitespace():
    assert extract_turn("")[1] == ""
    # whitespace-only: blank-line separator makes it 'layout'; extraction
    # yields empty text (the re-scan verdict keys off the RAW text anyway).
    kind, text, spans = extract_turn("   \n\t  \n   ")
    assert kind == "layout" and text == "" and spans == []


def test_html_nested_table_and_charrefs():
    """Pinned edge semantics: nested tables flush the outer row and emit
    their own rows (SURVEY §7.4 risk #6); charrefs decode; <br> in a cell
    is a soft space."""
    t, s = extract_html("<table><tr><td>a</td><td>"
                        "<table><tr><td>x</td></tr></table>"
                        "</td></tr></table>")
    assert t == "a\nx"
    assert [(x[2], x[3]) for x in s] == [("cell", "a"), ("cell", "x")]
    t2, _ = extract_html("<table><tr><td>a<br>b</td></tr></table>")
    assert t2 == "a b"
    t3, _ = extract_html("<p>one &amp; two " + "w " * 10 + "</p>")
    assert t3.startswith("one & two")


def test_html_bare_anchor_boilerplate_dropped():
    """r7 review: an <a> opened before any unit exists (bare anchor
    under <body>, or <a> wrapping a block — valid HTML5) used to
    contribute zero link chars, so pure-link boilerplate was emitted as
    content. Anchor depth now lives on the extractor."""
    from documentai_spark.core.extract import extract_html

    nav = ("<body><a href=\"/x\">About us terms privacy contact careers "
           "sitemap help faq press blog</a></body>")
    text, spans = extract_html(nav)
    assert text == "" and spans == []

    wrapped = ("<a><div>nav card words here are many and all of them "
               "linked content</div></a>")
    text2, _ = extract_html(wrapped)
    assert text2 == ""

    # a real paragraph after a closed bare anchor still extracts
    mixed = ("<body><a href=/>home</a><p>ten genuine words of real "
             "content sit right here now</p></body>")
    text3, _ = extract_html(mixed)
    assert text3 == "ten genuine words of real content sit right here now"


def test_html_tokenizer_survives_stray_quotes():
    """r7 review: an unquoted attribute value containing an apostrophe
    (href=/it's) or an unterminated quote used to fail the tag
    tokenizer, leaking raw markup into extracted_text."""
    from documentai_spark.core.extract import extract_html

    t1, _ = extract_html("<p>ten words of honest content fill this "
                         "line <a href=/it's>x</a></p>")
    assert "<a" not in t1 and "href" not in t1
    t2, _ = extract_html("<p>ten words of honest content fill this "
                         "line up <a href=\"x>link</a></p>")
    assert "<a" not in t2 and "href" not in t2


def test_layout_mixed_space_tab_gap():
    """r7 review: a space+tab column gap left a trailing space inside
    the left cell ('alpha ' span, double space in the output); any
    whitespace run containing a tab or 2+ spaces is ONE gap."""
    from documentai_spark.core.layout_extract import extract_layout

    text, spans = extract_layout("alpha \tbeta\n\nrow1  row2")
    assert text == "alpha beta\nrow1 row2"
    assert [s[3] for s in spans] == ["alpha", "beta", "row1", "row2"]
