"""Markup extraction (operators/text.extract_markup_text + the
functions/text_exprs markup builders): fixture-pinned behavior, a pure
Python ``re`` replay of the same pattern constants as a third engine,
and the link-density boilerplate rule."""

import re

import pytest

from database_migration_spark.functions import text_exprs as TE
from database_migration_spark.operators.text import extract_markup_text

NAV_HTML = (
    '<html><head><title>t</title><style>p {color:red}</style>'
    '<script>if (a<2 && b>3) { f("x&y"); }</script></head><body>'
    '<div class="nav"><ul><li><a href="/h">Home</a></li>'
    '<li><a href="/a">About &amp; Help</a></li></ul></div>'
    "<h1>Head &#39;line&#39;</h1><p>Real prose, long enough to keep, "
    "with a single <a href=\"/x\">inline link</a> inside it.</p>"
    "<p>Tail &lt;tag&gt;&nbsp;end</p><br/><!-- note --></body></html>"
)


def _py_extract(html, min_chars=1, max_ppm=1_000_000):
    """The same stages replayed with Python re — a third regex engine
    agreeing is what makes the pattern constants trustworthy."""
    x = html
    for p in TE.MARKUP_BLOCK_PATTERNS:
        x = re.sub(p, " ", x)
    x = re.sub(TE.MARKUP_BREAK_PATTERN, "\n", x)
    kept = []
    for line in x.split("\n"):
        stripped = re.sub(TE.MARKUP_TAG_PATTERN, " ", line)
        txt = stripped
        for k, v in TE.MARKUP_ENTITIES:
            txt = txt.replace(k, v)
        txt = re.sub(r"[ \t\r]+", " ", txt).strip()
        anchors = re.findall(TE.MARKUP_ANCHOR_PATTERN, line)
        a_len = sum(
            len(re.sub(TE.MARKUP_TAG_PATTERN, "", a)) for a in anchors
        )
        total = len(re.sub(TE.MARKUP_TAG_PATTERN, "", line))
        ppm = a_len * 1_000_000 // max(total, 1)
        if len(txt) >= min_chars and ppm <= max_ppm:
            kept.append(txt)
    return "\n".join(kept)


def test_fixture_extraction_and_density_rule(spark):
    df = spark.createDataFrame([(1, NAV_HTML)], "doc_id INT, html STRING")
    strict = extract_markup_text(df, max_anchor_ppm=500_000).collect()[0]
    # nav lines (pure anchor) dropped; title/head/prose/tail kept
    assert strict.text.split("\n") == [
        "t",
        "Head 'line'",
        "Real prose, long enough to keep, with a single inline link "
        "inside it.",
        "Tail <tag> end",
    ]
    assert strict.n_lines == 4 and strict.n_chars == len(strict.text)
    # permissive keeps the nav lines too
    loose = extract_markup_text(df).collect()[0]
    assert loose.n_lines == 6
    assert "Home" in loose.text and "About & Help" in loose.text
    # script body with embedded '<' and the comment are gone everywhere
    assert "alert" not in loose.text and "note" not in loose.text
    assert "color" not in loose.text


def test_entity_decode_order_double_encoding(spark):
    # '&amp;lt;' must decode to the literal '&lt;' (amp LAST), and a
    # decoded '&lt;b&gt;' must NOT be stripped as a tag (decode AFTER
    # tag stripping)
    html = "<p>x &amp;lt; y</p><p>keep &lt;b&gt; literally</p>"
    df = spark.createDataFrame([(1, html)], "doc_id INT, html STRING")
    out = extract_markup_text(df).collect()[0]
    assert out.text == "x &lt; y\nkeep <b> literally"


def test_matches_python_re_replay(spark):
    import random

    rng = random.Random(20260816)
    frags = [
        "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
        "plain words ", "&amp; ", "&lt;x&gt; ", "<br/>", "<li>",
        "<script>var a = 1 < 2;</script>", "<!-- c -->", "text & raw ",
        "<span class='s'>", "</span>", "\n", "  spaced\tout ",
    ]
    rows = [
        (i, "".join(rng.choice(frags) for _ in range(rng.randint(0, 30))))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "doc_id INT, html STRING")
    for ppm in (1_000_000, 500_000):
        got = {
            r.doc_id: r.text
            for r in extract_markup_text(df, max_anchor_ppm=ppm).collect()
        }
        want = {i: _py_extract(h, max_ppm=ppm) for i, h in rows}
        assert got == want


def test_null_markup_rows_dropped(spark):
    # the round-5 chunk_tokens rule: split(NULL) is a NULL array whose
    # size is -1 in Spark while a SQL oracle emits NULL — NULL markup
    # must be filtered explicitly or the engines diverge (review finding)
    df = spark.createDataFrame(
        [(1, "<p>kept</p>"), (2, None)], "doc_id INT, html STRING"
    )
    out = extract_markup_text(df).collect()
    assert [(r.doc_id, r.text, r.n_lines, r.n_chars) for r in out] == [
        (1, "kept", 1, 4)
    ]


def test_param_validation(spark):
    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id INT, html STRING")
    with pytest.raises(ValueError, match="max_anchor_ppm"):
        extract_markup_text(df, max_anchor_ppm=2_000_000)
    with pytest.raises(ValueError, match="min_line_chars"):
        extract_markup_text(df, min_line_chars=0)
