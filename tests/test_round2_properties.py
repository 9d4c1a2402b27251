"""Property-style robustness gates for the round-2 operators: the
json fallback chain always yields parseable JSON, the CSS engine
either answers or raises CSSError (never anything else), and the
pruning passes are idempotent — the reference's own
"cleaning-preserves-truth" testing philosophy (SURVEY §5.2) applied
to the new surface."""

import json
import random
import string

from hypothesis import given, settings
from hypothesis import strategies as st

from langscrape_spark.html.css import CSSError, css_select
from langscrape_spark.html.dom import parse
from langscrape_spark.html.prune import (
    extraction_based_pruning,
    prune_to_text,
)


def _rand_texts(n=200, seed=13):
    rng = random.Random(seed)
    pieces = [
        '{"a": 1}', "```json", "```", "{", "}", "[1,2]", '"q"', "plain",
        "42", ":", ",", "\n", " ", "null", '{"nested": {"x": [true]}}',
        "é中文", "'single'", '\\"',
    ]
    out = []
    for _ in range(n):
        k = rng.randint(0, 8)
        out.append(" ".join(rng.choice(pieces) for _ in range(k)))
    out += ["", None]
    return out


def test_json_chain_output_always_parses(spark):
    """For arbitrary dirty input, extract_json_block_col's output must
    be json.loads-parseable — the chain's contract is 'a JSON value or
    {}', never a raw fragment."""
    from langscrape_spark.operators.text import extract_json_block_col
    from pyspark.sql import functions as F

    texts = _rand_texts()
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, raw string"
    )
    rows = df.select(
        "id", extract_json_block_col(F.col("raw")).alias("js")
    ).collect()
    assert len(rows) == len(texts)
    for r in rows:
        json.loads(r["js"])  # must not raise


@given(
    st.text(
        alphabet=string.ascii_letters + string.digits + " .#>[]=~^$*:,'\"()-_",
        max_size=40,
    )
)
@settings(max_examples=300, deadline=None)
def test_css_engine_total(selector):
    """css_select over arbitrary selector strings either answers or
    raises CSSError — no other exception type escapes (the extraction
    kernel maps CSSError to the Error: sentinel)."""
    doc = parse('<html><body><div class="a b"><p id="x">t</p></div></body></html>')
    try:
        out = css_select(doc, selector)
    except CSSError:
        return
    assert isinstance(out, list)


@given(st.text(max_size=300))
@settings(max_examples=150, deadline=None)
def test_prune_passes_idempotent(html_text):
    """Pruning twice must equal pruning once, on arbitrary (possibly
    garbage) markup — the passes are projections."""
    doc = parse(html_text)
    extraction_based_pruning(doc, ["/html/body/div"])
    once = doc.serialize()
    extraction_based_pruning(doc, ["/html/body/div"])
    assert doc.serialize() == once

    doc2 = parse(html_text)
    for el in [c for c in doc2.iter_elements()][:5]:
        prune_to_text(el)
    once = doc2.serialize()
    for el in [c for c in doc2.iter_elements()][:5]:
        prune_to_text(el)
    assert doc2.serialize() == once


def test_extract_pages_poison_row_principle(spark):
    """END-TO-END poison gate: every hostile input row must yield
    exactly one output row from the full extract_pages pipeline —
    flagged, never dropped, never fatal (the codebase's stated
    poison-row principle, previously tested only per-helper)."""
    from langscrape_spark import synth
    from langscrape_spark.plans.extract import extract_pages

    hostile = [
        # (url, warc_ts, html, text, lang)
        (None, None, b"<p>null url</p>", "", "en"),
        ("not a url at all", None, b"<p>bad scheme</p>", "", "en"),
        ("https://ok.example/a", None, None, "", "en"),              # null html
        ("https://ok.example/b", None, b"", "", "en"),               # empty html
        ("https://ok.example/c", None, b"\x00\xff\xfe garbage \x80", "", "en"),  # junk bytes
        ("https://ok.example/d", None, "<div>".encode() * 3000 + b"x", "", "en"),  # deep
        ("https://ok.example/e", None,
         "<html><body>中文 café</body></html>".encode("utf-16"),
         "", "en"),                                                  # wrong encoding
        ("https://ok.example/f.PDF", None, b"%PDF-1.4 junk", "", "en"),  # pdf route
        ("https://ok.example/g", None, b"<p " + b"a" * 100_000 + b">t</p>", "", "en"),  # huge attr
    ]
    df = spark.createDataFrame(hostile, synth.PAGES_DDL)
    out = extract_pages(df, synth.FIELD_MAP).collect()
    assert len(out) == len(hostile)  # one output row per input row
    by_url = {r["url"]: r for r in out}
    assert by_url[None]["is_valid_url"] is False
    assert by_url["not a url at all"]["is_valid_url"] is False
    assert by_url["https://ok.example/f.PDF"]["is_pdf"] is True
    # every row carries the full sentinel-complete extraction map
    for r in out:
        assert set(r["extracted"].keys()) == set(synth.FIELD_MAP.keys())
