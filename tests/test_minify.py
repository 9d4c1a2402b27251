"""Minifier parity with the documented minify_html subset
(reference feilian/agents/agent.py:64, fragments_detection.py:33)."""

import pytest

from langscrape_spark.html import minify


def test_collapses_intertag_and_run_whitespace():
    html = "<div>\n   <p>  hello   world </p>\n   <p>again</p>\n</div>"
    assert (
        minify(html, keep_closing_tags=True)
        == "<div><p>hello world</p><p>again</p></div>"
    )


def test_inline_spacing_preserved():
    html = "<p>a <b>bold</b> word</p>"
    assert minify(html, keep_closing_tags=True) == "<p>a <b>bold</b> word</p>"
    # whitespace-only text BETWEEN inline siblings stays one space
    html2 = "<p><b>a</b>   <i>b</i></p>"
    assert minify(html2, keep_closing_tags=True) == "<p><b>a</b> <i>b</i></p>"


def test_pre_and_script_verbatim():
    html = "<pre>  keep\n   this </pre><script>if (a < b)  {\n  x();\n}</script>"
    out = minify(html, keep_closing_tags=True)
    assert "  keep\n   this " in out
    assert "if (a < b)  {\n  x();\n}" in out


def test_comments_dropped_doctype_kept():
    html = "<!DOCTYPE html><!-- gone --><p>x<!-- also gone --></p>"
    out = minify(html, keep_closing_tags=True)
    assert out == "<!doctype html><p>x</p>"


def test_attribute_minification():
    html = '<input type="text" disabled="" data-x="a b" id="k1">'
    out = minify(html, keep_closing_tags=True)
    assert out == '<input type=text disabled data-x="a b" id=k1>'


def test_optional_end_tags_omitted_by_default():
    html = "<ul><li>one</li><li>two</li></ul>"
    assert minify(html) == "<ul><li>one<li>two</ul>"
    assert minify(html, keep_closing_tags=True) == "<ul><li>one</li><li>two</li></ul>"


def test_roundtrip_reparse_equivalent_text():
    """Minified output must parse back to the same text content and
    element structure (the agent feeds minified HTML to downstream
    extraction — reference agent.py:64)."""
    from langscrape_spark.html import parse
    from langscrape_spark.html.textify import convert_html_to_text

    html = (
        "<html><head><title>T</title></head><body>"
        "<div class='a'>\n  <h1> Head </h1>\n  <p>body  text <a href='/x'>link</a></p>"
        "\n</div></body></html>"
    )
    from langscrape_spark.html.dom import collapse_whitespace

    out = minify(html, keep_closing_tags=True)
    # whitespace-run collapse inside text is the minifier's JOB, so
    # compare the rendered text modulo runs
    assert collapse_whitespace(convert_html_to_text(out)) == collapse_whitespace(
        convert_html_to_text(html)
    )
    tags = [e.tag for e in parse(out).iter_elements()]
    assert tags == [e.tag for e in parse(html).iter_elements()]


@pytest.mark.parametrize(
    "hostile",
    ["", "plain text only", "<p>unclosed", "<div>" * 2000 + "x" + "</div>" * 2000,
     "a\x00b", "<p a='1' a='2'>dup</p>"],
)
def test_never_raises_on_hostile_input(hostile):
    out = minify(hostile, keep_closing_tags=True)
    assert isinstance(out, str)


def test_minified_never_longer():
    htmls = [
        "<div>  <p> x </p>  </div>",
        "<!-- c --><section>\n\t<span> a  b </span>\n</section>",
        '<a href="/x">  link  </a>',
    ]
    for h in htmls:
        assert len(minify(h, keep_closing_tags=True)) <= len(h)


def test_omission_mode_preserves_dom_structure():
    """keep_closing_tags=False may only omit an end tag where the spec
    allows it — the minified form must re-parse to the IDENTICAL tree
    (tag sequence + text content), else downstream xpath/template
    consumers see a different document."""
    from langscrape_spark.html.dom import parse

    cases = [
        "<div><p>a</p>b</div>",              # </p> must stay: text follows
        "<div><p>a</p><span>b</span></div>", # span not a valid p-follower
        "<ul><li>a</li><li>b</li></ul>",     # both </li> may drop
        "<p>a</p><p>b</p>",                  # p before p may drop
        "<table><tr><td>1</td><td>2</td></tr><tr><td>3</td></tr></table>",
        "<audio><p>fallback</p></audio>",    # p at end of bad parent: keep
        "<select><option>a</option><option>b</option></select>",
    ]
    for h in cases:
        out = minify(h, keep_closing_tags=False)
        want = parse(h)
        got = parse(out)
        assert [e.tag for e in got.iter_elements()] == [
            e.tag for e in want.iter_elements()
        ], (h, out)
        from langscrape_spark.html.textify import convert_html_to_text

        assert convert_html_to_text(out) == convert_html_to_text(h), (h, out)


def test_ampersand_attribute_values_stay_quoted():
    """Unquoted values ending in an entity-shaped suffix would DECODE
    on re-parse ('1&gt' -> '1>'); ampersand values must stay quoted."""
    from langscrape_spark.html.dom import parse

    out = minify('<a data-x="1&amp;gt">t</a>', keep_closing_tags=True)
    el = next(e for e in parse(out).iter_elements() if e.tag == "a")
    assert el.attrs["data-x"] == "1&gt", out
