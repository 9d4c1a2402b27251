"""The feilian pruning tail (html/prune.py), predicate xpaths, the
CSS-selector engine, and EXSLT re:test support — each test mirrors the
documented behavior of its reference function (citations in the
module docstrings)."""

import pytest

from langscrape_spark.html.css import CSSError, css_select, extract_text_by_css_selector
from langscrape_spark.html.dom import Element, Text, parse
from langscrape_spark.html.extract import extract_by_xpath_map
from langscrape_spark.html.prune import (
    apply_trim_rules,
    build_token_tree,
    extract_fragments_by_weight,
    extraction_based_pruning,
    find_node,
    get_common_ancestor,
    get_node_contain_text,
    get_text_content,
    prune_by_structure,
    prune_by_xpath,
    prune_to_text,
    remove_node,
    remove_node_until,
    replace_with_text,
)
from langscrape_spark.html.xpath import (
    evaluate,
    extract_text_by_xpath,
    get_xpath_predicated,
)


def _first(doc, xp):
    out = evaluate(doc, xp)
    assert out, xp
    return out[0]


# ---------------------------------------------------------------------------
# text collapsing
# ---------------------------------------------------------------------------

def test_get_text_content_joins_stripped_fragments():
    doc = parse("<div>  a  <p> b </p><span>c</span>  </div>")
    assert get_text_content(_first(doc, "/div")) == "a b c"


def test_replace_with_text_collapses_subtree():
    doc = parse("<div><p>x</p><p>y</p></div>")
    el = _first(doc, "/div")
    replace_with_text(el)
    assert len(el.children) == 1 and isinstance(el.children[0], Text)
    assert el.children[0].data == "x y"


def test_prune_to_text_special_cases():
    # tr → td children collapsed, th untouched
    doc = parse("<tr><td><b>1</b></td><th><b>2</b></th></tr>")
    tr = _first(doc, "/tr")
    prune_to_text(tr)
    td, th = [c for c in tr.children if isinstance(c, Element)]
    assert td.serialize() == "<td>1</td>"
    assert "<b>" in th.serialize()
    # table → untouched
    doc = parse("<table><tr><td>x</td></tr></table>")
    t = _first(doc, "/table")
    before = t.serialize()
    prune_to_text(t)
    assert t.serialize() == before
    # ul → li collapsed
    doc = parse("<ul><li><a>x</a></li><li><a>y</a></li></ul>")
    ul = _first(doc, "/ul")
    prune_to_text(ul)
    assert ul.serialize() == "<ul><li>x</li><li>y</li></ul>"
    # generic element → wholesale collapse
    doc = parse("<div><p>a</p><p>b</p></div>")
    d = _first(doc, "/div")
    prune_to_text(d)
    assert d.serialize() == "<div>a b</div>"


# ---------------------------------------------------------------------------
# xpath-directed pruning
# ---------------------------------------------------------------------------

PAGE = (
    "<html><body>"
    "<div><p>keep me</p></div>"
    "<div><p>drop one</p><span>drop two</span></div>"
    "<nav>chrome text</nav>"
    "</body></html>"
)


def test_prune_by_xpath_keeps_include_paths():
    doc = parse(PAGE)
    keep = _first(doc, "/html/body/div[1]")
    assert prune_by_xpath(keep, "/html/body/div[1]", ["/html/body/div[1]/p"])
    assert "keep me" in keep.serialize()


def test_extraction_based_pruning_ellipsis():
    doc = parse(PAGE)
    extraction_based_pruning(doc, ["/html/body/div[1]"])
    body = _first(doc, "/html/body")
    s = body.serialize()
    assert "keep me" in s
    # siblings of the include path collapse to empty/ellipsis shells
    assert "drop one" not in s and "chrome text" not in s


def test_apply_trim_rules_re_test():
    doc = parse(
        '<html><body><div class="ad-banner">x</div>'
        '<div class="content">y</div>'
        '<div class="AD-top">z</div></body></html>'
    )
    apply_trim_rules(doc, ["//div[re:test(@class, '^ad-', 'i')]"])
    s = _first(doc, "/html/body").serialize()
    assert "x" not in s and "z" not in s and "y" in s


def test_re_test_pattern_with_character_class():
    """A regex character class inside the quoted pattern contains a
    literal ']' — the predicate scanner must not treat it as the end
    of the predicate (a `[^\\]]*` tokenizer silently rejects the whole
    step, returning the empty/invalid sentinel instead of matching)."""
    from langscrape_spark.html import evaluate, extract_text_by_xpath

    doc = parse(
        '<html><body><p id="a1">one</p><p id="b!">two</p></body></html>'
    )
    vals, invalid = extract_text_by_xpath(
        doc, "//p[re:test(@id, '^[a-z][0-9]$')]/text()"
    )
    assert not invalid and vals == ["one"]
    # nested brackets: positional predicate after a bracketed pattern
    got = evaluate(doc, "//p[re:test(@id, '[0-9]')][1]/text()")
    assert [str(t) for t in got] == ["one"]
    # a ']' inside a contains() literal must survive too
    vals2, invalid2 = extract_text_by_xpath(
        doc, "//p[contains(@id, ']')]/text()"
    )
    assert not invalid2 and vals2 == []


# ---------------------------------------------------------------------------
# structure-guided pruning
# ---------------------------------------------------------------------------

def test_prune_by_structure_drops_unmatched_children():
    origin = _first(
        parse(
            '<div class="r"><p class="a">one</p><p class="b">two</p>'
            '<p class="a">three</p></div>'
        ),
        "/div",
    )
    skeleton = _first(
        parse('<div class="r"><p class="a"></p><p class="a"></p></div>'), "/div"
    )
    prune_by_structure(origin, skeleton)
    kept = [c for c in origin.children if isinstance(c, Element)]
    assert [c.attrs.get("class") for c in kept] == ["a", "a"]
    assert "two" not in origin.serialize()


def test_prune_by_structure_requires_same_root():
    with pytest.raises(AssertionError):
        prune_by_structure(
            _first(parse("<div>x</div>"), "/div"),
            _first(parse("<span></span>"), "/span"),
        )


# ---------------------------------------------------------------------------
# text → node lookups
# ---------------------------------------------------------------------------

NESTED = (
    "<html><body><div>outer text"
    "<section><p>the <b>needle</b> here</p></section>"
    "</div></body></html>"
)


def test_get_node_contain_text_picks_deepest():
    doc = parse(NESTED)
    el = get_node_contain_text(doc, "needle")
    assert el is not None and el.tag == "b"
    # entity/whitespace normalization on both sides
    doc2 = parse("<html><body><p>a&amp;amp;b   c</p></body></html>")
    assert get_node_contain_text(doc2, "a&b c").tag == "p"


def test_get_common_ancestor():
    """Reference semantics are STRICT-ancestor: the fold lifts the
    running candidate until it appears among the next node's parents,
    so a node in the input list is never itself the answer."""
    doc = parse(NESTED)
    b = get_node_contain_text(doc, "needle")
    p = _first(doc, "/html/body/div/section/p")
    section = _first(doc, "/html/body/div/section")
    div = _first(doc, "/html/body/div")
    assert get_common_ancestor([b, p]) is section
    assert get_common_ancestor([b, div]) is _first(doc, "/html/body")
    assert get_common_ancestor([p, section.children[0].parent]) is div
    assert get_common_ancestor([]) is None


# ---------------------------------------------------------------------------
# token tree
# ---------------------------------------------------------------------------

TOKDOC = (
    "<html><body>"
    "<div>short</div>"
    "<div><p>one two three four five six seven eight</p>"
    "<p>nine ten eleven twelve</p></div>"
    "</body></html>"
)


def test_build_token_tree_counts():
    root = _first(parse(TOKDOC), "/html")
    tree = build_token_tree(root)
    assert tree.xpath == "/html"
    assert tree.text_tokens == 13  # 1 + 8 + 4
    body = tree.children[0]
    div2 = body.children[1]
    assert div2.xpath == "/html/body/div[2]"
    assert div2.text_tokens == 12
    assert tree.html_tokens > tree.text_tokens


def test_find_remove_node_decrements_ancestors():
    root = _first(parse(TOKDOC), "/html")
    tree = build_token_tree(root)
    node = find_node(tree, token_below=8)
    assert node.text_tokens <= 8
    before = tree.text_tokens
    remove_node(node)
    assert tree.text_tokens == before - 8
    # the DOM element was detached too
    assert "one two three" not in root.serialize()


def test_remove_node_until_converges():
    root = _first(parse(TOKDOC), "/html")
    tree = build_token_tree(root)
    times, trail = remove_node_until(tree, token_below=8, until=2)
    assert times >= 1
    assert trail[-1] == tree.text_tokens
    assert tree.text_tokens <= 2 or times > 0


def test_extract_fragments_by_weight_yields_until_budget():
    body_parts = "".join(
        f'<div class="art"><p>{" ".join(f"w{i}t{j}" for j in range(40))}</p></div>'
        for i in range(6)
    )
    root = _first(parse(f"<html><body>{body_parts}</body></html>"), "/html")
    frags = list(
        extract_fragments_by_weight(
            root, until_html_tokens=100, max_text_tokens=200
        )
    )
    assert frags  # yielded heaviest-node xpaths
    assert all(x.startswith("/html/body") for x in frags)
    # yielded nodes were removed from the DOM as they were extracted
    tree_after = build_token_tree(root)
    assert tree_after.html_tokens < 100 or tree_after.text_tokens == 0


# ---------------------------------------------------------------------------
# predicate xpaths + EXSLT + CSS
# ---------------------------------------------------------------------------

PRED = (
    '<html><body><div id="main"><ul class="list">'
    "<li>a</li><li>b</li></ul>"
    '<ul class="other"><li>c</li></ul></div></body></html>'
)


def test_get_xpath_predicated_id_shortcut():
    doc = parse(PRED)
    li = evaluate(doc, "//ul[@class='list']/li")[1]
    xp = get_xpath_predicated(li)
    assert xp == '//div[@id="main"]/ul[@class="list"]/li[2]'
    # and the engine resolves its own predicated output
    assert evaluate(doc, xp)[0] is li
    full = get_xpath_predicated(li, short=False)
    assert full.startswith("/html/body/div")


def test_extract_text_by_xpath_contract():
    doc = parse(PRED)
    vals, invalid = extract_text_by_xpath(doc, "//ul[re:test(@class, 'li.t')]/li")
    assert (vals, invalid) == (["a", "b"], False)
    vals, invalid = extract_text_by_xpath(doc, "//ul[unsupported!!")
    assert (vals, invalid) == ([], True)
    assert extract_text_by_xpath(doc, None) == []


CSSDOC = (
    '<html><body><div id="top" class="wrap main">'
    '<p class="lead">first</p><p>second</p>'
    '<a href="https://x.example/page">link</a></div>'
    "<div><p>third</p></div></body></html>"
)


def test_css_select_basics():
    doc = parse(CSSDOC)
    assert [e.text_content() for e in css_select(doc, "p.lead")] == ["first"]
    assert len(css_select(doc, "div p")) == 3
    assert [e.text_content() for e in css_select(doc, "#top > p")] == [
        "first", "second",
    ]
    assert len(css_select(doc, "div.wrap.main")) == 1
    assert [e.text_content() for e in css_select(doc, 'a[href^="https://"]')] == [
        "link"
    ]
    assert [e.text_content() for e in css_select(doc, "p.lead, a")] == [
        "first", "link",
    ]
    with pytest.raises(CSSError):
        css_select(doc, "p:nth-child(2)")


def test_extract_text_by_css_selector_contract():
    doc = parse(CSSDOC)
    vals, invalid = extract_text_by_css_selector(doc, "#top p")
    assert (vals, invalid) == (["first", "second"], False)
    vals, invalid = extract_text_by_css_selector(doc, ":::nope")
    assert (vals, invalid) == ([], True)


def test_css_selector_strategy_in_field_map():
    out = extract_by_xpath_map(
        CSSDOC,
        {
            "lead": {"strategy": "css_selector", "css_selector": "p.lead"},
            "missing": {"strategy": "css_selector", "css_selector": ".nope"},
            "invalid": {"strategy": "css_selector", "css_selector": ":::"},
            "blank": {"strategy": "css_selector"},
        },
    )
    assert out["lead"] == ["first"]
    assert out["missing"] == ["(Empty Result)"]
    assert out["invalid"][0].startswith("Error:")
    assert out["blank"] == ["Skipped: No XPath"]


def test_gen_xpath_by_text_predicates_and_suffix():
    doc = parse(
        '<html><body><div id="main"><p class="lead">Alpha beta</p>'
        "<p>gamma</p><p>Alpha beta gamma delta epsilon zeta</p>"
        "</div></body></html>"
    )
    from langscrape_spark.html.prune import gen_xpath_by_text

    # best match by length difference is the short exact-ish paragraph
    xps = gen_xpath_by_text(doc, "Alpha beta")
    assert xps == ['//div[@id="main"]/p[@class="lead"]']
    # the engine resolves its own output
    assert evaluate(doc, xps[0])[0].text_content() == "Alpha beta"
    # text_suffix: first text segment → /text(); later segments indexed
    xps = gen_xpath_by_text(doc, "Alpha beta", text_suffix=True)
    assert xps == ['//div[@id="main"]/p[@class="lead"]/text()']
    doc2 = parse("<html><body><p>one<b>x</b>two needle here</p></body></html>")
    xps = gen_xpath_by_text(doc2, "two needle here", text_suffix=True)
    assert xps == ["/html/body/p/text()[2]"]
    assert evaluate(doc2, xps[0]) == ["two needle here"]
    # no match → []
    assert gen_xpath_by_text(doc, "zzz missing") == []


def test_css_attribute_selectors_with_spaces_and_quotes():
    """Quoted attribute values containing spaces, padded '=' forms and
    top-level-only splitting: all valid CSS the reference's
    lxml CSSSelector accepts (review finding: the old whitespace
    tokenizer sheared brackets)."""
    doc = parse(
        '<html><body><a title="read more" href="x">one</a>'
        '<a title="other" role="main link">two</a></body></html>'
    )
    assert [e.text_content() for e in css_select(doc, 'a[title="read more"]')] == ["one"]
    assert [e.text_content() for e in css_select(doc, 'a[ title = "read more" ]')] == ["one"]
    assert [e.text_content() for e in css_select(doc, 'a[role~="main"]')] == ["two"]
    assert [e.text_content() for e in css_select(doc, 'body > a[title="read more"]')] == ["one"]
    # a comma inside a quoted value is content, not a group separator
    doc2 = parse('<html><body><p title="a,b">x</p><i>y</i></body></html>')
    got = [e.tag for e in css_select(doc2, 'p[title="a,b"], i')]
    assert got == ["p", "i"]
    with pytest.raises(CSSError):
        css_select(doc, 'a[title="unbalanced')
