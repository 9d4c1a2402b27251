"""Structural operators (SURVEY §2.4): token pruning, skeleton +
repeated-sibling collapse, table extraction, template signatures."""

from langscrape_spark import synth
from langscrape_spark.html.dom import Element, parse
from langscrape_spark.html.structure import (
    _token_len,
    collapse_repeated,
    extract_tables,
    get_structure,
    prune_by_tokens,
    table_stats,
    template_signature,
)


def _first_element(html):
    doc = parse(html)
    return next(c for c in doc.children if isinstance(c, Element))


def test_prune_by_tokens_respects_budget_and_keeps_left():
    html = "<div>" + "".join(f"<p>word {i} here now</p>" for i in range(50)) + "</div>"
    el = _first_element(html)
    total = _token_len(el.serialize())
    assert total > 40
    pruned = prune_by_tokens(el, 40)
    kept = pruned.serialize()
    # keeps a left prefix; the crossing child is kept then pruned (so
    # the result may exceed the budget by at most one leaf child —
    # the reference's recursion shape, etree_tools.py:288-293)
    assert "word 0 here" in kept
    assert "word 49" not in kept
    assert _token_len(kept) <= 40 + 12


def test_prune_small_tree_untouched():
    html = "<div><p>tiny</p></div>"
    el = _first_element(html)
    before = el.serialize()
    assert prune_by_tokens(el, 1000).serialize() == before


def test_prune_from_right():
    html = "<div>" + "".join(f"<p>w{i}</p>" for i in range(30)) + "</div>"
    el = _first_element(html)
    kept = prune_by_tokens(el, 10, from_right=True).serialize()
    assert "w29" in kept and "w0" not in kept


def test_collapse_repeated_promos():
    html = (
        '<div class="wrap">'
        + '<div class="promo"><span>x</span></div>' * 5
        + "</div>"
    )
    el = _first_element(html)
    collapse_repeated(el)
    assert el.serialize().count('class="promo"') == 1


def test_collapse_table_and_list():
    html = "<table><tr><td>a</td></tr><tr><td>b</td></tr></table>"
    el = _first_element(html)
    collapse_repeated(el)
    assert el.serialize().count("<tr>") == 1
    ul = _first_element("<ul><li>1</li><li>2</li><li>3</li></ul>")
    collapse_repeated(ul)
    assert ul.serialize().count("<li>") == 1


def test_collapse_repeated_run_not_anchored_on_plain_tags():
    # runs without a class-attributed tag must NOT collapse
    html = "<div><p>a</p><p>a</p><p>a</p></div>"
    el = _first_element(html)
    collapse_repeated(el)
    assert el.serialize().count("<p>") == 3


def test_template_signature_groups_same_layout():
    # synth pages share one template family modulo paragraph count
    sigs = {template_signature(synth.page_html(i, 50)) for i in range(8)}
    assert len(sigs) < 8  # pages with equal para-count collapse together
    # and differ from a trivially different layout
    assert template_signature("<html><body><p>x</p></body></html>") not in sigs


def test_extract_tables_nested():
    html = (
        "<div><p>Quarterly results</p>"
        "<table><caption>Outer</caption>"
        "<tr><td><table><tr><td>inner</td></tr></table></td></tr>"
        "</table></div>"
    )
    el = _first_element(html)
    top = extract_tables(el)
    assert len(top) == 1 and top[0]["title"] == "Outer"
    rec = extract_tables(el, recursive=True)
    assert len(rec) == 1 and len(rec[0]["children"]) == 1
    stats = table_stats(rec)
    assert stats == {"depth": 2, "count": 2, "max_width": 1}


def test_table_title_from_prev_sibling():
    html = "<div><p>Scores</p><table><tr><td>1</td></tr></table></div>"
    el = _first_element(html)
    tables = extract_tables(el)
    assert tables[0]["title"] == "Scores"


def test_get_structure_drops_text_and_inline():
    s = get_structure(synth.page_html(3, 50)).serialize()
    assert "<p" in s or "<div" in s
    assert "Article" not in s  # no text survives
    assert "<a " not in s and "<span" not in s  # inline gone


def test_extract_tables_nested_child_order_is_per_subtree():
    """Nested children keep per-child-subtree grouping in document
    order (the recursive formulation's order): a deep table in the
    FIRST child subtree precedes a shallow one in the SECOND, even
    though a global BFS would discover the shallow one first."""
    from langscrape_spark.html.dom import parse
    from langscrape_spark.html.structure import extract_tables
    from langscrape_spark.html.xpath import evaluate

    # two separate direct child subtrees of the outer table: first is
    # deep, second is shallow — per-subtree grouping keeps deepA first;
    # a global BFS would emit shallowB first. (Within ONE subtree, BFS
    # order still applies, matching the reference's per-child
    # extract_tables call.)
    html = (
        "<table>"
        "<div><div><table id='deepA'><tr><td>a</td></tr></table></div></div>"
        "<div><table id='shallowB'><tr><td>b</td></tr></table></div>"
        "</table>"
    )
    root = evaluate(parse(f"<html><body>{html}</body></html>"), "/html/body")[0]
    out = extract_tables(root, recursive=True)
    assert len(out) == 1
    kids = out[0]["children"]
    assert [("deepA" in k["content"], "shallowB" in k["content"]) for k in kids] == [
        (True, False), (False, True),
    ]
