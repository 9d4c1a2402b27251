"""HTML cleaning — reimplements the reference's live cleaning pipeline.

Semantics reproduced exactly (traversal order included):

- ``feilian.soup_tools.clean_html`` (``/root/reference/feilian/
  soup_tools.py:26-74``): depth-first **post-order** walk; per node:
  1. comments / doctype / processing instructions removed;
  2. tags in INTERACTIVE_ELEMENTS removed (subtree and all);
  3. non-``img`` elements whose ``get_text().strip()`` is empty removed
     — post-order matters: children are cleaned before the parent's
     emptiness test, so a div that only contained a script becomes
     empty and is then removed;
  4. attributes whitelisted to ``[class, id, title, alt, href, src]``;
  5. ``href`` starting with ``javascript:`` dropped;
  6. ``img``'s ``src`` dropped.
- ``clean_html_for_extraction3`` (``/root/reference/langscrape/html/
  utils.py:91-103``, the live third definition): parse → feilian clean
  → serialize → collapse ``\\s+`` to single spaces → strip.
- ``feilian.etree_tools.clean_html`` deep/shallow variants
  (``/root/reference/feilian/etree_tools.py:174-236``): also drop
  INVISIBLE_ELEMENTS (head, title); deep mode additionally drops img +
  empty nodes and all attributes; both clear ``display:none`` nodes.

The INTERACTIVE_ELEMENTS set is copied semantically from
``/root/reference/feilian/html_constants.py:1-40``.
"""

from __future__ import annotations

from typing import Callable, List, Optional

from .dom import Comment, Document, Element, Node, Text, collapse_whitespace, parse

INTERACTIVE_ELEMENTS = frozenset(
    {
        "script", "style", "noscript", "svg", "iframe", "video", "audio",
        "source", "track", "link", "meta", "object", "param",
        # form elements
        "input", "label", "select", "textarea", "button", "fieldset",
        "legend", "datalist", "output", "option", "optgroup",
        # table elements
        "col", "colgroup",
        # other
        "map", "area", "base",
        # deprecated
        "embed",
    }
)

INVISIBLE_ELEMENTS = ("head", "title")

INLINE_ELEMENTS = frozenset(
    {
        "a", "abbr", "acronym", "b", "bdo", "big", "br", "button", "cite",
        "code", "dfn", "em", "i", "img", "input", "kbd", "label", "map",
        "object", "output", "q", "samp", "script", "select", "small",
        "span", "strong", "sub", "sup", "textarea", "time", "tt", "var",
    }
)

CONTAINER_ELEMENTS = frozenset({"table", "ul", "ol", "section", "article"})

_ATTR_WHITELIST = ("class", "id", "title", "alt", "href", "src")


def post_order_travel(node: Node, callback: Callable[[Node], None]) -> None:
    """Depth-first post-order traversal over a snapshot of children
    (reference ``deep_first_travel``, ``feilian/soup_tools.py:97-104``;
    the list() snapshot there is load-bearing and preserved here).
    Iterative — deep crawl pages must not hit the recursion limit."""
    stack: list = [(node, False)]
    while stack:
        current, expanded = stack.pop()
        if expanded or not isinstance(current, Element):
            callback(current)
            continue
        stack.append((current, True))
        for child in reversed(list(current.children)):
            stack.append((child, False))


def _clean_node(node: Node) -> None:
    if isinstance(node, Comment):
        node.detach()
        return
    if not isinstance(node, Element) or isinstance(node, Document):
        return
    if node.tag in INTERACTIVE_ELEMENTS:
        node.detach()
        return
    if node.tag != "img" and node.get_text().strip() == "":
        node.detach()
        return
    node.attrs = {k: v for k, v in node.attrs.items() if k in _ATTR_WHITELIST}
    href = node.attrs.get("href")
    if href is not None and href.startswith("javascript:"):
        del node.attrs["href"]
    if node.tag == "img" and "src" in node.attrs:
        del node.attrs["src"]


def clean_tree(doc: Document) -> Document:
    """feilian ``clean_html`` over an already-parsed tree."""
    post_order_travel(doc, _clean_node)
    return doc


def clean_html_for_extraction(html_content: str) -> str:
    """The live ``clean_html_for_extraction3`` pipeline: parse → clean
    → serialize → whitespace collapse → strip."""
    doc = parse(html_content)
    clean_tree(doc)
    return collapse_whitespace(doc.serialize())


def _display_none(el: Element) -> bool:
    style = el.attrs.get("style", "")
    return "display:none" in style.replace(" ", "").lower()


def clean_tree_etree_mode(doc: Document, deep: bool = False) -> Document:
    """``feilian.etree_tools.clean_html`` semantics (optional cleaning
    mode; reference ``feilian/etree_tools.py:174-236``): additionally
    removes head/title and display:none subtrees; ``deep`` drops img,
    empty nodes and *all* attributes (else whitelist ``[class, id]``)."""

    def cb(node: Node) -> None:
        if isinstance(node, Comment):
            node.detach()
            return
        if not isinstance(node, Element) or isinstance(node, Document):
            return
        if node.tag in INTERACTIVE_ELEMENTS or node.tag in INVISIBLE_ELEMENTS:
            node.detach()
            return
        if _display_none(node):
            node.detach()
            return
        if deep:
            if node.tag == "img" or node.get_text().strip() == "":
                node.detach()
                return
            node.attrs = {}
        else:
            node.attrs = {k: v for k, v in node.attrs.items() if k in ("class", "id")}
            href = node.attrs.get("href")
            if href is not None and href.startswith("javascript:"):
                del node.attrs["href"]
            if node.tag == "img" and "src" in node.attrs:
                del node.attrs["src"]

    post_order_travel(doc, cb)
    return doc


def extract_html_structure(doc: Document) -> Document:
    """Structural skeleton: drop text nodes, inline elements and all
    attributes except ``class`` (reference ``feilian/soup_tools.py:77-94``)."""

    def cb(node: Node) -> None:
        if isinstance(node, (Text, Comment)):
            node.detach()
            return
        if not isinstance(node, Element) or isinstance(node, Document):
            return
        if node.tag in INLINE_ELEMENTS:
            node.detach()
            return
        cls = node.attrs.get("class")
        node.attrs = {"class": cls} if cls else {}

    post_order_travel(doc, cb)
    return doc
