"""HTML minification — documented subset of the ``minify_html`` Rust
library the reference imports (``feilian/agents/agent.py:9,64``,
``feilian/agents/fragments_detection.py:14,33``,
``feilian/statistical_analysis.py:9,47``). The reference minifies
only to cut LLM prompt tokens; this port reproduces the
token-relevant transformations on the stdlib DOM:

- comments / processing instructions dropped; a doctype is kept and
  lower-cased (``minify_html`` minifies it to ``<!doctype html>``)
- whitespace: runs collapsed to one space in text outside the
  whitespace-sensitive elements (``pre``/``textarea``/``script``/
  ``style``); whitespace-only text between block-level siblings is
  removed; text adjacent to a block boundary is edge-trimmed
- attributes: empty values collapse to the bare name (``a=""`` → ``a``);
  values safe under the HTML spec's unquoted grammar lose their quotes
- ``keep_closing_tags=True`` (every reference call site that feeds
  downstream parsing uses it) serializes all end tags;
  ``False`` omits the spec's optional end tags (``</li>``, ``</p>``,
  ``</tr>``, …) the way ``minify_html`` does by default

Known divergences from the Rust lib (documented, not silent): no JS/CSS
minification (``minify_js``/``minify_css`` are off in every reference
call), no entity re-encoding of already-decoded text beyond the
serializer's standard escapes, and ``<html>``/``<head>``/``<body>``
opening tags are kept (the lib drops them by default; keeping them is
always valid HTML and parses identically).
"""

from __future__ import annotations

import re
from typing import List, Optional

from .dom import (
    VOID_ELEMENTS,
    Comment,
    Document,
    Element,
    Node,
    Text,
    _escape_attr,
    _escape_text,
    parse,
)

_WS_RE = re.compile(r"\s+")

# Whitespace-sensitive content: text inside these is emitted verbatim.
_PRESERVE = frozenset({"pre", "textarea", "script", "style"})

# Elements whose boundaries terminate an inline formatting context —
# whitespace against these boundaries is not rendered, so the minifier
# may drop it. Mirrors textify's block model plus document structure.
_BLOCK = frozenset(
    {
        "address", "article", "aside", "blockquote", "body", "caption",
        "center", "col", "colgroup", "dd", "details", "dialog", "div",
        "dl", "dt", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "head", "header", "hgroup",
        "hr", "html", "li", "link", "main", "menu", "meta", "nav", "ol",
        "option", "p", "section", "summary", "table", "tbody", "td",
        "tfoot", "th", "thead", "title", "tr", "ul",
    }
)

# End tags the HTML spec makes optional — omitted when
# ``keep_closing_tags=False`` (minify_html's default mode).
_OPTIONAL_END = frozenset(
    {
        "body", "caption", "colgroup", "dd", "dt", "head", "html", "li",
        "optgroup", "option", "p", "rp", "rt", "tbody", "td", "tfoot",
        "th", "thead", "tr",
    }
)

# HTML attribute values that stay unambiguous unquoted: non-empty, no
# whitespace, quotes, backtick, ``=``, ``<`` or ``>``.
_UNQUOTED_OK = re.compile(r"^[^\s\"'`=<>]+$")


def _is_block(node: Optional[Node]) -> bool:
    return isinstance(node, Element) and node.tag in _BLOCK


def _squash(el: Element, preserved: bool) -> None:
    """One-pass, in-place whitespace/comment pass over ``el``'s
    children (iterative callers walk the tree; this never recurses)."""
    kept: List[Node] = []
    for child in el.children:
        if isinstance(child, Comment):
            # doctype survives (handled at serialize time); comments die
            if child.data.startswith("!"):
                kept.append(child)
            else:
                child.parent = None
            continue
        kept.append(child)
    el.children = kept
    if preserved:
        return
    n = len(kept)
    for i, child in enumerate(kept):
        if not isinstance(child, Text):
            continue
        data = _WS_RE.sub(" ", child.data)
        prev_b = _is_block(kept[i - 1]) if i > 0 else el.tag in _BLOCK or isinstance(el, Document)
        next_b = _is_block(kept[i + 1]) if i < n - 1 else el.tag in _BLOCK or isinstance(el, Document)
        if prev_b:
            data = data.lstrip(" ")
        if next_b:
            data = data.rstrip(" ")
        child.data = data
    el.children = [
        c for c in el.children if not (isinstance(c, Text) and c.data == "")
    ]


def _serialize_min(nodes: List[Node], out: List[str], keep_closing: bool) -> None:
    stack: List[object] = list(reversed(nodes))
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
        elif isinstance(item, Text):
            parent = item.parent
            if parent is not None and parent.tag in _PRESERVE:
                out.append(item.data)
            else:
                out.append(_escape_text(item.data))
        elif isinstance(item, Comment):
            if item.data.startswith("!"):
                out.append(f"<{item.data.lower()}>")
        elif isinstance(item, Element):
            parts: List[str] = []
            for k, v in item.attrs.items():
                if v == "":
                    parts.append(f" {k}")
                elif _UNQUOTED_OK.match(v):
                    parts.append(f" {k}={v}")
                else:
                    parts.append(f' {k}="{_escape_attr(v)}"')
            attrs = "".join(parts)
            if item.tag in VOID_ELEMENTS and not item.children:
                # minify_html emits void elements without the XML slash
                out.append(f"<{item.tag}{attrs}>")
            else:
                out.append(f"<{item.tag}{attrs}>")
                if keep_closing or item.tag not in _OPTIONAL_END:
                    stack.append(f"</{item.tag}>")
                stack.extend(reversed(item.children))


def minify(html_str: str, keep_closing_tags: bool = False) -> str:
    """Minify an HTML string (reference ``minify_html.minify``,
    ``feilian/agents/agent.py:64`` with ``keep_closing_tags=True``,
    ``feilian/agents/fragments_detection.py:33`` with defaults).
    Parses its own tree — the input string is never mutated; safe on
    arbitrary crawl input (the parser never raises)."""
    doc = parse(html_str)
    # iterative walk: squash every element's child list exactly once,
    # tracking whether a whitespace-preserving ancestor encloses it
    work: List[tuple] = [(doc, False)]
    while work:
        el, preserved = work.pop()
        _squash(el, preserved)
        for c in el.children:
            if isinstance(c, Element):
                work.append((c, preserved or c.tag in _PRESERVE))
    out: List[str] = []
    _serialize_min(doc.children, out, keep_closing_tags)
    return "".join(out)
