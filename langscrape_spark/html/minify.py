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
  ``</tr>``, …) the way ``minify_html`` does by default — but only
  where the spec's followed-by condition holds, so the minified form
  re-parses to the identical DOM

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

# Optional end tags (HTML spec 13.1.2.4) are omitted only when the
# spec's FOLLOWED-BY condition holds — unconditional omission re-parses
# to a different DOM (e.g. ``<div><p>a</p>b</div>`` → ``<div><p>ab``
# folds the sibling text into the p). Per tag: the set of next-sibling
# element tags before which the end tag may drop.
_P_FOLLOWERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "details", "div",
        "dl", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hgroup", "hr",
        "main", "menu", "nav", "ol", "p", "pre", "section", "table",
        "ul",
    }
)
_OMIT_BEFORE = {
    "li": frozenset({"li"}),
    "dt": frozenset({"dt", "dd"}),
    "dd": frozenset({"dd", "dt"}),
    "p": _P_FOLLOWERS,
    "rt": frozenset({"rt", "rp"}),
    "rp": frozenset({"rt", "rp"}),
    "optgroup": frozenset({"optgroup"}),
    "option": frozenset({"option", "optgroup"}),
    "thead": frozenset({"tbody", "tfoot"}),
    "tbody": frozenset({"tbody", "tfoot"}),
    "tfoot": frozenset(),
    "tr": frozenset({"tr"}),
    "td": frozenset({"td", "th"}),
    "th": frozenset({"td", "th"}),
}
# Tags whose end tag may also drop when the element is the LAST child
# of its parent (dt/thead may not; p additionally requires the parent
# not be one of the inline-ish containers below).
_OMIT_AT_PARENT_END = frozenset(
    {
        "li", "dd", "p", "rt", "rp", "optgroup", "option", "tbody",
        "tfoot", "tr", "td", "th",
    }
)
_P_END_BAD_PARENTS = frozenset(
    {"a", "audio", "del", "ins", "map", "noscript", "video"}
)
# End tags omissible whenever not followed by whitespace or a comment;
# we require the stricter "next sibling is an element or nothing".
_OMIT_UNLESS_WS_OR_COMMENT = frozenset(
    {"head", "body", "html", "caption", "colgroup"}
)

# HTML attribute values that stay unambiguous unquoted: non-empty, no
# whitespace, quotes, backtick, ``=``, ``<``, ``>`` — and no ``&``:
# an unquoted entity-shaped suffix (``data-x=1&gt``) would DECODE on
# re-parse (named references without ';' are still decoded at end of
# an unquoted value); minify_html escapes these, we quote them.
_UNQUOTED_OK = re.compile(r"^[^\s\"'`=<>&]+$")


def _omit_end_tag(el: Element, next_sib: Optional[Node]) -> bool:
    """Spec-conditional optional-end-tag omission: True only when
    re-parsing the omitted form yields the identical DOM."""
    tag = el.tag
    if tag in _OMIT_UNLESS_WS_OR_COMMENT:
        return next_sib is None or isinstance(next_sib, Element)
    followers = _OMIT_BEFORE.get(tag)
    if followers is None:
        return False
    if next_sib is None:
        if tag not in _OMIT_AT_PARENT_END:
            return False
        if tag == "p":
            parent = el.parent
            return (
                isinstance(parent, Element)
                and parent.tag not in _P_END_BAD_PARENTS
            )
        return True
    return isinstance(next_sib, Element) and next_sib.tag in followers


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
    # stack holds either literal strings or (node, next_sibling) pairs —
    # the omission rules need each element's next sibling, threaded at
    # push time (never parent.children.index(): quadratic on wide lists)
    stack: List[object] = []

    def push_children(children: List[Node]) -> None:
        for i in range(len(children) - 1, -1, -1):
            nxt = children[i + 1] if i + 1 < len(children) else None
            stack.append((children[i], nxt))

    push_children(nodes)
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
            continue
        node, next_sib = item
        if isinstance(node, Text):
            parent = node.parent
            if parent is not None and parent.tag in _PRESERVE:
                out.append(node.data)
            else:
                out.append(_escape_text(node.data))
        elif isinstance(node, Comment):
            if node.data.startswith("!"):
                out.append(f"<{node.data.lower()}>")
        elif isinstance(node, Element):
            parts: List[str] = []
            for k, v in node.attrs.items():
                if v == "":
                    parts.append(f" {k}")
                elif _UNQUOTED_OK.match(v):
                    parts.append(f" {k}={v}")
                else:
                    parts.append(f' {k}="{_escape_attr(v)}"')
            attrs = "".join(parts)
            if node.tag in VOID_ELEMENTS and not node.children:
                # minify_html emits void elements without the XML slash
                out.append(f"<{node.tag}{attrs}>")
            else:
                out.append(f"<{node.tag}{attrs}>")
                if keep_closing or not _omit_end_tag(node, next_sib):
                    stack.append(f"</{node.tag}>")
                push_children(node.children)


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
