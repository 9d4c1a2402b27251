"""Structural DOM operators: token-budget pruning, structure
skeletons, repeated-sibling collapse, table extraction.

Reimplements (from scratch, on the stdlib DOM of ``dom.py``) the
feilian research layer's structural machinery:

- ``prune_by_tokens``      — /root/reference/feilian/etree_tools.py:254-296
- ``structure_skeleton``   — /root/reference/feilian/soup_tools.py:77-94
- ``collapse_repeated``    — /root/reference/feilian/soup_tools.py:234-292
  with the most-repeated-contiguous-run scan of
  /root/reference/feilian/tools.py:6-45
- ``extract_tables``       — /root/reference/feilian/soup_tools.py:121-181
- ``get_structure``        — /root/reference/feilian/soup_tools.py:295-303

All run *inside* Arrow batch functions; the one corpus-level operator,
``template_signature`` (page → md5 of its structure skeleton), turns
"group pages by template" — the natural precursor to per-template
XPath programs — into a plain groupBy over a mapInPandas column.

Token counts use whitespace+markup tokens (``_token_len``): the
reference counts LLM-tokenizer tokens, which is a calibration
difference, not a semantic one — the pruning algorithm is parameterized
on the counter.
"""

from __future__ import annotations

import hashlib
import re
from typing import Callable, Dict, Iterator, List, Optional

from .dom import Document, Element, Node, Text, parse
from .clean import clean_tree, extract_html_structure

# Words / numbers / single punctuation marks — markup tokens count too
# (a whitespace split would see "<p>w</p>" as one token and never
# prune). Stands in for the reference's LLM tokenizer.
_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\w\s]")


def _token_len(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


# --------------------------------------------------------------------------
# token-budget pruning
# --------------------------------------------------------------------------

def prune_by_tokens(
    el: Element,
    max_tokens: int,
    token_len: Callable[[str], int] = _token_len,
    from_right: bool = False,
) -> Element:
    """Greedy subtree keep under a token budget: if the element fits,
    keep it whole; otherwise keep its shell plus as many children (from
    the left, or right when ``from_right``) as fit, and recursively
    prune the first child that crossed the budget. Matches the
    reference's recursion shape (the budget-crossing child is kept and
    pruned, not dropped)."""
    if token_len(el.serialize()) <= max_tokens:
        return el
    children = [c for c in el.children]
    el.clear_children()
    shell_tokens = token_len(el.serialize())
    budget = max_tokens - shell_tokens
    if not children:
        return el
    ordered = list(reversed(children)) if from_right else children
    kept: List[Node] = []
    acc = 0
    crossing: Optional[Node] = None
    for child in ordered:
        child_tokens = token_len(
            child.serialize() if isinstance(child, Element) else str(child.data)
        )
        if acc + child_tokens > budget:
            crossing = child
            kept.append(child)
            break
        acc += child_tokens
        kept.append(child)
    if from_right:
        kept = list(reversed(kept))
    for child in kept:
        el.append(child)
    if isinstance(crossing, Element):
        prune_by_tokens(crossing, max(budget - acc, 0), token_len, from_right)
    return el


# --------------------------------------------------------------------------
# repeated-sibling collapse
# --------------------------------------------------------------------------

_CLASS_TAG_RE = re.compile(r"^<\w+ class=")


def _longest_repeated_run(sigs: List[str], raws: List[str]):
    """Find the contiguous subsequence with the most *adjacent* exact
    repetitions, anchored on spans containing a class-attributed tag
    (plain ``<div><div>`` runs are ignored, per the reference). Returns
    index spans of every repetition or None.

    The class-anchor test uses a prefix-sum (O(1) per span) instead of
    rescanning each span — the former per-(i,j) scan made the whole
    pass cubic in sibling count; backtracking compares remain bounded
    by matched repetitions, the reference's own cost shape
    (``feilian/tools.py:17-39``)."""
    n = len(sigs)
    # class_prefix[j] = number of class-anchored children in raws[:j]
    class_prefix = [0] * (n + 1)
    for i, r in enumerate(raws):
        class_prefix[i + 1] = class_prefix[i] + (
            1 if _CLASS_TAG_RE.match(r) else 0
        )
    best_count = 0
    best_spans = None
    for i in range(n):
        for j in range(i + 1, n + 1):
            if class_prefix[j] == class_prefix[i]:  # no anchored tag in span
                continue
            seq = sigs[i:j]
            width = j - i
            spans = [(i, j)]
            k = i - width
            while k >= 0 and sigs[k : k + width] == seq:
                spans.insert(0, (k, k + width))
                k -= width
            if len(spans) - 1 > best_count:
                best_count = len(spans) - 1
                best_spans = spans
    if best_spans is None or len(best_spans) < 2:
        return None
    return best_spans


def collapse_repeated(el: Element) -> None:
    """Keep one exemplar of repeated sibling groups (post-order over
    the whole tree): table/tbody keep their first tr, ul/ol their
    first li, runs of identically-serialized (or contiguously repeated)
    children collapse to the first occurrence. ``li`` and ``tr``-cells
    are left alone, matching the reference's special cases.

    Iterative post-order (explicit stack) — degenerately nested crawl
    pages must not blow the recursion limit inside an executor."""
    stack: List[tuple] = [(el, False)]
    while stack:
        node, expanded = stack.pop()
        if not expanded:
            stack.append((node, True))
            for child in node.children:
                if isinstance(child, Element):
                    stack.append((child, False))
            continue
        _collapse_one(node)


def _collapse_one(el: Element) -> None:
    children = list(el.children)
    if len(children) <= 1 or el.tag == "li":
        return
    first = children[0]
    first_tag = first.tag if isinstance(first, Element) else None
    if el.tag == "tr" and first_tag in ("td", "th"):
        return
    if el.tag in ("table", "tbody") and first_tag == "tr":
        _keep(el, children[:1])
        return
    if el.tag in ("ul", "ol") and first_tag == "li":
        _keep(el, children[:1])
        return

    raws = [
        c.serialize() if isinstance(c, Element) else str(c.data) for c in children
    ]
    sigs = [hashlib.md5(r.encode()).hexdigest() for r in raws]

    # tail of identical class-tagged children → keep through the first
    for i in range(len(raws) - 1):
        if not _CLASS_TAG_RE.match(raws[i]):
            continue
        if all(sigs[i] == s for s in sigs[i + 1 :]):
            _keep(el, children[: i + 1])
            return

    spans = _longest_repeated_run(sigs, raws)
    if spans:
        drop = set()
        for start, end in spans[1:]:
            drop.update(range(start, end))
        _keep(el, [c for i, c in enumerate(children) if i not in drop])


def _keep(el: Element, children: List[Node]) -> None:
    el.clear_children()  # O(k); a detach loop would be O(k²)
    for c in children:
        el.append(c)


def get_structure(html_str: str, unique: bool = True) -> Element:
    """parse → clean → skeleton → (optionally) collapse repeats; the
    full template-shape pipeline of the reference."""
    doc = parse(html_str)
    clean_tree(doc)
    extract_html_structure(doc)
    root = None
    for child in doc.children:
        if isinstance(child, Element):
            root = child
            break
    if root is None:
        root = Element("html")
    if unique:
        collapse_repeated(root)
    return root


def template_signature(html_str: str) -> str:
    """md5 of the unique structure skeleton — pages sharing a signature
    share a layout template."""
    return hashlib.md5(get_structure(html_str).serialize().encode()).hexdigest()


# --------------------------------------------------------------------------
# table extraction
# --------------------------------------------------------------------------

def _prev_sibling_text(el: Element) -> Optional[str]:
    parent = getattr(el, "parent", None)
    if parent is None:
        return None
    prev = None
    for c in parent.children:
        if c is el:
            break
        prev = c
    if prev is None:
        return None
    if isinstance(prev, Element):
        return prev.text_content().strip()
    if isinstance(prev, Text):
        return str(prev.data).strip()
    return None


def _table_title(el: Element) -> Optional[str]:
    for d in el.descendants_or_self():
        if d.tag == "caption":
            return d.text_content().strip()
    return _prev_sibling_text(el)


def extract_tables(root: Element, recursive: bool = False) -> List[Dict]:
    """Breadth-first scan for ``table`` elements; descent stops at each
    table (its nested tables land in ``children`` when ``recursive``).
    Each entry: {xpath, content, title, children}.

    Iterative without changing the recursive formulation's ORDER: each
    job runs one full BFS appending to its own sink; a found table's
    child subtrees are pushed as sub-jobs in LIFO-reversed order, so
    sibling subtrees fill a shared children list strictly in document
    order with per-subtree grouping — exactly the per-child recursive
    call order (a single global BFS queue would interleave nested
    tables across subtrees by depth instead)."""
    from .xpath import get_xpath

    out: List[Dict] = []
    jobs: List[tuple] = [(root, out)]
    while jobs:
        start, sink = jobs.pop()
        queue: List[Element] = [start]
        while queue:
            el = queue.pop(0)
            if el.tag == "table":
                entry = {
                    "xpath": get_xpath(el),
                    "content": el.serialize().strip(),
                    "title": _table_title(el),
                    "children": [],
                }
                sink.append(entry)
                if recursive:
                    subjobs = [
                        (c, entry["children"])
                        for c in el.children
                        if isinstance(c, Element)
                    ]
                    jobs.extend(reversed(subjobs))
                continue  # do not descend past a table at this layer
            queue.extend(c for c in el.children if isinstance(c, Element))
    return out


def table_stats(tables: List[Dict]) -> Dict[str, int]:
    """depth / count / max width over the nested table forest
    (iterative — forest depth equals table-nesting depth, which a
    hostile page can make arbitrary)."""
    count = 0
    max_depth = 0
    max_width = len(tables)
    stack: List[tuple] = [(t, 1) for t in tables]
    while stack:
        t, d = stack.pop()
        count += 1
        max_depth = max(max_depth, d)
        max_width = max(max_width, len(t["children"]))
        stack.extend((c, d + 1) for c in t["children"])
    return {"depth": max_depth, "count": count, "max_width": max_width}
