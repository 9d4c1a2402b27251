"""A deterministic XPath-subset evaluator over the stdlib DOM.

The reference evaluates LLM-proposed XPaths with lxml
(``/root/reference/langscrape/html/xpath_extractor.py:74-86``). lxml is
unavailable here, so we implement the XPath 1.0 subset that covers the
field-maps this engine consumes (absolute / descendant paths, name and
wildcard steps, attribute and positional predicates, ``contains()``,
``text()`` and ``@attr`` terminals, ``|`` unions).

Semantics follow the XPath 1.0 spec (public W3C document):
- ``//x`` expands to ``descendant-or-self::node()/child::x`` — so a
  positional predicate in ``//p[1]`` means "first p child of its
  parent", matching lxml;
- predicates are evaluated against the node's position within the
  candidate list generated **per context node**, in document order;
- node-set results are returned in document order, deduplicated.

Unsupported syntax raises :class:`XPathError`; the extraction kernel
turns that into the reference's ``"Error: {e}"`` sentinel
(``xpath_extractor.py:84-86``).
"""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Sequence, Union

from .dom import Document, Element, Node, Text


class XPathError(ValueError):
    """Invalid or unsupported XPath expression."""


# ---------------------------------------------------------------------------
# Tokenizer / parser
# ---------------------------------------------------------------------------

_NAME_RE = re.compile(
    r"^(?P<axis>@)?(?P<name>[A-Za-z_][\w.-]*|\*|text\(\)|node\(\))$"
)


def _split_name_preds(raw: str) -> tuple:
    """Split one raw step into ``(name_part, [pred, ...])`` with
    quote- and depth-aware bracket scanning — a ``]`` inside a quoted
    string literal (``re:test(@id, 'a[0-9]')``) must NOT terminate the
    predicate, which a ``[^\\]]*`` regex would get wrong."""
    quote = ""
    split_at = len(raw)
    for idx, ch in enumerate(raw):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            split_at = idx
            break
    name, preds = raw[:split_at], []
    i, n = split_at, len(raw)
    while i < n:
        if raw[i] != "[":
            raise XPathError(f"unsupported step {raw!r}")
        depth, quote, j = 0, "", i
        while j < n:
            ch = raw[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
                if depth == 0:
                    break
            j += 1
        if j >= n:
            raise XPathError(f"unterminated predicate in {raw!r}")
        preds.append(raw[i + 1 : j])
        i = j + 1
    return name, preds


class _Step:
    __slots__ = ("descendant", "is_attr", "name", "preds")

    def __init__(self, descendant: bool, is_attr: bool, name: str, preds: List[str]):
        self.descendant = descendant
        self.is_attr = is_attr
        self.name = name
        self.preds = preds


def _split_union(expr: str) -> List[str]:
    """Split on top-level ``|`` (not inside brackets/quotes)."""
    parts, depth, quote, start = [], 0, "", 0
    for i, ch in enumerate(expr):
        if quote:
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
        elif ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        elif ch == "|" and depth == 0:
            parts.append(expr[start:i])
            start = i + 1
    parts.append(expr[start:])
    return [p.strip() for p in parts]


def _split_steps(path: str) -> List[_Step]:
    if not path:
        raise XPathError("empty XPath")
    steps: List[_Step] = []
    i = 0
    n = len(path)
    if path[0] != "/":
        # Relative path: treat as descendant from root (lxml on a
        # fragment behaves similarly for the field-map use case).
        path = "//" + path
        n = len(path)
    while i < n:
        if path[i] != "/":
            raise XPathError(f"unexpected character at {i} in {path!r}")
        descendant = False
        i += 1
        if i < n and path[i] == "/":
            descendant = True
            i += 1
        # consume one step up to the next top-level '/'
        j = i
        depth = 0
        quote = ""
        while j < n:
            ch = path[j]
            if quote:
                if ch == quote:
                    quote = ""
            elif ch in "'\"":
                quote = ch
            elif ch == "[":
                depth += 1
            elif ch == "]":
                depth -= 1
            elif ch == "/" and depth == 0:
                break
            j += 1
        raw = path[i:j]
        if not raw:
            raise XPathError(f"empty step in {path!r}")
        name_part, preds = _split_name_preds(raw)
        m = _NAME_RE.match(name_part)
        if not m:
            raise XPathError(f"unsupported step {raw!r}")
        steps.append(
            _Step(descendant, bool(m.group("axis")), m.group("name"), preds)
        )
        i = j
    return steps


# ---------------------------------------------------------------------------
# Predicate evaluation
# ---------------------------------------------------------------------------

_CONTAINS_RE = re.compile(
    r"^contains\(\s*(@[\w.-]+|text\(\)|\.)\s*,\s*(['\"])(.*)\2\s*\)$"
)
_STARTS_RE = re.compile(
    r"^starts-with\(\s*(@[\w.-]+|text\(\)|\.)\s*,\s*(['\"])(.*)\2\s*\)$"
)
_EQ_RE = re.compile(r"^(@[\w.-]+|text\(\)|\.)\s*=\s*(['\"])(.*)\2$")
_NOT_RE = re.compile(r"^not\((.*)\)$")
# EXSLT regular-expressions namespace, as used by the reference's trim
# rules and xpath evaluation (feilian/etree_tools.py:409-415,437-457):
# re:test(operand, 'pattern'[, 'flags']) — flags: 'i' case-insensitive.
_RE_TEST_RE = re.compile(
    r"^re:test\(\s*(@[\w.-]+|text\(\)|\.)\s*,\s*"
    r"(['\"])(.*?)\2\s*(?:,\s*(['\"])([a-z]*)\4\s*)?\)$"
)


def _operand_value(el: Element, operand: str) -> Optional[str]:
    if operand.startswith("@"):
        return el.attrs.get(operand[1:])
    if operand == "text()":
        return "".join(c.data for c in el.children if isinstance(c, Text))
    if operand == ".":
        return el.text_content()
    raise XPathError(f"unsupported operand {operand!r}")


def _compile_pred(pred: str) -> Callable[[Element, int, int], bool]:
    pred = pred.strip()
    if not pred:
        raise XPathError("empty predicate")
    if pred.isdigit():
        k = int(pred)
        return lambda el, pos, last: pos == k
    if pred == "last()":
        return lambda el, pos, last: pos == last
    m = _NOT_RE.match(pred)
    if m:
        inner = _compile_pred(m.group(1))
        return lambda el, pos, last: not inner(el, pos, last)
    m = _EQ_RE.match(pred)
    if m:
        operand, _, want = m.group(1), m.group(2), m.group(3)
        return lambda el, pos, last: _operand_value(el, operand) == want
    m = _CONTAINS_RE.match(pred)
    if m:
        operand, _, want = m.group(1), m.group(2), m.group(3)
        return (
            lambda el, pos, last: (lambda v: v is not None and want in v)(
                _operand_value(el, operand)
            )
        )
    m = _STARTS_RE.match(pred)
    if m:
        operand, want = m.group(1), m.group(3)
        return (
            lambda el, pos, last: (lambda v: v is not None and v.startswith(want))(
                _operand_value(el, operand)
            )
        )
    m = _RE_TEST_RE.match(pred)
    if m:
        operand, pattern, flags = m.group(1), m.group(3), m.group(5) or ""
        try:
            rx = re.compile(pattern, re.I if "i" in flags else 0)
        except re.error as e:
            raise XPathError(f"invalid re:test pattern {pattern!r}: {e}")
        return (
            lambda el, pos, last: (
                lambda v: v is not None and rx.search(v) is not None
            )(_operand_value(el, operand))
        )
    if pred.startswith("@") and re.fullmatch(r"@[\w.-]+", pred):
        name = pred[1:]
        return lambda el, pos, last: name in el.attrs
    raise XPathError(f"unsupported predicate [{pred}]")


# ---------------------------------------------------------------------------
# Evaluation
# ---------------------------------------------------------------------------

XPathResult = Union[Element, str]


def _child_elements(ctx: Element, name: str) -> List[Element]:
    return [
        c
        for c in ctx.children
        if isinstance(c, Element) and (name == "*" or name == "node()" or c.tag == name)
    ]


def _apply_preds(cands: List[Element], preds: List[str]) -> List[Element]:
    for pred in preds:
        fn = _compile_pred(pred)
        last = len(cands)
        cands = [el for pos, el in enumerate(cands, 1) if fn(el, pos, last)]
    return cands


def evaluate(doc: Document, expr: str) -> List[XPathResult]:
    """Evaluate ``expr``; returns Elements and/or strings (for ``@attr``
    and ``text()`` terminal steps), document-ordered, deduplicated."""
    results: List[XPathResult] = []
    seen_ids = set()
    for path in _split_union(expr):
        for item in _evaluate_path(doc, path):
            key = id(item) if isinstance(item, Element) else ("s", len(results), item)
            if isinstance(item, Element):
                if key in seen_ids:
                    continue
                seen_ids.add(key)
            results.append(item)
    return results


def _evaluate_path(doc: Document, path: str) -> List[XPathResult]:
    steps = _split_steps(path)
    contexts: List[Element] = [doc]
    for si, step in enumerate(steps):
        is_last = si == len(steps) - 1
        if step.is_attr:
            if not is_last:
                raise XPathError("@attr must be the final step")
            out: List[XPathResult] = []
            bases: List[Element] = []
            for ctx in contexts:
                bases.extend(ctx.descendants_or_self() if step.descendant else [ctx])
            seen = set()
            for el in bases:
                if id(el) in seen:
                    continue
                seen.add(id(el))
                v = el.attrs.get(step.name)
                if v is not None:
                    out.append(v)
            return out
        if step.name == "text()":
            if not is_last:
                raise XPathError("text() must be the final step")
            texts: List[XPathResult] = []
            for ctx in contexts:
                nodes = ctx.descendants_or_self() if step.descendant else [ctx]
                for el in nodes:
                    local = [c.data for c in el.children if isinstance(c, Text)]
                    for pred in step.preds:
                        fn = _compile_pred(pred)
                        lastn = len(local)
                        local = [
                            t for pos, t in enumerate(local, 1) if fn(el, pos, lastn)
                        ]
                    texts.extend(local)
            return texts
        next_ctx: List[Element] = []
        seen = set()
        for ctx in contexts:
            if step.descendant:
                # descendant-or-self::node()/child::name — per-parent
                # candidate lists keep positional predicates correct.
                cands: List[Element] = []
                for base in ctx.descendants_or_self():
                    cands.extend(
                        _apply_preds(_child_elements(base, step.name), step.preds)
                    )
            else:
                cands = _apply_preds(_child_elements(ctx, step.name), step.preds)
            for el in cands:
                if id(el) not in seen:
                    seen.add(id(el))
                    next_ctx.append(el)
        contexts = next_ctx
        if not contexts:
            return []
    return list(contexts)


def extract_text_by_xpath(doc: Document, xpath: str):
    """Reference contract (``feilian/etree_tools.py:437-457``):
    non-string xpath → ``[]``; invalid xpath → ``([], True)``; else
    string results pass through, element results render via
    ``convert_html_to_text(serialize)``, all normalized with
    ``normalize_text``, blanks dropped → ``(results, False)``.
    EXSLT ``re:test`` predicates are supported natively (the engine
    needs no namespace registration)."""
    from .textify import convert_html_to_text, normalize_text

    if not isinstance(xpath, str):
        return []
    results: List[str] = []
    try:
        for item in evaluate(doc, xpath):
            if item is None:
                continue
            if isinstance(item, str):
                results.append(item)
            else:
                results.append(convert_html_to_text(item.serialize()))
    except Exception:
        return [], True
    results = [normalize_text(x) for x in results]
    results = [x.strip() for x in results if x.strip()]
    return results, False


def get_predicates(el: Element, with_id: bool = True, with_class: bool = True) -> str:
    """``[@id="..."]`` / ``[@class="..."]`` predicate string for one
    element (reference ``feilian/etree_tools.py:460-474`` —
    ``get_predicates``): id wins over class; neither → ''."""
    if el.attrs:
        parts = []
        if with_id and "id" in el.attrs:
            parts.append(f'@id="{el.attrs["id"]}"')
        elif with_class and "class" in el.attrs:
            parts.append(f'@class="{el.attrs["class"]}"')
        if parts:
            return "[" + " and ".join(parts) + "]"
    return ""


def get_xpath_predicated(
    el: Element,
    short: bool = True,
    with_id: bool = True,
    with_class: bool = True,
) -> str:
    """Predicate-bearing xpath (reference ``feilian/etree_tools.py:
    477-523`` — the etree ``get_xpath``): each step carries its
    ``@id``/``@class`` predicate, position indexes count only siblings
    with the SAME tag+predicate, and ``short=True`` short-circuits at
    the nearest id-anchored ancestor (emitting a ``//``-prefixed
    path) — id/class-anchored xpaths survive template shifts that break
    purely positional ones."""
    xpath = ""
    node: Optional[Element] = el
    while node is not None and not isinstance(node, Document):
        parent = node.parent
        if parent is None or isinstance(parent, Document):
            xpath = f"/{node.tag}{xpath}"
            break
        part_str = get_predicates(node, with_id=with_id, with_class=with_class)
        idx = 0
        cur_idx = 0
        for sib in parent.children:
            if not isinstance(sib, Element):
                continue
            if part_str and sib.tag == node.tag and get_predicates(sib) == part_str:
                idx += 1
            elif not part_str and sib.tag == node.tag:
                idx += 1
            if sib is node:
                cur_idx = idx
        if idx == 1:
            xpath = f"/{node.tag}{part_str}{xpath}"
        else:
            xpath = f"/{node.tag}{part_str}[{cur_idx}]{xpath}"
        if short and node.attrs and "id" in node.attrs:
            xpath = "/" + xpath
            break
        node = node.parent
    return xpath


def get_xpath(el: Element) -> str:
    """Absolute positional xpath ``/a/b[2]/c`` via sibling counting
    (reference ``feilian/soup_tools.py:420-439``)."""
    parts: List[str] = []
    node: Optional[Element] = el
    while node is not None and not isinstance(node, Document) and node.parent is not None:
        siblings = [
            c for c in node.parent.children if isinstance(c, Element) and c.tag == node.tag
        ]
        if len(siblings) == 1:
            parts.append(node.tag)
        else:
            parts.append(f"{node.tag}[{siblings.index(node) + 1}]")
        node = node.parent
    return "/" + "/".join(reversed(parts))
