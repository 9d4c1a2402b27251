"""A deterministic CSS-selector subset over the stdlib DOM.

The reference's optional extraction strategy evaluates CSS selectors
with ``lxml.cssselect.CSSSelector``
(``/root/reference/feilian/etree_tools.py:460-474``,
``extract_text_by_css_selector``). lxml is unavailable here, so this
module implements the selector subset that covers field-map usage:

- type (``div``), universal (``*``), class (``.cls``), id (``#id``),
  attribute (``[attr]``, ``[attr=val]``, ``[attr~=val]``,
  ``[attr^=v]``, ``[attr$=v]``, ``[attr*=v]``) and any compound of
  them (``div.a.b[role=main]``);
- descendant (whitespace) and child (``>``) combinators;
- selector groups (``a, b``).

Unsupported syntax raises :class:`CSSError`; the extraction kernel
maps that to the reference's invalid-selector contract
(``([], True)``)."""

from __future__ import annotations

import re
from typing import Callable, List, Optional, Tuple

from .dom import Document, Element

__all__ = ["CSSError", "css_select", "extract_text_by_css_selector"]


class CSSError(ValueError):
    """Invalid or unsupported CSS selector."""


_SIMPLE_RE = re.compile(
    r"""(?P<tag>[A-Za-z][\w-]*|\*)?
        (?P<rest>(?:[.#][\w-]+|\[[^\]]+\])*)$""",
    re.X,
)
_PART_RE = re.compile(r"[.#][\w-]+|\[[^\]]+\]")
_ATTR_RE = re.compile(
    r"^\[\s*(?P<name>[\w-]+)\s*(?:(?P<op>[~^$*|]?=)\s*"
    r"(?P<q>['\"]?)(?P<val>[^'\"\]]*)(?P=q)\s*)?\]$"
)


def _compile_compound(sel: str) -> Callable[[Element], bool]:
    m = _SIMPLE_RE.match(sel)
    if not m or (not m.group("tag") and not m.group("rest")):
        raise CSSError(f"unsupported selector {sel!r}")
    tag = m.group("tag")
    checks: List[Callable[[Element], bool]] = []
    if tag and tag != "*":
        t = tag.lower()
        checks.append(lambda el: el.tag == t)
    for part in _PART_RE.findall(m.group("rest") or ""):
        if part.startswith("."):
            cls = part[1:]
            checks.append(
                lambda el, c=cls: c in (el.attrs.get("class") or "").split()
            )
        elif part.startswith("#"):
            ident = part[1:]
            checks.append(lambda el, i=ident: el.attrs.get("id") == i)
        else:
            am = _ATTR_RE.match(part)
            if not am:
                raise CSSError(f"unsupported attribute selector {part!r}")
            name, op, val = am.group("name"), am.group("op"), am.group("val")
            if op is None:
                checks.append(lambda el, n=name: n in el.attrs)
            elif op == "=":
                checks.append(lambda el, n=name, v=val: el.attrs.get(n) == v)
            elif op == "~=":
                checks.append(
                    lambda el, n=name, v=val: v in (el.attrs.get(n) or "").split()
                )
            elif op == "^=":
                checks.append(
                    lambda el, n=name, v=val: (el.attrs.get(n) or "").startswith(v)
                    and v != ""
                )
            elif op == "$=":
                checks.append(
                    lambda el, n=name, v=val: (el.attrs.get(n) or "").endswith(v)
                    and v != ""
                )
            elif op == "*=":
                checks.append(
                    lambda el, n=name, v=val: v != "" and v in (el.attrs.get(n) or "")
                )
            else:
                raise CSSError(f"unsupported attribute operator {op!r}")
    return lambda el: all(c(el) for c in checks)


def _tokenize(selector: str) -> List[str]:
    """Split into compounds and '>' combinators at TOP LEVEL only —
    whitespace inside ``[...]`` or quotes belongs to the attribute
    selector (``a[title="read more"]`` is one compound; a naive
    whitespace split would shear it mid-bracket)."""
    tokens: List[str] = []
    cur: List[str] = []
    depth = 0
    quote = ""
    for ch in selector.strip():
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = ""
            continue
        if ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif depth == 0 and ch == ">":
            if cur:
                tokens.append("".join(cur))
                cur = []
            tokens.append(">")
        elif depth == 0 and ch.isspace():
            if cur:
                tokens.append("".join(cur))
                cur = []
        else:
            cur.append(ch)
    if quote or depth != 0:
        raise CSSError(f"unbalanced quotes/brackets in {selector!r}")
    if cur:
        tokens.append("".join(cur))
    return tokens


def _parse_chain(selector: str) -> List[Tuple[str, Callable[[Element], bool]]]:
    """[(combinator, matcher)] — combinator is ' ' (descendant) or '>'
    (child); the first entry's combinator is ' ' from the root."""
    chain: List[Tuple[str, Callable[[Element], bool]]] = []
    comb = " "
    for tok in _tokenize(selector):
        if tok == ">":
            comb = ">"
            continue
        chain.append((comb, _compile_compound(tok)))
        comb = " "
    if not chain:
        raise CSSError(f"empty selector {selector!r}")
    return chain


def css_select(root: Document | Element, selector: str) -> List[Element]:
    """All elements matching ``selector``, in document order."""
    if not isinstance(selector, str) or not selector.strip():
        raise CSSError("empty selector")
    # top-level comma split (a ',' inside quotes/brackets is content)
    groups: List[str] = []
    cur: List[str] = []
    depth = 0
    quote = ""
    for ch in selector:
        if quote:
            cur.append(ch)
            if ch == quote:
                quote = ""
        elif ch in "'\"":
            quote = ch
            cur.append(ch)
        elif ch == "[":
            depth += 1
            cur.append(ch)
        elif ch == "]":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            groups.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    groups.append("".join(cur))
    chains = [_parse_chain(s) for s in groups if s.strip()]
    if not chains:
        raise CSSError(f"empty selector {selector!r}")

    out: List[Element] = []
    seen = set()
    for el in root.iter_elements():
        for chain in chains:
            if _matches_chain(el, chain):
                if id(el) not in seen:
                    seen.add(id(el))
                    out.append(el)
                break
    return out


def _matches_chain(el: Element, chain: List[Tuple[str, Callable]]) -> bool:
    """Right-to-left match: el must satisfy the last compound; each
    earlier compound must match an ancestor (descendant) or the parent
    (child)."""
    comb, matcher = chain[-1]
    if not matcher(el):
        return False
    return _match_rest(el, chain[:-1], comb)


def _match_rest(
    el: Element, rest: List[Tuple[str, Callable]], comb_to_el: str
) -> bool:
    if not rest:
        return True
    parent: Optional[Element] = el.parent
    comb, matcher = rest[-1]
    if comb_to_el == ">":
        if (
            parent is None
            or isinstance(parent, Document)
            or not matcher(parent)
        ):
            return False
        return _match_rest(parent, rest[:-1], comb)
    # descendant: any ancestor may satisfy the compound
    while parent is not None and not isinstance(parent, Document):
        if matcher(parent) and _match_rest(parent, rest[:-1], comb):
            return True
        parent = parent.parent
    return False


def extract_text_by_css_selector(
    root: Document | Element, css_selector: str
) -> Tuple[List[str], bool]:
    """Reference contract (``feilian/etree_tools.py:460-474``): invalid
    selector → ``([], True)``; else per-element
    ``unescape(convert_html_to_text(serialize(el)))``, stripped, blanks
    dropped, runs of 2+ spaces collapsed; ``(results, False)``."""
    import html as _html

    from .textify import convert_html_to_text

    try:
        elements = css_select(root, css_selector)
    except CSSError:
        return [], True
    results = [
        _html.unescape(convert_html_to_text(el.serialize())) for el in elements
    ]
    results = [x.strip() for x in results if x.strip()]
    results = [re.sub(r"  +", " ", x) for x in results]
    return results, False
