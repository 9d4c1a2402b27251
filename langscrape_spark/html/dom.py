"""Minimal deterministic HTML DOM on the Python stdlib.

This module is the foundation of the extraction kernel. The reference
(DelmedigoA/langscrape) parses HTML with html5lib/lxml inside
BeautifulSoup (``/root/reference/langscrape/html/utils.py:91-103``);
those libraries are unavailable in this environment, so we implement a
small, fully deterministic DOM on ``html.parser.HTMLParser``. The DOM
defines the byte-identity contract for this engine: goldens in
``tests/`` are frozen against *this* parser, and every pandas UDF in
``langscrape_spark.functions`` parses with it, so extracted text is
byte-identical across runs, partitions and cluster sizes.

Design notes (public-knowledge HTML5 rules only):
- void elements never take children and serialize as ``<br/>``;
- a small implied-end-tag table mirrors the HTML5 tree construction
  rules that matter for crawl corpora (``p`` closed by block starts,
  ``li`` by ``li``, table cells/rows by their siblings);
- ``script``/``style`` contents are captured as raw text nodes (CDATA
  mode) exactly as html.parser reports them;
- attribute order is preserved as parsed (documents round-trip
  deterministically).

Everything here is pure Python and runs *inside* Arrow-batched pandas
UDFs — trees never cross the Spark boundary (SURVEY.md §1.1).
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Iterator, List, Optional, Tuple

VOID_ELEMENTS = frozenset(
    {
        "area", "base", "br", "col", "embed", "hr", "img", "input",
        "link", "meta", "param", "source", "track", "wbr",
    }
)

# Tags whose open implicitly closes a currently-open tag (HTML5 subset).
_BLOCK_STARTERS = frozenset(
    {
        "address", "article", "aside", "blockquote", "details", "div",
        "dl", "fieldset", "figcaption", "figure", "footer", "form",
        "h1", "h2", "h3", "h4", "h5", "h6", "header", "hr", "main",
        "menu", "nav", "ol", "p", "pre", "section", "table", "ul",
    }
)

# tag being opened -> set of open tags it implicitly closes
_IMPLIED_END: dict = {}
for _t in _BLOCK_STARTERS:
    _IMPLIED_END.setdefault(_t, set()).add("p")
_IMPLIED_END.setdefault("li", set()).add("li")
for _t in ("dd", "dt"):
    _IMPLIED_END.setdefault(_t, set()).update({"dd", "dt"})
for _t in ("td", "th"):
    _IMPLIED_END.setdefault(_t, set()).update({"td", "th"})
_IMPLIED_END.setdefault("tr", set()).update({"td", "th", "tr"})
_IMPLIED_END.setdefault("tbody", set()).update({"td", "th", "tr", "thead"})
_IMPLIED_END.setdefault("option", set()).add("option")

_WS_RE = re.compile(r"\s+")


class Node:
    """Base DOM node."""

    __slots__ = ("parent",)

    def __init__(self) -> None:
        self.parent: Optional["Element"] = None

    def detach(self) -> None:
        """Remove this node from its parent (bs4 ``extract`` analogue)."""
        if self.parent is not None:
            try:
                self.parent.children.remove(self)
            except ValueError:
                pass
            self.parent = None


class Text(Node):
    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data

    def __repr__(self) -> str:  # pragma: no cover
        return f"Text({self.data!r})"


class Comment(Node):
    """Comment / doctype / CDATA — the reference removes these as
    ``PreformattedString`` (``/root/reference/feilian/soup_tools.py:29-32``)."""

    __slots__ = ("data",)

    def __init__(self, data: str) -> None:
        super().__init__()
        self.data = data


class Element(Node):
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: Optional[List[Tuple[str, Optional[str]]]] = None) -> None:
        super().__init__()
        self.tag = tag
        # Preserve order; last duplicate wins (html.parser already lowercases names).
        self.attrs: dict = {}
        for k, v in attrs or []:
            self.attrs[k] = v if v is not None else ""
        self.children: List[Node] = []

    # --- tree ops -------------------------------------------------
    def append(self, node: Node) -> None:
        node.parent = self
        self.children.append(node)

    def clear_children(self) -> None:
        """Remove every child in O(k) — a per-child ``detach()`` loop
        is O(k²) (each remove() rescans the list), which matters on the
        10^4-wide sibling lists crawl pages contain."""
        for c in self.children:
            c.parent = None
        self.children = []

    def iter_elements(self) -> Iterator["Element"]:
        """Pre-order element iterator (self excluded). Iterative:
        crawl corpora contain degenerately-nested documents that would
        blow the recursion limit inside an executor."""
        stack: List[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Element):
                yield node
                stack.extend(reversed(node.children))

    def descendants_or_self(self) -> Iterator["Element"]:
        yield self
        yield from self.iter_elements()

    # --- text -----------------------------------------------------
    def get_text(self) -> str:
        """Concatenated descendant text (bs4 ``get_text()`` analogue)."""
        parts: List[str] = []
        self._collect_text(parts)
        return "".join(parts)

    def _collect_text(self, parts: List[str]) -> None:
        stack: List[Node] = list(reversed(self.children))
        while stack:
            node = stack.pop()
            if isinstance(node, Text):
                parts.append(node.data)
            elif isinstance(node, Element):
                stack.extend(reversed(node.children))

    def text_content(self) -> str:
        """lxml ``text_content()`` analogue (same concatenation)."""
        return self.get_text()

    # --- serialization ---------------------------------------------
    def serialize(self) -> str:
        out: List[str] = []
        _serialize_nodes([self], out)
        return "".join(out)

    def __repr__(self) -> str:  # pragma: no cover
        return f"<Element {self.tag} attrs={self.attrs}>"


class Document(Element):
    """Root container (not itself serialized as a tag)."""

    def __init__(self) -> None:
        super().__init__("#document")

    def serialize(self) -> str:
        out: List[str] = []
        _serialize_nodes(self.children, out)
        return "".join(out)


def _escape_text(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _escape_attr(s: str) -> str:
    return s.replace("&", "&amp;").replace('"', "&quot;")


_RAW_TEXT_TAGS = frozenset({"script", "style"})


def _serialize_nodes(nodes: List[Node], out: List[str]) -> None:
    """Iterative serializer (explicit stack — deep nesting must not
    recurse). Stack items are nodes to emit or literal closing strings."""
    stack: List[object] = list(reversed(nodes))
    while stack:
        item = stack.pop()
        if isinstance(item, str):
            out.append(item)
        elif isinstance(item, Text):
            parent = item.parent
            if parent is not None and parent.tag in _RAW_TEXT_TAGS:
                out.append(item.data)
            else:
                out.append(_escape_text(item.data))
        elif isinstance(item, Comment):
            out.append(f"<!--{item.data}-->")
        elif isinstance(item, Element):
            attrs = "".join(
                f' {k}="{_escape_attr(v)}"' for k, v in item.attrs.items()
            )
            if item.tag in VOID_ELEMENTS and not item.children:
                out.append(f"<{item.tag}{attrs}/>")
            else:
                out.append(f"<{item.tag}{attrs}>")
                stack.append(f"</{item.tag}>")
                stack.extend(reversed(item.children))


# -- spec-correct attribute entity decoding ---------------------------------
# html.parser unescapes attribute values with the TEXT tokenizer rules
# (html.unescape), but the HTML5 spec's attribute mode differs for
# legacy named references WITHOUT a trailing semicolon: when the next
# character is '=' or an ASCII alphanumeric, the reference is NOT
# decoded (13.2.5.73 "named character reference state").  html5lib —
# the reference's parser (langscrape/html/utils.py:98) — and every
# browser obey this, so a crawler using text rules would corrupt
# real-world hrefs: "?a=1&not=2" must stay "&not=2" (html.unescape
# yields "¬=2"), "&notify=1" must stay intact (text rules yield
# "¬ify=1") — mangled urls mean a diverged frontier and broken
# byte-identity on @href-predicated field maps.  We therefore discard
# the values html.parser hands us and re-extract them from the RAW
# start-tag text (get_starttag_text) with the attribute-mode rule.
# The tolerant regexes are html.parser's own (present since 3.3);
# if a future stdlib drops them we fall back to the decoded values.

try:  # pragma: no cover - availability probe
    from html.parser import attrfind_tolerant as _ATTRFIND
    from html.parser import tagfind_tolerant as _TAGFIND
except ImportError:  # pragma: no cover
    _ATTRFIND = _TAGFIND = None

from html.entities import html5 as _HTML5_ENTITIES

_CHARREF_ATTR = re.compile(
    r"&(#[0-9]+;?|#[xX][0-9a-fA-F]+;?|[^\t\n\f <&#;]{1,32};?)"
)
# The spec's "ASCII alphanumeric" — NOT str.isalnum(), which is
# Unicode-wide: '&noté' must DECODE (é is not ASCII alnum, so the
# reference is interpreted), while '&notx' must not.
_ASCII_ALNUM = frozenset(
    "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz"
)
_INVALID_CHARREFS = {
    0x00: "�", 0x0D: "\r", 0x80: "€", 0x81: "\x81",
    0x82: "‚", 0x83: "ƒ", 0x84: "„", 0x85: "…",
    0x86: "†", 0x87: "‡", 0x88: "ˆ", 0x89: "‰",
    0x8A: "Š", 0x8B: "‹", 0x8C: "Œ", 0x8D: "\x8d",
    0x8E: "Ž", 0x8F: "\x8f", 0x90: "\x90", 0x91: "‘",
    0x92: "’", 0x93: "“", 0x94: "”", 0x95: "•",
    0x96: "–", 0x97: "—", 0x98: "˜", 0x99: "™",
    0x9A: "š", 0x9B: "›", 0x9C: "œ", 0x9D: "\x9d",
    0x9E: "ž", 0x9F: "Ÿ",
}


def _replace_charref_attr(m) -> str:
    """html._replace_charref with the ATTRIBUTE-mode legacy rule: a
    named reference without its semicolon does not decode when the
    character that follows it is '=' or alphanumeric."""
    s = m.group(1)
    if s[0] == "#":  # numeric: same as text mode
        if s[1] in "xX":
            num = int(s[2:].rstrip(";"), 16)
        else:
            num = int(s[1:].rstrip(";"), 10)
        if num in _INVALID_CHARREFS:
            return _INVALID_CHARREFS[num]
        if 0xD800 <= num <= 0xDFFF or num > 0x10FFFF:
            return "�"
        return chr(num)
    if s in _HTML5_ENTITIES:  # full match (with or without ';')
        if not s.endswith(";"):
            nxt = m.string[m.end() : m.end() + 1]
            if nxt == "=" or nxt in _ASCII_ALNUM:
                return "&" + s
        return _HTML5_ENTITIES[s]
    # legacy longest prefix — attribute rule checks the char AFTER it
    for x in range(len(s) - 1, 1, -1):
        if s[:x] in _HTML5_ENTITIES:
            if s[x] == "=" or s[x] in _ASCII_ALNUM:
                return "&" + s
            return _HTML5_ENTITIES[s[:x]] + s[x:]
    return "&" + s


def _unescape_attr_value(value: str) -> str:
    if "&" not in value:
        return value
    return _CHARREF_ATTR.sub(_replace_charref_attr, value)


def _attrs_from_raw(raw: Optional[str]):
    """Re-extract (name, value) pairs from a raw start-tag string with
    attribute-mode unescaping — the same tolerant scan html.parser's
    parse_starttag runs, minus its text-mode unescape.  Returns None
    when the raw text is unavailable (caller falls back to the
    parser-decoded attrs)."""
    if raw is None or _ATTRFIND is None or _TAGFIND is None:
        return None
    m = _TAGFIND.match(raw, 1)
    if not m:
        return None
    attrs = []
    k = m.end()
    while True:
        am = _ATTRFIND.match(raw, k)
        if not am:
            break
        name, rest, value = am.group(1), am.group(2), am.group(3)
        if not rest:
            value = None
        elif (
            value[:1] == "'" == value[-1:]
            or value[:1] == '"' == value[-1:]
        ):
            value = value[1:-1]
        if value:
            value = _unescape_attr_value(value)
        attrs.append((name.lower(), value))
        k = am.end()
    return attrs


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Document()
        self.stack: List[Element] = [self.root]

    # -- helpers --
    @property
    def _top(self) -> Element:
        return self.stack[-1]

    def _implied_close(self, tag: str) -> None:
        closes = _IMPLIED_END.get(tag)
        if not closes:
            return
        while len(self.stack) > 1 and self._top.tag in closes:
            self.stack.pop()

    # -- HTMLParser callbacks --
    def handle_starttag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]) -> None:
        self._implied_close(tag)
        # attribute-mode entity decoding (see _attrs_from_raw): the
        # values in ``attrs`` were text-mode-unescaped by html.parser
        el = Element(tag, _attrs_from_raw(self.get_starttag_text()) or attrs)
        self._top.append(el)
        if tag not in VOID_ELEMENTS:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs: List[Tuple[str, Optional[str]]]) -> None:
        self._implied_close(tag)
        self._top.append(
            Element(tag, _attrs_from_raw(self.get_starttag_text()) or attrs)
        )

    def handle_endtag(self, tag: str) -> None:
        if tag in VOID_ELEMENTS:
            return
        # Find the nearest matching open tag; ignore stray end tags.
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return

    def handle_data(self, data: str) -> None:
        if data:
            self._top.append(Text(data))

    def handle_comment(self, data: str) -> None:
        self._top.append(Comment(data))

    def handle_decl(self, decl: str) -> None:
        # Doctype: the reference's cleaner removes it (PreformattedString);
        # model it as a Comment so clean_html drops it identically.
        self._top.append(Comment("!" + decl))

    def handle_pi(self, data: str) -> None:
        self._top.append(Comment("?" + data))


def parse(html_str: str) -> Document:
    """Parse HTML into a :class:`Document`. Never raises on malformed
    input (parity with html5lib's error-free guarantee)."""
    builder = _TreeBuilder()
    try:
        builder.feed(html_str)
        builder.close()
    except Exception:
        # html.parser is already tolerant; belt-and-braces: return what
        # was built so far rather than failing the whole Arrow batch.
        pass
    return builder.root


def collapse_whitespace(s: str) -> str:
    """``re.sub(r"\\s+", " ", s).strip()`` — the final step of
    ``clean_html_for_extraction3`` (reference ``langscrape/html/utils.py:102-103``)."""
    return _WS_RE.sub(" ", s).strip()
