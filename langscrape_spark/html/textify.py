"""HTML → text conversion and text normalization.

Reproduces, in pure stdlib Python:

- ``convert_html_to_text`` (``/root/reference/feilian/text_tools.py:6-17``):
  inscriptis ``get_text`` with links/anchors hidden, then per-line strip,
  blank-line drop, join with ``\\n``. inscriptis is unavailable here, so
  the block/inline rendering is reimplemented: block-level tags start a
  new line, ``br`` breaks a line, table cells are joined by spaces,
  ``script``/``style``/``display:none`` content is hidden. Because the
  reference's own post-processing strips every line and drops all blank
  lines, the observable contract is exactly "which text lands on which
  line" — which this renderer defines deterministically.
- ``normalize_text`` (``feilian/text_tools.py:20-48``): 25 literal
  entity replacements **in order**, ``html.unescape``, nbsp→space,
  collapse runs of 2+ spaces, strip. Ported verbatim (order matters:
  e.g. ``&amp;lt;`` → ``&lt;`` → ``<`` only because unescape runs
  after the literal table).
- ``remove_control_characters`` (``feilian/etree_tools.py:19-68``):
  xmlcharref round-trip + two char-ref regex passes + illegal-char
  regex. Ported verbatim.
- ``pdf_text_normalizer`` (``langscrape/pdf/pdf_utils.py:7-14``).
"""

from __future__ import annotations

import html as _html
import re
from typing import List

from .dom import Comment, Document, Element, Node, Text, parse

# --- remove_control_characters (verbatim semantics) -----------------------

ILLEGAL_XML_CHARS_RE = re.compile(
    r"[\x00-\x08\x0b\x0c\x0e-\x1F\uD800-\uDFFF￾￿]"
)


def _strip_illegal_xml_characters(s: str, default: str, base: int = 10) -> str:
    n = int(s, base)
    if (
        n in (0xB, 0xC, 0xFFFE, 0xFFFF)
        or 0x0 <= n <= 0x8
        or 0xE <= n <= 0x1F
        or 0xD800 <= n <= 0xDFFF
    ):
        return ""
    return default


def remove_control_characters(html_str: str) -> str:
    html_str = html_str.encode("ascii", "xmlcharrefreplace").decode("utf-8")
    html_str = re.sub(
        r"&#(\d+);?",
        lambda c: _strip_illegal_xml_characters(c.group(1), c.group(0)),
        html_str,
    )
    html_str = re.sub(
        r"&#[xX]([0-9a-fA-F]+);?",
        lambda c: _strip_illegal_xml_characters(c.group(1), c.group(0), base=16),
        html_str,
    )
    return ILLEGAL_XML_CHARS_RE.sub("", html_str)


# --- normalize_text (verbatim port; replacement order preserved) ----------

_ENTITY_TABLE = (
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&amp;", "&"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&#150;", "–"),
    ("&nbsp;", " "),
    ("&#160;", " "),
    ("&#039;", "'"),
    ("&#34;", '"'),
    ("&reg;", "®"),
    ("&rsquo;", "’"),
    ("&#8226;", "•"),
    ("&ndash;", "–"),
    ("&#x27;", "'"),
    ("&#40;", "("),
    ("&#41;", ")"),
    ("&#47;", "/"),
    ("&#43;", "+"),
    ("&#035;", "#"),
    ("&#38;", "&"),
    ("&eacute;", "é"),
    ("&frac12;", "½"),
)

_MULTISPACE_RE = re.compile(r"  +")


def normalize_text(text: str) -> str:
    for src, dst in _ENTITY_TABLE:
        text = text.replace(src, dst)
    text = _html.unescape(text)
    text = text.replace("\xa0", " ")
    text = _MULTISPACE_RE.sub(" ", text)
    return text.strip()


# --- convert_html_to_text ---------------------------------------------------

_HIDDEN_TAGS = frozenset({"script", "style", "noscript", "template", "head", "title"})
_CELL_TAGS = frozenset({"td", "th"})

# Tags that force a line break before and after their content.
_BLOCK_TAGS = frozenset(
    {
        "address", "article", "aside", "blockquote", "caption", "center",
        "dd", "details", "dir", "div", "dl", "dt", "fieldset", "figcaption",
        "figure", "footer", "form", "h1", "h2", "h3", "h4", "h5", "h6",
        "header", "hr", "li", "main", "menu", "nav", "ol", "p", "pre",
        "section", "summary", "table", "tbody", "tfoot", "thead", "tr",
        "ul",
    }
)


def _is_hidden(el: Element) -> bool:
    style = el.attrs.get("style", "")
    return el.tag in _HIDDEN_TAGS or "display:none" in style.replace(" ", "").lower()


def _render(root: Node, lines: List[List[str]]) -> None:
    # Iterative pre/post walk (deep nesting must not recurse).
    stack: List[object] = [root]
    while stack:
        item = stack.pop()
        if item is _LINE_BREAK:
            lines.append([])
            continue
        node = item
        if isinstance(node, Text):
            if node.data:
                lines[-1].append(node.data)
            continue
        if isinstance(node, Comment) or not isinstance(node, Element):
            continue
        el = node
        if not isinstance(el, Document):
            if _is_hidden(el):
                continue
            if el.tag == "br":
                lines.append([])
                continue
            if el.tag in _CELL_TAGS:
                # cells are space-joined on the row's line
                lines[-1].append(" ")
            elif el.tag in _BLOCK_TAGS:
                lines.append([])
                stack.append(_LINE_BREAK)  # break after children too
        stack.extend(reversed(el.children))


class _LineBreak:
    __slots__ = ()


_LINE_BREAK = _LineBreak()


def convert_html_to_text(html_str: str) -> str:
    """Block-structured text with the reference's post-processing:
    strip each line, drop blanks, join by newline."""
    doc = parse(html_str)
    lines: List[List[str]] = [[]]
    _render(doc, lines)
    texts = ["".join(parts) for parts in lines]
    texts = [t.strip() for t in texts if t.strip()]
    text = "\n".join(texts)
    return text.replace("\n\n", "\n")


def html_to_text(html_str: str) -> str:
    """The full ``text`` column derivation: control-char strip →
    block render → normalize each line (reference composition used in
    ``feilian/etree_tools.py:437-457``)."""
    cleaned = remove_control_characters(html_str)
    text = convert_html_to_text(cleaned)
    lines = [normalize_text(t) for t in text.split("\n")]
    return "\n".join(t for t in lines if t)


# --- PDF text normalizer ----------------------------------------------------

_DOTS_RE = re.compile(r"\.{2,}")
_WS_RE = re.compile(r"\s+")


def pdf_text_normalizer(text: str) -> str:
    """``/root/reference/langscrape/pdf/pdf_utils.py:7-14``."""
    text = _DOTS_RE.sub(".", text)
    text = _WS_RE.sub(" ", text)
    return text.strip()
