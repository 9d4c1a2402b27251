"""The feilian pruning tail: xpath-directed pruning, structure-guided
pruning, text collapsing, token-weighted fragment extraction, and the
text→node reverse lookups.

Reimplements (from scratch, on the stdlib DOM of ``dom.py``) the
remaining reference tree surgery:

- ``get_text_content`` / ``replace_with_text`` / ``prune_to_text``
  — /root/reference/feilian/etree_tools.py:302-340
- ``prune_by_xpath`` / ``extraction_based_pruning``
  — /root/reference/feilian/etree_tools.py:359-382,418-427
- ``apply_trim_rules`` / ``remove_by_xpath``
  — /root/reference/feilian/etree_tools.py:409-415,430-434
  (EXSLT ``re:`` handled natively by the xpath engine)
- ``prune_by_structure`` — /root/reference/feilian/soup_tools.py:326-358
- ``get_node_contain_text`` / ``get_common_ancestor`` /
  ``get_node_depth`` — /root/reference/feilian/soup_tools.py:442-486
- token tree: ``find_node`` / ``remove_node`` / ``remove_node_until`` /
  ``extract_fragments_by_weight``
  — /root/reference/feilian/etree_token_stats.py:195-268

All of these are per-document algorithms that run INSIDE Arrow batch
functions (mapInPandas) — trees never cross the Spark boundary. The
corpus-scale analogue of the weight formula lives in
``operators/domtable.py::node_weights``; this module is the in-UDF
mutating counterpart the fragment-extraction loop needs.
"""

from __future__ import annotations

import html as _html
import math
import re
from typing import Callable, Iterator, List, Optional, Tuple

from .clean import CONTAINER_ELEMENTS, INLINE_ELEMENTS
from .dom import Document, Element, Node, Text
from .xpath import evaluate, get_xpath

_WS_RE = re.compile(r"\s+")


# ---------------------------------------------------------------------------
# text collapsing (etree_tools.py:302-340)
# ---------------------------------------------------------------------------

def get_text_content(el: Element) -> str:
    """Space-joined stripped text fragments (reference
    ``get_text_content``: itertext, strip, drop blanks, join ' ')."""
    parts: List[str] = []
    stack: List[Node] = list(reversed(el.children))
    while stack:
        node = stack.pop()
        if isinstance(node, Text):
            t = node.data.strip()
            if t:
                parts.append(t)
        elif isinstance(node, Element):
            stack.extend(reversed(node.children))
    return " ".join(parts)


def replace_with_text(el: Element) -> None:
    """Collapse the subtree to its joined text (reference
    ``replace_with_text``: text := get_text_content, children removed)."""
    text = get_text_content(el)
    el.clear_children()
    if text:
        el.append(Text(text))


def prune_to_text(el: Element) -> Element:
    """Reference ``prune_to_text``: childless node → strip its text;
    ``tr`` → collapse each ``td`` child; ``table`` → untouched (the
    reference's TODO); ``ul``/``ol`` → collapse each ``li`` child;
    anything else → collapse wholesale."""
    child_elems = [c for c in el.children if isinstance(c, Element)]
    if not child_elems:
        for c in el.children:
            if isinstance(c, Text):
                c.data = c.data.strip()
        return el
    if el.tag == "tr":
        for child in child_elems:
            if child.tag == "td":
                replace_with_text(child)
    elif el.tag == "table":
        return el
    elif el.tag in {"ul", "ol"}:
        for child in child_elems:
            if child.tag == "li":
                replace_with_text(child)
    else:
        replace_with_text(el)
    return el


# ---------------------------------------------------------------------------
# xpath-directed pruning (etree_tools.py:359-434)
# ---------------------------------------------------------------------------

def parent_xpath(xpath: str) -> str:
    return "/".join(xpath.split("/")[:-1])


def prune_by_xpath(
    el: Element, xpath: str, includes: List[str], _child_idx: int | None = None
) -> bool:
    """Reference ``prune_by_xpath``: keep nodes on a path to (or under)
    any include xpath; a node that is neither, but whose PARENT path is
    on an include path, is cleared to the "..." ellipsis marker (its
    subtree removed). Returns whether traversal should continue below.

    DOM note: lxml stores ``text``/``tail`` on the element; this DOM
    keeps text nodes in ``children``, so "text = '...'" becomes a
    single ellipsis text child, and the tail ellipsis replaces the
    immediately-following sibling text node when one exists."""
    is_in_path = any(x.startswith(xpath) for x in includes)
    is_contained = any(xpath.startswith(x) for x in includes)
    if not is_in_path and not is_contained:
        include_parent = any(
            x.startswith(parent_xpath(xpath)) for x in includes
        )
        if include_parent:
            had_text = any(
                isinstance(c, Text) and c.data.strip() for c in el.children
            )
            el.clear_children()
            if had_text:
                el.append(Text("..."))
            parent = el.parent
            if parent is not None:
                # _child_idx (from the traversal) avoids an O(siblings)
                # index() per pruned node — quadratic on wide lists
                idx = (
                    _child_idx
                    if _child_idx is not None
                    else parent.children.index(el)
                )
                if idx + 1 < len(parent.children):
                    nxt = parent.children[idx + 1]
                    if isinstance(nxt, Text) and nxt.data.strip():
                        nxt.data = "..."
            return False
    return True


def _child_steps(el: Element) -> List[Tuple[Element, str, int]]:
    """(child, '/tag[i]', raw index in el.children) computed in ONE
    pass — per-child ``get_xpath``/``children.index`` would rescan the
    sibling list per node, quadratic on the 10^4-wide lists crawl
    pages contain. Raw indexes stay valid during the pruning walk: the
    walk clears grandchildren but never detaches the children
    themselves."""
    counts: dict = {}
    for c in el.children:
        if isinstance(c, Element):
            counts[c.tag] = counts.get(c.tag, 0) + 1
    order: dict = {}
    out: List[Tuple[Element, str, int]] = []
    for raw_i, c in enumerate(el.children):
        if not isinstance(c, Element):
            continue
        idx = order.get(c.tag, 0) + 1
        order[c.tag] = idx
        step = f"/{c.tag}[{idx}]" if counts[c.tag] > 1 else f"/{c.tag}"
        out.append((c, step, raw_i))
    return out


def extraction_based_pruning(doc: Document | Element, includes: List[str]) -> None:
    """Reference ``extraction_based_pruning``: pre-order walk applying
    :func:`prune_by_xpath`; a False return stops descending into that
    node (its subtree was just pruned). XPaths are threaded through the
    traversal (O(n) total) instead of recomputed per node."""
    if isinstance(doc, Document):
        roots = [(c, step, i) for c, step, i in _child_steps(doc)]
    else:
        roots = [(doc, get_xpath(doc), None)]
    stack: List[Tuple[Element, str, int | None]] = list(reversed(roots))
    while stack:
        el, xp, raw_i = stack.pop()
        if prune_by_xpath(el, xp, includes, _child_idx=raw_i):
            stack.extend(
                reversed(
                    [(c, xp + step, i) for c, step, i in _child_steps(el)]
                )
            )


def remove_by_xpath(doc: Document | Element, xpath: str) -> None:
    """Detach every element matched by ``xpath`` (reference
    ``remove_by_xpath``; EXSLT ``re:test`` predicates work natively)."""
    root = doc if isinstance(doc, Document) else _wrap(doc)
    for item in evaluate(root, xpath):
        if isinstance(item, Element):
            item.detach()


def apply_trim_rules(doc: Document | Element, rules: List[str]) -> None:
    """Reference ``apply_trim_rules``: each rule xpath's matches are
    removed in order."""
    for rule in rules:
        remove_by_xpath(doc, rule)


def _wrap(el: Element) -> Document:
    d = Document()
    d.children = [el]
    return d


# ---------------------------------------------------------------------------
# structure-guided pruning (soup_tools.py:295-358)
# ---------------------------------------------------------------------------

def is_same_element(e1: Node, e2: Node) -> bool:
    """Reference ``_is_same_element``: both tags, same name, same
    class attribute."""
    if not isinstance(e1, Element) or not isinstance(e2, Element):
        return False
    if e1.tag != e2.tag:
        return False
    if e1.attrs or e2.attrs:
        if e1.attrs.get("class") != e2.attrs.get("class"):
            return False
    return True


def prune_by_structure(origin: Element, structure: Element) -> None:
    """Walk ``origin`` and a structure skeleton in lockstep; origin
    children absent from the skeleton are extracted, and trailing
    unmatched origin children are dropped (reference
    ``prune_by_structure`` — the skeleton acts as a keep-list)."""
    assert is_same_element(origin, structure), (
        "The structure is not the same as the origin."
    )
    # iterative lockstep (explicit stack): crawl pages nest
    # degenerately. Unmatched children are collected and the kept list
    # assigned once — a detach() per mismatch would rescan the sibling
    # list per removal, quadratic on 10^4-wide lists.
    stack: List[Tuple[Element, Element]] = [(origin, structure)]
    while stack:
        o, s = stack.pop()
        if not o.children or not s.children:
            continue
        kept: List[Node] = []
        si = 0
        for oc in o.children:
            if si < len(s.children) and is_same_element(oc, s.children[si]):
                stack.append((oc, s.children[si]))
                kept.append(oc)
                si += 1
            else:
                oc.parent = None  # dropped (mismatch or surplus)
        o.children = kept


# ---------------------------------------------------------------------------
# text → node reverse lookups (soup_tools.py:442-486)
# ---------------------------------------------------------------------------

def get_node_depth(node: Node) -> int:
    depth = 0
    cur: Optional[Node] = node
    while cur is not None and cur.parent is not None:
        cur = cur.parent
        depth += 1
    return depth


def _norm(s: str) -> str:
    s = _html.unescape(_html.unescape(s))
    return _WS_RE.sub(" ", s).strip()


def get_node_contain_text(doc: Document | Element, text: str) -> Optional[Element]:
    """Deepest element whose direct text contains the (whitespace- and
    entity-normalized) target (reference ``get_node_contain_text``;
    bs4 returns the NavigableString — this DOM returns its parent
    element, the node every caller takes ``get_xpath`` of)."""
    text = _norm(text)
    root: Element = doc
    for el in doc.iter_elements():
        if el.tag == "body":
            root = el
            break
    best: Optional[Element] = None
    best_depth = -1
    for el in root.descendants_or_self():
        for c in el.children:
            if not isinstance(c, Text):
                continue
            target = _norm(c.data.strip())
            if not target:
                continue
            if text in target:
                d = get_node_depth(el)
                # '>=' keeps the LAST deepest match in document order:
                # the reference iterates reversed(find_all) and max()
                # over insertion order, which resolves depth ties to
                # the last-deepest node — '>' would anchor duplicated
                # text to a different node than the reference.
                if d >= best_depth:
                    best_depth = d
                    best = el
    return best


def get_common_ancestor(nodes: List[Element]) -> Optional[Element]:
    """Reference ``get_common_ancestor``: fold over the node list,
    lifting the running ancestor until it appears among the next
    node's parents."""
    if not nodes:
        return None
    common = nodes[0]
    for node in nodes[1:]:
        node_parents = []
        cur = node.parent
        while cur is not None:
            node_parents.append(cur)
            cur = cur.parent
        chain = [common]
        cur = common.parent
        while cur is not None:
            chain.append(cur)
            cur = cur.parent
        for cand in chain:
            if any(cand is p for p in node_parents):
                common = cand
                break
    return common


def itertext_nodes(root: Element) -> Iterator[Tuple[Element, str, int]]:
    """Document-order text segments as (parent element, raw text,
    per-parent index) — the reference's ``itertext``
    (``feilian/etree_tools.py:526-541``), where lxml ``.text``/``.tail``
    segments are attributed to the enclosing parent with a running
    per-parent index. In this DOM both map to Text children of the
    same parent, so the index is the text-child ordinal. Iterative."""
    counters: dict = {}
    stack: List[Node] = list(reversed(root.children))
    while stack:
        node = stack.pop()
        if isinstance(node, Text):
            parent = node.parent
            if parent is None:
                continue
            idx = counters.get(id(parent), 0) + 1
            counters[id(parent)] = idx
            yield parent, node.data, idx
        elif isinstance(node, Element):
            stack.extend(reversed(node.children))


def gen_xpath_by_text(
    root: Element,
    target_text: str,
    text_suffix: bool = False,
    short: bool = True,
    with_id: bool = True,
    with_class: bool = True,
) -> List[str]:
    """Reverse index: xpaths of the text nodes best matching
    ``target_text`` (reference ``gen_xpath_by_text``,
    ``feilian/etree_tools.py:544-594``): containment either way on
    normalized text, candidates ranked by |len(raw text) −
    len(normalized target)| (the reference's raw-vs-normalized length
    quirk, kept), all minimum-score candidates emitted as
    predicate-bearing xpaths, optionally with a ``/text()[i]``
    suffix. Corpus-scale analogue: ``operators/domtable.py::
    xpath_for_value``."""
    from .textify import normalize_text
    from .xpath import get_xpath_predicated

    target = normalize_text(target_text)
    results: List[Tuple[Element, int, str]] = []
    for ele, text, idx in itertext_nodes(root):
        processed = normalize_text(text)
        if not processed:
            continue
        if target in processed or processed in target:
            results.append((ele, idx, str(text)))
    if not results:
        return []
    scores = [abs(len(in_text) - len(target)) for _, _, in_text in results]
    min_score = min(scores)
    xpaths: List[str] = []
    for (ele, idx, _), score in zip(results, scores):
        if score != min_score:
            continue
        xpath = get_xpath_predicated(
            ele, short=short, with_id=with_id, with_class=with_class
        )
        if text_suffix:
            xpath = f"{xpath}/text()[{idx}]" if idx > 1 else f"{xpath}/text()"
        xpaths.append(xpath)
    return xpaths


# ---------------------------------------------------------------------------
# token tree (etree_token_stats.py:14-268)
# ---------------------------------------------------------------------------

_TOKEN_RE = re.compile(r"[A-Za-z0-9_]+|[^\w\s]")


def _default_tokenizer(s: str) -> int:
    return len(_TOKEN_RE.findall(s))


class TokenNode:
    """Token-annotated mirror of a DOM subtree (reference ``Node``,
    ``etree_token_stats.py:14-131``)."""

    __slots__ = (
        "xpath", "ele", "children", "parent", "depth",
        "text_tokens", "html_tokens", "weight",
    )

    def __init__(self, xpath: str, ele: Element, depth: int,
                 html_tokens: int, text_tokens: int) -> None:
        self.xpath = xpath
        self.ele = ele
        self.children: List["TokenNode"] = []
        self.parent: Optional["TokenNode"] = None
        self.depth = depth
        self.text_tokens = text_tokens
        self.html_tokens = html_tokens
        self.weight = 0.0

    @property
    def max_depth(self) -> int:
        best = self.depth
        stack = list(self.children)
        while stack:
            n = stack.pop()
            best = max(best, n.depth)
            stack.extend(n.children)
        return best

    @property
    def width(self) -> int:
        return len(self.children)

    @property
    def max_width(self) -> int:
        best = 1
        stack = [self]
        while stack:
            n = stack.pop()
            best = max(best, len(n.children) or 1)
            stack.extend(n.children)
        return best

    @property
    def most_weighted_node(self) -> "TokenNode":
        best = self
        stack = list(self.children)
        while stack:
            n = stack.pop()
            if n.weight > best.weight:
                best = n
            stack.extend(n.children)
        return best

    def reweighing(
        self,
        max_depth: int,
        max_width: int,
        total_text_tokens: int,
        max_tokens: int,
        min_tokens: int,
    ) -> None:
        """The reference weight formula (``etree_token_stats.py:
        83-123``), applied to the whole subtree iteratively. (The
        reference's own recursion transposes max_width and
        total_text_tokens for descendants — a bug we do not reproduce;
        every node here sees the same normalizers, which is the
        formula's evident intent.)"""
        stack = [self]
        while stack:
            n = stack.pop()
            depth_weight = n.depth / max_depth if max_depth else 0.0
            token_weight = (
                math.tanh(n.text_tokens / total_text_tokens)
                if total_text_tokens
                else 0.0
            )
            width_weight = n.width / max_width if max_width else 0.0
            element_weight = 0.6
            tag = n.ele.tag.lower()
            is_container = tag in CONTAINER_ELEMENTS
            is_inline = tag in INLINE_ELEMENTS
            has_class = len(n.ele.attrs.get("class", "") or "") > 0
            if is_inline and not has_class:
                element_weight = 0.4
            elif is_inline and has_class:
                element_weight = 0.7
            elif is_container and not has_class:
                element_weight = 0.9
            elif is_container and has_class:
                element_weight = 1.0
            elif tag == "div" and has_class:
                element_weight = 0.8
            weight = depth_weight + token_weight + width_weight + element_weight
            if n.text_tokens < min_tokens or n.text_tokens > max_tokens:
                weight = 0.0
            n.weight = weight
            stack.extend(n.children)


def build_token_tree(
    root: Element, tokenizer: Callable[[str], int] = _default_tokenizer
) -> TokenNode:
    """Annotate the DOM with text/html token counts (reference
    ``build_token_tree``; iterative two-pass instead of recursion —
    crawl pages nest degenerately deep). Token counts follow the
    reference's accounting: a node's text tokens are its DIRECT leading
    text plus its children's totals; html tokens add a shell estimate
    per element."""
    xpath0 = f"/{root.tag}"
    # pass 1: create nodes pre-order
    node0 = TokenNode(xpath0, root, 1, 0, 0)
    stack: List[TokenNode] = [node0]
    order: List[TokenNode] = []
    while stack:
        tn = stack.pop()
        order.append(tn)
        el = tn.ele
        child_elems = [c for c in el.children if isinstance(c, Element)]
        tag_counts: dict = {}
        for c in child_elems:
            tag_counts[c.tag] = tag_counts.get(c.tag, 0) + 1
        tag_order: dict = {}
        for c in child_elems:
            idx = tag_order.get(c.tag, 0)
            tag_order[c.tag] = idx + 1
            sub = (
                f"{tn.xpath}/{c.tag}[{idx + 1}]"
                if tag_counts[c.tag] > 1
                else f"{tn.xpath}/{c.tag}"
            )
            child = TokenNode(sub, c, tn.depth + 1, 0, 0)
            child.parent = tn
            tn.children.append(child)
        stack.extend(reversed(tn.children))
    # pass 2: accumulate tokens bottom-up (reverse pre-order)
    for tn in reversed(order):
        el = tn.ele
        # reference counts only the element's *leading* text (lxml
        # ``.text``): the first Text child before any element child.
        lead = ""
        for c in el.children:
            if isinstance(c, Element):
                break
            if isinstance(c, Text):
                lead += c.data
        text_token = tokenizer(lead.strip())
        attr_str = " ".join(f"{k}='{v}'" for k, v in el.attrs.items())
        shell = f"<{el.tag} {attr_str}></{el.tag}>"
        tn.text_tokens = sum(c.text_tokens for c in tn.children) + text_token
        tn.html_tokens = (
            sum(c.html_tokens for c in tn.children)
            + text_token
            + tokenizer(shell)
        )
    return node0


def find_node(node: TokenNode, token_below: int) -> Optional[TokenNode]:
    """Descend to the max-token child at or below the threshold
    (reference ``find_node``; iterative, and None-safe where the
    reference would recurse into a None max child)."""
    while True:
        if not node.children:
            return node
        max_node = None
        max_token = 0
        for child in node.children:
            if child.text_tokens > max_token:
                max_token = child.text_tokens
                max_node = child
        if max_node is None:
            return node
        if max_token <= token_below:
            return max_node
        node = max_node


def remove_node(node: TokenNode) -> None:
    """Detach a token node (and its DOM element) and decrement every
    ancestor's text-token count (reference ``remove_node``)."""
    parent = node.parent
    if parent is not None:
        parent.children.remove(node)
    node.parent = None
    node.ele.detach()
    while parent is not None:
        parent.text_tokens -= node.text_tokens
        parent.html_tokens -= node.html_tokens
        parent = parent.parent


def remove_node_until(
    tree: TokenNode, token_below: int = 1024, until: int = 4096
) -> Tuple[int, List[int]]:
    """Repeatedly remove the densest ≤-threshold node until the tree
    fits (reference ``remove_node_until``); returns (removal count,
    removed-token trail ending with the final total)."""
    times = 0
    removed: List[int] = []
    while tree.text_tokens > until:
        node = find_node(tree, token_below)
        if node is None or node is tree:
            break
        remove_node(node)
        times += 1
        removed.append(node.text_tokens)
    removed.append(tree.text_tokens)
    return times, removed


def extract_fragments_by_weight(
    root: Element,
    tokenizer: Callable[[str], int] = _default_tokenizer,
    until_html_tokens: int = 16384,
    max_text_tokens: int = 16384,
) -> Iterator[str]:
    """Yield the heaviest node's xpath and remove it, until the tree
    fits the html-token budget (reference
    ``extract_fragments_by_weight``): reweigh → pick
    ``most_weighted_node`` → stop on root/zero-weight picks."""
    token_tree = build_token_tree(root, tokenizer)
    while True:
        if token_tree.html_tokens < until_html_tokens:
            break
        if token_tree.text_tokens == 0:
            break
        token_tree.reweighing(
            token_tree.max_depth,
            token_tree.max_width,
            token_tree.text_tokens,
            max_tokens=max_text_tokens,
            min_tokens=max_text_tokens // 8,
        )
        node = token_tree.most_weighted_node
        if not node:
            break
        if node.depth <= 1:
            break
        if node.weight == 0:
            break
        remove_node(node)
        yield node.xpath
