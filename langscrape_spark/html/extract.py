"""Field extraction by XPath map — the byte-identity kernel.

Reimplements ``extract_by_xpath_map_from_html``
(``/root/reference/langscrape/html/xpath_extractor.py:47-87``) with the
exact sentinel contract:

- strategy ``lm_capabilities`` → stored values, else ``"(No stored
  value)"``;
- missing/blank xpath → ``"Skipped: No XPath"``;
- xpath matched nothing → ``["(Empty Result)"]``;
- evaluation error → ``["Error: {e}"]``;
- element results → ``text_content().strip()``, string results →
  ``str(v).strip()``;
- the tree is parsed lazily **once** per document and shared across all
  fields (``xpath_extractor.py:57,74-75``) — a broken parse affects all
  fields identically.

``_ensure_list`` is a verbatim port of ``xpath_extractor.py:10-27``.
"""

from __future__ import annotations

from typing import Any, Dict, List, Mapping, Optional, Sequence

from .dom import Document, Element, parse
from .xpath import evaluate

SENTINEL_NO_STORED = "(No stored value)"
SENTINEL_NO_XPATH = "Skipped: No XPath"
SENTINEL_EMPTY = "(Empty Result)"


def ensure_list(value: Any) -> List[str]:
    if value is None:
        return []
    if isinstance(value, str):
        value = [value]
    elif isinstance(value, Sequence) and not isinstance(value, (bytes, bytearray)):
        value = list(value)
    else:
        value = [value]
    cleaned: List[str] = []
    for item in value:
        if item is None:
            continue
        text = str(item).strip()
        if text:
            cleaned.append(text)
    return cleaned


def _get_strategy(entry: Any) -> str:
    if isinstance(entry, Mapping):
        return str(entry.get("strategy", "xpath_extractor"))
    return "xpath_extractor"


def _get_xpath(entry: Any) -> Optional[str]:
    if isinstance(entry, Mapping):
        xpath = entry.get("xpath")
    else:
        xpath = entry
    if isinstance(xpath, str):
        xpath = xpath.strip()
        return xpath or None
    return None


def extract_by_xpath_map(
    html_content: str, field_state: Dict[str, Any]
) -> Dict[str, List[str]]:
    result: Dict[str, List[str]] = {}
    tree: Optional[Document] = None

    for key, entry in field_state.items():
        strategy = _get_strategy(entry)

        if strategy == "lm_capabilities":
            values: List[str] = []
            if isinstance(entry, Mapping):
                values = ensure_list(entry.get("value"))
            result[key] = values or [SENTINEL_NO_STORED]
            continue

        if strategy == "css_selector":
            # optional CSS strategy (reference feilian/etree_tools.py:
            # 460-474): same sentinel contract as the xpath path.
            selector = None
            if isinstance(entry, Mapping):
                selector = entry.get("css_selector") or entry.get("selector")
            if not isinstance(selector, str) or not selector.strip():
                result[key] = [SENTINEL_NO_XPATH]
                continue
            if tree is None:
                tree = parse(html_content)
            from .css import css_select

            try:
                values_css = [
                    el.text_content().strip() for el in css_select(tree, selector)
                ]
                result[key] = [v for v in values_css if v] or [SENTINEL_EMPTY]
            except Exception as e:
                result[key] = [f"Error: {e}"]
            continue

        xpath = _get_xpath(entry)
        if not xpath:
            result[key] = [SENTINEL_NO_XPATH]
            continue

        if tree is None:
            tree = parse(html_content)

        try:
            values_raw = evaluate(tree, xpath)
            clean_values = [
                v.text_content().strip() if isinstance(v, Element) else str(v).strip()
                for v in values_raw
            ]
            result[key] = clean_values or [SENTINEL_EMPTY]
        except Exception as e:  # sentinel contract: never raise per-field
            result[key] = [f"Error: {e}"]

    return result
