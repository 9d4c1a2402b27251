"""Pure-Python deterministic HTML kernel (no Spark dependencies).

Everything in this subpackage runs *inside* Arrow-batched pandas UDFs;
DOM trees never cross the Spark boundary (SURVEY.md §1.1).
"""

from .clean import (
    INTERACTIVE_ELEMENTS,
    clean_html_for_extraction,
    clean_tree,
    clean_tree_etree_mode,
    extract_html_structure,
)
from .dom import Document, Element, Text, collapse_whitespace, parse
from .extract import (
    SENTINEL_EMPTY,
    SENTINEL_NO_STORED,
    SENTINEL_NO_XPATH,
    ensure_list,
    extract_by_xpath_map,
)
from .links import extract_links, normalize_url, url_host
from .textify import (
    convert_html_to_text,
    html_to_text,
    normalize_text,
    pdf_text_normalizer,
    remove_control_characters,
)
from .xpath import XPathError, evaluate, get_xpath

__all__ = [
    "INTERACTIVE_ELEMENTS",
    "Document",
    "Element",
    "Text",
    "SENTINEL_EMPTY",
    "SENTINEL_NO_STORED",
    "SENTINEL_NO_XPATH",
    "XPathError",
    "clean_html_for_extraction",
    "clean_tree",
    "clean_tree_etree_mode",
    "collapse_whitespace",
    "convert_html_to_text",
    "ensure_list",
    "evaluate",
    "extract_by_xpath_map",
    "extract_html_structure",
    "extract_links",
    "get_xpath",
    "html_to_text",
    "normalize_text",
    "normalize_url",
    "parse",
    "pdf_text_normalizer",
    "remove_control_characters",
    "url_host",
]
