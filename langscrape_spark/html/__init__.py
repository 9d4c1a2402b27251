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
from .css import CSSError, css_select, extract_text_by_css_selector
from .links import extract_links, normalize_url, url_host
from .minify import minify
from .prune import (
    apply_trim_rules,
    build_token_tree,
    extract_fragments_by_weight,
    extraction_based_pruning,
    find_node,
    gen_xpath_by_text,
    get_common_ancestor,
    get_node_contain_text,
    get_node_depth,
    get_text_content,
    is_same_element,
    prune_by_structure,
    prune_by_xpath,
    prune_to_text,
    remove_by_xpath,
    remove_node,
    remove_node_until,
    replace_with_text,
)
from .textify import (
    convert_html_to_text,
    html_to_text,
    normalize_text,
    pdf_text_normalizer,
    remove_control_characters,
)
from .xpath import (
    XPathError,
    evaluate,
    extract_text_by_xpath,
    get_xpath,
    get_xpath_predicated,
)

__all__ = [
    "INTERACTIVE_ELEMENTS",
    "CSSError",
    "Document",
    "Element",
    "Text",
    "SENTINEL_EMPTY",
    "SENTINEL_NO_STORED",
    "SENTINEL_NO_XPATH",
    "XPathError",
    "apply_trim_rules",
    "build_token_tree",
    "clean_html_for_extraction",
    "clean_tree",
    "clean_tree_etree_mode",
    "collapse_whitespace",
    "convert_html_to_text",
    "css_select",
    "ensure_list",
    "evaluate",
    "extract_by_xpath_map",
    "extract_fragments_by_weight",
    "extract_html_structure",
    "extract_links",
    "extract_text_by_css_selector",
    "extract_text_by_xpath",
    "extraction_based_pruning",
    "find_node",
    "gen_xpath_by_text",
    "get_common_ancestor",
    "get_node_contain_text",
    "get_node_depth",
    "get_text_content",
    "get_xpath",
    "get_xpath_predicated",
    "html_to_text",
    "is_same_element",
    "normalize_text",
    "normalize_url",
    "parse",
    "pdf_text_normalizer",
    "prune_by_structure",
    "prune_by_xpath",
    "prune_to_text",
    "remove_by_xpath",
    "remove_control_characters",
    "remove_node",
    "remove_node_until",
    "replace_with_text",
    "url_host",
]
