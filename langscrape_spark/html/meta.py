"""JVM-side page-metadata projection (title / meta / OpenGraph /
canonical / robots-meta).

The reference extracts metadata through its full DOM pipeline
(``langscrape/nodes/xpath_extractor.py`` runs XPath field maps over a
parsed tree). That is the faithful path — this module is the
100 TB *fast* path for the metadata-only projection every index build
needs (Common Crawl's own metadata extraction works this way): pure
``regexp_extract`` column expressions that stay inside whole-stage
codegen, so a title/canonical/noindex scan over 10^10 pages never
crosses into Python and never parses the full DOM. Pages whose markup
defeats the regexes (attribute reordering, single quotes) fall back to
the DOM kernel (``html/extract.py``) — use this projection when the
corpus is your own crawl's normalized output, the kernel when it is
adversarial.

Robots-meta ``noindex`` matters to the *pipeline*, not just search:
curation must drop pages whose publishers opted out of indexing, and
``nofollow`` gates link-graph edge harvesting (``html/links.py``).

All extractors match both quote styles and any attribute spacing, and
entity-decode the 5 high-frequency entities JVM-side (the full ordered
table lives in ``html/textify.py::normalize_text`` for the Python
kernel path); ``&amp;`` is replaced last so ``&amp;lt;`` decodes to
the literal ``&lt;`` exactly like the reference's ordered table.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (pattern, replacement) in application order — &amp; LAST.
ENTITY_CHAIN = [
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&amp;", "&"),
]


def decode_entities_basic(col: Column) -> Column:
    """The 5-entity JVM decode chain (literal ``replace``, no regex)."""
    for pat, rep in ENTITY_CHAIN:
        col = F.replace(col, F.lit(pat), F.lit(rep))
    return col


def _attr_meta(html: Column, key_attr: str, key: str) -> Column:
    """``<meta name|property="key" ... content="...">`` with either
    quote style on the content value; '' when absent (regexp_extract's
    no-match convention, kept deliberately)."""
    double = f'<meta\\s+{key_attr}="{key}"\\s+content="([^"]*)"'
    single = f"<meta\\s+{key_attr}='{key}'\\s+content='([^']*)'"
    return F.when(
        F.regexp_extract(html, double, 1) != "",
        F.regexp_extract(html, double, 1),
    ).otherwise(F.regexp_extract(html, single, 1))


def title_of(html: Column) -> Column:
    return decode_entities_basic(
        F.regexp_extract(html, r"<title[^>]*>([^<]*)</title>", 1)
    )


def canonical_of(html: Column) -> Column:
    return F.when(
        F.regexp_extract(html, r'<link\s+rel="canonical"\s+href="([^"]*)"', 1)
        != "",
        F.regexp_extract(html, r'<link\s+rel="canonical"\s+href="([^"]*)"', 1),
    ).otherwise(
        F.regexp_extract(html, r"<link\s+rel='canonical'\s+href='([^']*)'", 1)
    )


def robots_meta_flags(html: Column) -> tuple[Column, Column]:
    """(noindex, nofollow) booleans from ``<meta name="robots">``
    (content token list, case-insensitive per the HTML spec)."""
    content = F.lower(_attr_meta(F.lower(html), "name", "robots"))
    return (
        content.rlike(r"(^|[\s,])noindex($|[\s,])"),
        content.rlike(r"(^|[\s,])nofollow($|[\s,])"),
    )


def meta_columns(pages: DataFrame, html_col: str = "html") -> DataFrame:
    """Append ``title, meta_description, og_title, og_description,
    canonical_url, noindex, nofollow`` to ``pages`` — one codegen
    projection, no shuffle, no UDF. ``html_col`` may be binary (cast
    to string; the crawl's pages table stores utf-8)."""
    h = F.col(html_col).cast("string")
    noindex, nofollow = robots_meta_flags(h)
    return (
        pages.withColumn("title", title_of(h))
        .withColumn(
            "meta_description",
            decode_entities_basic(_attr_meta(h, "name", "description")),
        )
        .withColumn(
            "og_title",
            decode_entities_basic(_attr_meta(h, "property", "og:title")),
        )
        .withColumn(
            "og_description",
            decode_entities_basic(_attr_meta(h, "property", "og:description")),
        )
        .withColumn("canonical_url", canonical_of(h))
        .withColumn("noindex", noindex)
        .withColumn("nofollow", nofollow)
    )
