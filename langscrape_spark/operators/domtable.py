"""Corpus-scale DOM analytics: explode pages into a node table, then
run the reference's tree heuristics as DataFrame expressions.

The reference computes per-document tree statistics inside custom
Python classes — token-weighted nodes
(``/root/reference/feilian/etree_token_stats.py:14-131``) and a
reverse index from text to xpath
(``/root/reference/feilian/etree_tools.py:526-594``,
``gen_xpath_by_text``). Those are per-document, driver-bound designs.
Here the DOM is exploded once into a long table

    (url, xpath, tag, class_attr, depth, n_children, text,
     n_text_tokens)

via ``mapInPandas`` (the only Python step), after which every
analytic — weight scoring, find-xpath-for-value, structural
aggregates — is a JVM-side window/groupBy over the node table and
scales with the cluster, not the driver.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame, Window, functions as F

from ..html.dom import Element, parse
from ..html.xpath import get_xpath

NODES_DDL = (
    "url string, xpath string, tag string, class_attr string, "
    "depth int, n_children int, text string, n_text_tokens int"
)

#: Element-class weights, mirroring the reference's scheme
#: (``feilian/etree_token_stats.py:108-123``): containers score high,
#: inline elements low.
TAG_WEIGHTS = {
    "article": 1.0, "main": 1.0, "section": 0.95, "div": 0.9,
    "table": 0.9, "ul": 0.85, "ol": 0.85, "p": 0.7, "li": 0.6,
    "h1": 0.7, "h2": 0.65, "h3": 0.6, "td": 0.55, "th": 0.55,
    "span": 0.5, "a": 0.45, "em": 0.4, "strong": 0.4, "b": 0.4,
    "i": 0.4,
}
DEFAULT_TAG_WEIGHT = 0.5


def _node_rows(url: str, html_str: str) -> list:
    """Post-order node rows (reference traversal order,
    feilian/etree_tools.py:83-113). Iterative with xpath steps threaded
    through the walk: recursion would blow the limit on degenerately
    nested pages, and per-node ``get_xpath`` re-scans the sibling list
    per node — quadratic on 10^4-wide lists."""
    rows = []
    doc = parse(html_str)

    def steps(parent: Element) -> list:
        elems = [c for c in parent.children if isinstance(c, Element)]
        counts: dict = {}
        for c in elems:
            counts[c.tag] = counts.get(c.tag, 0) + 1
        order: dict = {}
        out = []
        for c in elems:
            idx = order.get(c.tag, 0) + 1
            order[c.tag] = idx
            out.append(
                (c, f"/{c.tag}[{idx}]" if counts[c.tag] > 1 else f"/{c.tag}")
            )
        return out

    # post-order via (node, xpath, depth, expanded) stack
    stack = [(c, xp, 0, False) for c, xp in reversed(steps(doc))]
    while stack:
        el, xp, depth, expanded = stack.pop()
        if not expanded:
            stack.append((el, xp, depth, True))
            stack.extend(
                (c, xp + step, depth + 1, False)
                for c, step in reversed(steps(el))
            )
            continue
        text = el.text_content()
        rows.append(
            (
                url,
                xp,
                el.tag,
                el.attrs.get("class"),
                depth,
                sum(1 for c in el.children if isinstance(c, Element)),
                text,
                len(text.split()),
            )
        )
    return rows


def dom_nodes_table(pages: DataFrame) -> DataFrame:
    """pages(url, html:binary) → one row per DOM element."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [
            "url", "xpath", "tag", "class_attr", "depth",
            "n_children", "text", "n_text_tokens",
        ]
        for pdf in batches:
            rows = []
            for r in pdf.itertuples(index=False):
                html_str = bytes(r.html).decode("utf-8", errors="replace")
                rows.extend(_node_rows(r.url, html_str))
            yield pd.DataFrame(rows, columns=cols)

    return pages.select("url", "html").mapInPandas(gen, schema=NODES_DDL)


def node_weights(nodes: DataFrame) -> DataFrame:
    """The reference's node-weight formula
    (``feilian/etree_token_stats.py:83-123``) as pure columns:

        weight = depth/max_depth(url)
               + tanh(text_share)
               + n_children/max_children(url)
               + tag_class_weight

    with weight zeroed outside the useful token band — exactly the
    reference's semantics, but computed for the whole corpus in two
    window passes instead of one Python tree walk per document."""
    w_url = Window.partitionBy("url")
    tag_w = F.coalesce(
        *[
            F.when(F.col("tag") == t, F.lit(wt))
            for t, wt in TAG_WEIGHTS.items()
        ],
        F.lit(DEFAULT_TAG_WEIGHT),
    )
    out = (
        nodes.withColumn("max_depth", F.max("depth").over(w_url))
        .withColumn("max_children", F.max("n_children").over(w_url))
        .withColumn("total_tokens", F.sum("n_text_tokens").over(w_url))
        .withColumn(
            "text_share",
            F.when(
                F.col("total_tokens") > 0,
                F.col("n_text_tokens") / F.col("total_tokens"),
            ).otherwise(F.lit(0.0)),
        )
        .withColumn(
            "weight_raw",
            F.col("depth") / F.greatest(F.col("max_depth"), F.lit(1))
            + F.tanh(F.col("text_share"))
            + F.col("n_children") / F.greatest(F.col("max_children"), F.lit(1))
            + tag_w,
        )
    )
    # token band: the reference zeroes nodes outside [min, max] tokens
    # (etree_token_stats.py:95-105); band kept as columns for tuning.
    return out.withColumn(
        "weight",
        F.when(
            (F.col("n_text_tokens") >= 2) & (F.col("n_text_tokens") <= 4096),
            F.round(F.col("weight_raw"), 6),
        ).otherwise(F.lit(0.0)),
    ).select(
        "url", "xpath", "tag", "depth", "n_children", "n_text_tokens", "weight"
    )


def xpath_for_value(nodes: DataFrame, targets: DataFrame) -> DataFrame:
    """Corpus-wide ``gen_xpath_by_text``
    (``feilian/etree_tools.py:526-594``): for each (url, target_text)
    find the xpath of the node whose text best matches — containment
    either way, ranked by absolute length difference then xpath.
    ``targets`` is (url, target); a broadcast-joined dimension when
    small, a co-partitioned shuffle join at corpus scale."""
    joined = nodes.join(targets, "url").where(
        (F.col("n_text_tokens") > 0)
        & (
            F.col("text").contains(F.col("target"))
            | F.col("target").contains(F.col("text"))
        )
    )
    ranked = joined.withColumn(
        "len_diff", F.abs(F.length("text") - F.length("target"))
    ).withColumn(
        "rn",
        F.row_number().over(
            Window.partitionBy("url", "target").orderBy(
                F.asc("len_diff"), F.asc("xpath")
            )
        ),
    )
    return ranked.where(F.col("rn") == 1).select(
        "url", "target", "xpath", "len_diff"
    )


def structural_stats(nodes: DataFrame) -> DataFrame:
    """Per-(url, tag) structural aggregates — the table-forest stats
    of ``feilian/soup_tools.py:182-231`` generalized to every tag."""
    return (
        nodes.groupBy("url", "tag")
        .agg(
            F.count("*").alias("n_nodes"),
            F.max("depth").alias("max_depth"),
            F.max("n_children").alias("max_width"),
            F.sum("n_text_tokens").alias("total_tokens"),
        )
    )


def template_signatures(pages: DataFrame) -> DataFrame:
    """pages(url, html) → (url, template_sig): md5 of the unique
    structure skeleton (``html/structure.py::template_signature``).
    Grouping on the signature clusters pages by layout template — the
    precursor to per-template xpath programs (the reference runs its
    xpath-programming agent per SWDE site; this is the corpus-scale
    equivalent of "which pages share a site template")."""
    from ..html.structure import template_signature

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "url": pdf["url"],
                    "template_sig": [
                        template_signature(
                            bytes(h).decode("utf-8", errors="replace")
                        )
                        for h in pdf["html"]
                    ],
                }
            )

    return pages.select("url", "html").mapInPandas(
        gen, schema="url string, template_sig string"
    )
