"""Host-rank from the corpus link graph (priority signal source).

The frontier's priority is ``host_rank − depth·penalty``
(``scheduler/policy.py``); the reference has no rank signal at all
(it drains a hand-given list). This module derives the rank the way
crawlers do: PageRank over the host→host link graph, computed with
plain DataFrame power iteration.

Scale shape: edges are aggregated once to (src_host, dst_host,
weight) — at 10^10 pages the *host* graph is ~10^7 rows, 3-4 orders
smaller than the page graph, so each iteration is one small shuffle
join. Out-degrees are precomputed and cached; ranks converge in
10-20 iterations. Dangling mass (hosts with no out-links) is
redistributed uniformly each step so ranks keep summing to ~1.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def host_edges(pages: DataFrame) -> DataFrame:
    """pages(url, html) → (src_host, dst_host, weight): distinct page
    links collapsed to weighted host edges; self-edges dropped."""
    from ..functions.kernel import extract_links_udf

    links = pages.select(
        F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))).alias("src_host"),
        F.explode(extract_links_udf(F.col("html"), F.col("url"))).alias("dst"),
    )
    return (
        links.select(
            "src_host",
            F.lower(F.try_parse_url(F.col("dst"), F.lit("HOST"))).alias("dst_host"),
        )
        .where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
        .where(F.col("src_host") != F.col("dst_host"))
        .groupBy("src_host", "dst_host")
        .agg(F.count("*").cast("double").alias("weight"))
    )


def host_pagerank(
    edges: DataFrame,
    iterations: int = 12,
    damping: float = 0.85,
) -> DataFrame:
    """(host, rank) by weighted PageRank power iteration. Deterministic:
    no sampling, fixed iteration count."""
    spark = edges.sparkSession
    hosts = (
        edges.select(F.col("src_host").alias("host"))
        .unionByName(edges.select(F.col("dst_host").alias("host")))
        .distinct()
        .cache()
    )
    n = hosts.count()
    if n == 0:
        return spark.createDataFrame([], "host string, rank double")

    out_w = edges.groupBy("src_host").agg(F.sum("weight").alias("out_w"))
    # edge transition probability, precomputed once and cached — each
    # iteration reuses it without re-aggregating.
    trans = (
        edges.join(out_w, "src_host")
        .select(
            "src_host",
            "dst_host",
            (F.col("weight") / F.col("out_w")).alias("p"),
        )
        .cache()
    )
    trans.count()

    ranks = hosts.select("host", F.lit(1.0 / n).alias("rank"))
    base = (1.0 - damping) / n
    # hosts with no out-edges leak rank mass each step; if there are
    # none (common for link-rich web corpora), skip the per-iteration
    # mass term entirely.
    srcs = trans.select("src_host").distinct()
    n_dangling = hosts.join(
        srcs, hosts.host == F.col("src_host"), "left_anti"
    ).count()
    for _ in range(iterations):
        contrib = (
            trans.join(ranks, trans.src_host == ranks.host)
            .groupBy("dst_host")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("in_rank"))
        )
        if n_dangling:
            # Driver-collected scalar, deliberately: an A/B against an
            # in-plan 1-row broadcast cross-join (8 chained
            # BroadcastExchange jobs through the lazy-checkpoint chain)
            # measured 16.5s vs 6.9s for this version — the small
            # collect also eagerly materializes the iteration's
            # checkpoint, keeping each step's plan flat.
            linked_mass = (
                ranks.join(srcs, ranks.host == F.col("src_host"), "left_semi")
                .agg(F.sum("rank"))
                .first()[0]
                or 0.0
            )
            dangling = (1.0 - linked_mass) / n
        else:
            dangling = 0.0
        ranks = (
            hosts.join(contrib, hosts.host == contrib.dst_host, "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (F.coalesce(F.col("in_rank"), F.lit(0.0)) + F.lit(dangling))
                ).alias("rank"),
            )
        )
        # truncate lineage: 12 chained shuffles would otherwise build an
        # unplannable DAG (and recompute everything per action)
        ranks = ranks.localCheckpoint(eager=False)

    return ranks.select("host", F.round("rank", 8).alias("rank"))


def host_rank_table(pages: DataFrame, iterations: int = 12) -> DataFrame:
    """pages → (host, rank) scaled to [0, 1] (max-normalized), the
    shape ``_with_policy_columns`` consumes."""
    pr = host_pagerank(host_edges(pages), iterations=iterations)
    mx = pr.agg(F.max("rank")).first()[0]
    if not mx:
        return pr
    return pr.select("host", F.round(F.col("rank") / F.lit(mx), 6).alias("rank"))
