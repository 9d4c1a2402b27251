"""Link-graph edge table + anchor-text rollup.

Web-scale rankers and query-generation pipelines aggregate the
*anchor text* of in-links per target page (in-degree, distinct source
hosts, most frequent anchor terms) — the classic anchor-text signal.
The reference never builds a link graph (its URL list is static,
``/root/reference/scripts/run.py:53-63``); this extends its link
decode walk (``feilian/soup_tools.py:13-23``, already generalized in
``html/links.py``) into the edge/rollup operators a crawl corpus
needs, alongside the host-level PageRank in ``operators/hostrank.py``.

Scale shape (the part that matters at 10^10 edges):

- ``link_edges`` is one Arrow crossing over the pages table (the html
  column is already in flight for extraction) — no shuffle; the edge
  table is written partitioned however the caller likes.
- ``anchor_rollup`` is two equi-key hash aggregations plus one
  bounded window.  In-degree / distinct-host counts are plain
  ``groupBy(dst)`` with map-side partial aggregation — a target with
  10^8 in-links is ONE reduce group holding two counters, never a
  materialized neighborhood.  Term ranking groups by ``(dst, term)``
  first (same partial-agg property), so the per-``dst`` window that
  picks the top-k anchors runs over *distinct terms per target* —
  vocabulary-bounded, not in-degree-bounded — and plans as
  WindowGroupLimit under the row_number filter.  No self-joins, no
  collect_list over raw edges, no driver collects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def link_edges(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
) -> DataFrame:
    """Pages → link-graph edge table ``(src_url, dst_url, anchor)``.

    One ``mapInPandas`` crossing (Arrow-batched, SURVEY §2.12 UDF
    discipline); duplicate targets per page are kept — each <a> is one
    edge, and its anchor text is the payload the rollup counts.
    ``html`` may be string or binary (decoded latin-1-tolerantly, the
    same rule the extraction plan uses for non-UTF bytes).
    """
    from ..html.links import extract_links_with_anchors

    out_schema = "src_url string, dst_url string, anchor string"

    def gen(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for url, html in zip(pdf[url_col], pdf[html_col]):
                if html is None or url is None:
                    continue
                if isinstance(html, (bytes, bytearray)):
                    html = bytes(html).decode("utf-8", errors="replace")
                for dst, anchor in extract_links_with_anchors(html, url):
                    rows.append((url, dst, anchor))
            yield pd.DataFrame(rows, columns=["src_url", "dst_url", "anchor"])

    return pages.select(url_col, html_col).mapInPandas(gen, out_schema)


from .urls import host_of as _host  # shared definition keeps host keys joinable


def anchor_terms(anchor_col) -> "F.Column":
    """Anchor text → lowercase alphanumeric terms (array column)."""
    return F.filter(
        F.split(F.lower(anchor_col), "[^a-z0-9]+"), lambda t: t != ""
    )


def anchor_rollup(
    edges: DataFrame,
    k: int = 3,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    anchor_col: str = "anchor",
) -> DataFrame:
    """Per-target anchor-text features from a link-graph edge table.

    Returns one row per ``dst_url``:

    - ``in_degree``     — number of in-edges
    - ``n_src_hosts``   — distinct source hosts (the spam-resistant
      variant of in-degree)
    - ``top_terms``     — the k most frequent anchor terms,
      ``|``-joined, count-desc then term-asc (deterministic); ``''``
      when no in-edge carries a non-empty anchor.

    Two hash aggregations + one vocabulary-bounded window (module
    docstring has the 10^10-edge argument).
    """
    base = edges.groupBy(F.col(dst_col).alias("dst_url")).agg(
        F.count("*").alias("in_degree"),
        F.count_distinct(_host(F.col(src_col))).alias("n_src_hosts"),
    )

    term_counts = (
        edges.select(
            F.col(dst_col).alias("dst_url"),
            F.explode(anchor_terms(F.col(anchor_col))).alias("term"),
        )
        .groupBy("dst_url", "term")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("dst_url").orderBy(F.desc("n"), F.asc("term"))
    top = (
        term_counts.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= k)
        .groupBy("dst_url")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rk", "term"))),
                    lambda s: s["term"],
                ),
                "|",
            ).alias("top_terms")
        )
    )
    return base.join(top, "dst_url", "left").select(
        "dst_url",
        "in_degree",
        "n_src_hosts",
        F.coalesce("top_terms", F.lit("")).alias("top_terms"),
    )


def reciprocal_link_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    min_out: int = 3,
    min_recip_share: float = 0.6,
) -> DataFrame:
    """Link-farm detection by reciprocal-edge share (the classic
    link-exchange signature: TrustRank/anti-spam literature — farms
    trade links, so a farm host's outlinks overwhelmingly point at
    hosts that link straight back; organic hosts' reciprocity is low).
    The flag feeds the frontier the same way ``detect_url_traps`` does:
    a broadcastable host list the scheduler can anti-join.

    Input: host-level edge rows (duplicates fine — deduped here;
    self-loops dropped). Output, one row per host with outlinks:
    ``(host, out_deg, in_deg, n_recip, recip_share, is_farm)`` where
    ``recip_share = n_recip / out_deg`` over DISTINCT host pairs and
    ``is_farm = out_deg >= min_out AND recip_share >= min_recip_share``
    (gated on the unrounded share).

    Scale shape: dedup is one (src,dst) hash agg; degrees are two
    hosts-sized aggs; reciprocity is ONE edge-sized equi-join on the
    reversed composite key — every path map-side-combines, a 10^8-edge
    hub is one reduce group, and nothing is ever materialized per
    neighborhood."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(F.col("src") != F.col("dst"))
        .distinct()
    )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    in_deg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("in_deg"))
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = (
        e.join(rev, ["src", "dst"], "left_semi")
        .groupBy("src")
        .agg(F.count(F.lit(1)).alias("n_recip"))
    )
    stats = (
        out_deg.join(in_deg.withColumnRenamed("dst", "src"), "src", "left")
        .join(recip, "src", "left")
        .select(
            F.col("src").alias("host"),
            "out_deg",
            F.coalesce("in_deg", F.lit(0)).alias("in_deg"),
            F.coalesce("n_recip", F.lit(0)).alias("n_recip"),
        )
    )
    share = F.col("n_recip") / F.col("out_deg")
    return stats.withColumn("recip_share", share).withColumn(
        "is_farm",
        (F.col("out_deg") >= F.lit(min_out))
        & (share >= F.lit(min_recip_share)),
    )


def clean_host_edges(
    edges: "DataFrame",
    src_col: str = "src_host",
    dst_col: str = "dst_host",
):
    """Shared hygiene for every link-analysis operator (HITS,
    TrustRank, co-citation): returns ``(e, hosts)`` where ``e`` is
    the null-filtered, self-loop-dropped DISTINCT directed edge list
    as ``(src, dst)`` and ``hosts`` the distinct endpoint table —
    both cached (lazily; a caller that never acts on ``hosts`` pays
    nothing). One definition so a future hygiene change (e.g. host
    trimming) cannot silently diverge the operators from each other
    or from their oracle builders' matching e/hosts CTEs."""
    e = (
        edges.select(
            F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
        )
        .where(
            F.col("src").isNotNull()
            & F.col("dst").isNotNull()
            & (F.col("src") != F.col("dst"))
        )
        .distinct()
        .cache()
    )
    hosts = (
        e.select(F.col("src").alias("host"))
        .unionByName(e.select(F.col("dst").alias("host")))
        .distinct()
        .cache()
    )
    return e, hosts


def cocitation_coupling(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    max_fanout: int = 64,
    min_strength: int = 2,
) -> DataFrame:
    """Co-citation and bibliographic coupling over the host graph —
    the two classic link-based relatedness measures (Small 1973 /
    Kessler 1963; the backbone of 'related sites' and template-family
    grouping): ``cocitation(a, b)`` counts hosts linking to BOTH a and
    b; ``coupling(a, b)`` counts hosts that both a and b link to.

    Scale shape: both are postings-style self-joins — group the
    deduped edge list by the shared endpoint and pair within the
    group. A hub endpoint makes that quadratic, so both directions
    carry a fanout cap (``max_fanout``, applied with a degree
    aggregate + semi-join): a directory page linking 10^4 hosts
    co-cites everything and carries no relatedness signal — the
    standard cap from the co-citation literature, and the same
    hot-bucket guard shape as the dedup paths. Pair emission joins
    on the shared endpoint only (equi-key, map-side combinable);
    output pairs are canonical (a < b) with ``min_strength`` gating.
    """
    e, _ = clean_host_edges(edges, src_col, dst_col)
    # e is cached by the helper: it feeds both degree aggregates and
    # both anti-joined self-join sides (up to 4 consumers per action)
    # broadcast the HOT endpoints (over-cap, few by construction) and
    # anti-join — broadcasting the allow-list would ship most of the
    # host table; same guard shape as dedup.py's hot-bucket pass
    hot_src = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("od"))
        .where(F.col("od") > max_fanout)
        .select("src")
    )
    hot_dst = (
        e.groupBy("dst")
        .agg(F.count(F.lit(1)).alias("idg"))
        .where(F.col("idg") > max_fanout)
        .select("dst")
    )
    e_co = e.join(F.broadcast(hot_src), "src", "left_anti")
    e_cp = e.join(F.broadcast(hot_dst), "dst", "left_anti")

    a, b = e_co.alias("a"), e_co.alias("b")
    co = (
        a.join(
            b,
            (F.col("a.src") == F.col("b.src"))
            & (F.col("a.dst") < F.col("b.dst")),
        )
        .groupBy(
            F.col("a.dst").alias("host_a"), F.col("b.dst").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("cocitation"))
    )
    c, d = e_cp.alias("c"), e_cp.alias("d")
    coup = (
        c.join(
            d,
            (F.col("c.dst") == F.col("d.dst"))
            & (F.col("c.src") < F.col("d.src")),
        )
        .groupBy(
            F.col("c.src").alias("host_a"), F.col("d.src").alias("host_b")
        )
        .agg(F.count(F.lit(1)).alias("coupling"))
    )
    return (
        co.join(coup, ["host_a", "host_b"], "full_outer")
        .select(
            "host_a",
            "host_b",
            F.coalesce("cocitation", F.lit(0)).cast("long").alias(
                "cocitation"
            ),
            F.coalesce("coupling", F.lit(0)).cast("long").alias(
                "coupling"
            ),
        )
        .where(
            (F.col("cocitation") >= min_strength)
            | (F.col("coupling") >= min_strength)
        )
    )


def kcore(
    edges: DataFrame,
    k: int = 3,
    rounds: int = 8,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Fixed-k core extraction (Seidman 1983): the maximal subgraph
    where every node keeps UNDIRECTED degree ≥ k, found by iterative
    peeling — drop sub-k nodes, recompute degrees, repeat. The
    classic spam/community density screen: link farms live in dense
    cores, pendant chains and one-shot hosts peel away. A fixed round
    count (peeling is idempotent at the fixed point, so extra rounds
    are no-ops) keeps the operator oracle-checkable; pick ``rounds``
    ≥ the graph's peeling depth — each round removes at least one
    node until convergence, and real host graphs converge in a few
    rounds.

    Scale shape: per round ONE degree aggregation (map-side
    combinable) plus two semi-joins of the edge list against the
    surviving-host set — all equi-key; neighbor sets never
    materialize. Lineage truncated per round.

    Returns ``(host, in_kcore, kcore_degree)`` over ALL input hosts
    (peeled hosts: flag 0, degree 0).
    """
    e, hosts = clean_host_edges(edges, src_col, dst_col)
    und = (
        e.select(F.col("src").alias("host"), F.col("dst").alias("nb"))
        .unionByName(
            e.select(F.col("dst").alias("host"), F.col("src").alias("nb"))
        )
        .distinct()
        .cache()
    )
    active = und
    for _ in range(rounds):
        keep = (
            active.groupBy("host")
            .agg(F.count(F.lit(1)).alias("d"))
            .where(F.col("d") >= k)
            .select("host")
        )
        active = (
            active.join(keep, "host", "left_semi")
            .join(
                keep.withColumnRenamed("host", "nb"), "nb", "left_semi"
            )
            .localCheckpoint(eager=False)
        )
    deg = active.groupBy("host").agg(
        F.count(F.lit(1)).alias("kcore_degree")
    )
    return hosts.join(deg, "host", "left").select(
        "host",
        F.when(F.col("kcore_degree").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("in_kcore"),
        F.coalesce("kcore_degree", F.lit(0)).cast("long").alias(
            "kcore_degree"
        ),
    )


def kcore_oracle_sql(raw_edges_sql: str, k: int, rounds: int = 8) -> str:
    """DuckDB twin of ``kcore``: peeling rounds unrolled as
    MATERIALIZED CTEs (degree agg + two semi-joins per round)."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "u0 AS MATERIALIZED (SELECT DISTINCT host, nb FROM ("
        "SELECT src AS host, dst AS nb FROM e"
        " UNION ALL SELECT dst, src FROM e)),",
    ]
    for i in range(1, rounds + 1):
        parts += [
            f"k{i} AS MATERIALIZED (SELECT host FROM u{i - 1}"
            f" GROUP BY host HAVING count(*) >= {k}),",
            f"u{i} AS MATERIALIZED (SELECT u.host, u.nb FROM u{i - 1} u"
            f" WHERE u.host IN (SELECT host FROM k{i})"
            f" AND u.nb IN (SELECT host FROM k{i})),",
        ]
    n = rounds
    parts.append(
        f"deg AS (SELECT host, count(*) AS d FROM u{n} GROUP BY host)"
    )
    return (
        "\n".join(parts)
        + "\nSELECT hosts.host,"
        " CASE WHEN deg.host IS NOT NULL THEN 1 ELSE 0 END AS in_kcore,"
        " CAST(coalesce(deg.d, 0) AS BIGINT) AS kcore_degree"
        " FROM hosts LEFT JOIN deg ON hosts.host = deg.host"
        " ORDER BY hosts.host"
    )


def triangle_stats(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Per-host triangle counts + local clustering coefficient over
    the UNDIRECTED host graph — the density signal behind link-farm
    and community detection (farms are near-cliques: clustering ~1 at
    high degree; organic hubs are star-like: ~0).

    Scale shape — the compact-forward orientation (Latapy 2008;
    Suri/Vassilvitskii's MapReduce variant): orient every undirected
    edge from the (degree, host)-SMALLER endpoint to the larger, so
    each wedge is enumerated exactly once at its lowest-degree apex —
    the join fan-out is bounded by Σ d_min(e), O(m^1.5) total, never
    a hub's d² — then ONE equi-join of the oriented list with itself
    (wedge generation) and ONE semi-join back against the oriented
    edges (closure test). Counts redistribute to all three corners
    with a union + groupBy. No neighborhood is ever materialized.

    Returns ``(host, degree, triangles, clustering)`` with
    ``clustering = 2·triangles / (degree·(degree−1))`` (0 when
    degree < 2), rounded to 6.
    """
    e, hosts = clean_host_edges(edges, src_col, dst_col)
    und = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
        .cache()
    )
    # deg feeds both sides of the orientation join AND the final
    # select — cached so the und shuffle runs once
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).cache()
    # orientation key: (degree, host) lexicographic — total order, so
    # every undirected edge appears exactly once
    keyed = (
        und.join(deg, "a")
        .join(
            deg.select(
                F.col("a").alias("b"), F.col("d").alias("db")
            ),
            "b",
        )
        .where(
            (F.col("d") < F.col("db"))
            | ((F.col("d") == F.col("db")) & (F.col("a") < F.col("b")))
        )
        .select(F.col("a").alias("lo"), F.col("b").alias("hi"))
        .cache()
    )
    w1 = keyed.select(F.col("lo").alias("apex"), F.col("hi").alias("x"))
    w2 = keyed.select(F.col("lo").alias("apex"), F.col("hi").alias("y"))
    wedges = w1.join(w2, "apex").where(F.col("x") < F.col("y"))
    closed = wedges.join(
        keyed.select(
            F.col("lo").alias("x"), F.col("hi").alias("y")
        ).unionByName(
            # the closing edge may be oriented either way between x, y
            keyed.select(
                F.col("hi").alias("x"), F.col("lo").alias("y")
            )
        ),
        ["x", "y"],
        "left_semi",
    )
    per_corner = (
        closed.select(F.col("apex").alias("host"))
        .unionByName(closed.select(F.col("x").alias("host")))
        .unionByName(closed.select(F.col("y").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("triangles"))
    )
    return (
        hosts.join(
            deg.withColumnRenamed("a", "host"), "host", "left"
        )
        .join(per_corner, "host", "left")
        .select(
            "host",
            F.coalesce("d", F.lit(0)).cast("long").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("long").alias(
                "triangles"
            ),
            F.round(
                F.when(
                    F.col("d") >= 2,
                    2.0
                    * F.coalesce("triangles", F.lit(0))
                    / (F.col("d") * (F.col("d") - 1)),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("clustering"),
        )
    )


def link_prediction(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    max_center_degree: int = 64,
    min_common: int = 1,
) -> DataFrame:
    """Common-neighbor link prediction (Liben-Nowell & Kleinberg
    2003) over the UNDIRECTED host graph: for every non-adjacent pair
    at distance 2, the three classic scores — common-neighbor count,
    Jaccard of neighborhoods, and Adamic-Adar (Σ 1/ln(deg z), which
    discounts promiscuous common neighbors). The crawl-frontier use:
    predicted edges rank likely-related hosts for seed expansion, and
    a high predicted density around a host family flags template
    farms before they are fetched.

    Scale shape: the same wedge enumeration as cocitation — group the
    undirected adjacency by the CENTER and pair within the group —
    with the same hot-center guard (a directory hub of degree 10^4
    is pure noise and d² fan-out; the over-cap list is tiny by
    construction and rides a broadcast anti-join). Center degrees
    join in on the wedge rows (equi-key), so Adamic-Adar needs no
    second pass; existing edges are removed with one anti-join
    against the adjacency; endpoint degrees are equi-joins against
    the degree table. Everything map-side combinable; no
    neighborhood list is ever materialized.

    Note a wedge center always has ≥2 distinct neighbors, so
    ``ln(deg z) ≥ ln 2`` — the Adamic-Adar term is finite without a
    guard. Output: canonical pairs (host_a < host_b) with
    ``common_neighbors ≥ min_common``, floats rounded to 6.
    """
    e, _ = clean_host_edges(edges, src_col, dst_col)
    und = (
        e.select(F.col("src").alias("a"), F.col("dst").alias("b"))
        .unionByName(
            e.select(F.col("dst").alias("a"), F.col("src").alias("b"))
        )
        .distinct()
        .cache()
    )
    deg = und.groupBy("a").agg(F.count(F.lit(1)).alias("d")).cache()
    hot = deg.where(F.col("d") > max_center_degree).select("a")
    centers = (
        und.join(F.broadcast(hot), "a", "left_anti")
        .join(deg, "a")
        .select(
            F.col("a").alias("z"), F.col("b").alias("x"),
            F.col("d").alias("dz"),
        )
        .cache()
    )
    wedges = centers.join(
        centers.select(F.col("z"), F.col("x").alias("y")), "z"
    ).where(F.col("x") < F.col("y"))
    scored = wedges.groupBy("x", "y").agg(
        F.count(F.lit(1)).cast("long").alias("common_neighbors"),
        F.sum(F.lit(1.0) / F.log(F.col("dz").cast("double"))).alias("_aa"),
    )
    cand = scored.join(
        und.select(F.col("a").alias("x"), F.col("b").alias("y")),
        ["x", "y"],
        "left_anti",
    )
    dx = deg.select(F.col("a").alias("x"), F.col("d").alias("_dx"))
    dy = deg.select(F.col("a").alias("y"), F.col("d").alias("_dy"))
    return (
        cand.join(dx, "x")
        .join(dy, "y")
        .where(F.col("common_neighbors") >= min_common)
        .select(
            F.col("x").alias("host_a"),
            F.col("y").alias("host_b"),
            "common_neighbors",
            F.round(
                F.col("common_neighbors")
                / (F.col("_dx") + F.col("_dy") - F.col("common_neighbors")),
                6,
            ).alias("jaccard"),
            F.round(F.col("_aa"), 6).alias("adamic_adar"),
        )
    )


def greedy_seed_cover(edges: DataFrame, k: int = 4) -> DataFrame:
    """Greedy maximum-coverage crawl-seed selection: pick ``k`` source
    hosts whose out-link sets together reach the most distinct
    destination hosts — the classic (1 - 1/e)-approximate submodular
    greedy, and the principled way to cut a seed list: each round
    scores every candidate by MARGINAL gain (new dsts only), takes the
    argmax (ties: smallest host), and adds its dsts to the covered
    set.

    Output: ``(round, host, gain, covered_total)`` — one row per pick;
    rounds stop early when nothing new is coverable.

    Scale shape: per round one anti-join against the covered set (dst-
    keyed, grows monotonically but stays hosts-sized), one grouped
    count, and a single-ROW argmax collect (TakeOrderedAndProject —
    bounded, also materializes the round); the covered set is
    localCheckpoint'd so lineage stays flat across rounds.
    """
    spark = edges.sparkSession
    empty = "round int, host string, gain long, covered_total long"
    e, _hosts = clean_host_edges(edges)
    if e.limit(1).count() == 0:
        return spark.createDataFrame([], empty)
    covered = None
    rows = []
    total = 0
    for i in range(1, k + 1):
        remaining = (
            e if covered is None else e.join(covered, "dst", "left_anti")
        )
        best = (
            remaining.groupBy("src")
            .agg(F.count(F.lit(1)).alias("gain"))
            .orderBy(F.col("gain").desc(), F.col("src").asc())
            .limit(1)
            .collect()
        )
        if not best:
            break
        pick, gain = best[0].src, best[0].gain
        total += gain
        rows.append((i, pick, gain, total))
        newly = e.where(F.col("src") == pick).select("dst")
        covered = (
            newly
            if covered is None
            else covered.unionByName(newly).distinct()
        ).localCheckpoint(eager=False)
    return spark.createDataFrame(rows, empty)


def greedy_seed_cover_oracle_sql(raw_edges_sql: str, k: int = 4) -> str:
    """DuckDB twin of ``greedy_seed_cover``: the k greedy rounds
    unrolled as MATERIALIZED CTEs (each covered set feeds the next
    round's anti-join and the cumulative total)."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
    ]
    for i in range(1, k + 1):
        rem = (
            "e"
            if i == 1
            else f"(SELECT * FROM e WHERE dst NOT IN"
            f" (SELECT dst FROM cov{i - 1}))"
        )
        parts.append(
            f"p{i} AS MATERIALIZED (SELECT {i} AS rnd, src,"
            f" count(*) AS gain FROM {rem} r GROUP BY src"
            " ORDER BY gain DESC, src ASC LIMIT 1),"
        )
        prev_cov = (
            ""
            if i == 1
            else f"SELECT dst FROM cov{i - 1} UNION "
        )
        parts.append(
            f"cov{i} AS MATERIALIZED ({prev_cov}SELECT dst FROM e"
            f" WHERE src = (SELECT src FROM p{i})),"
        )
    picks = " UNION ALL ".join(
        f"SELECT rnd, src, gain FROM p{i}" for i in range(1, k + 1)
    )
    parts.append(f"picks AS ({picks})")
    return "\n".join(parts) + (
        "\nSELECT CAST(rnd AS INT) AS round, src AS host,"
        " CAST(gain AS BIGINT) AS gain,"
        " CAST(sum(gain) OVER (ORDER BY rnd) AS BIGINT)"
        " AS covered_total"
        " FROM picks WHERE gain > 0 ORDER BY round"
    )


def degree_assortativity(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Directed out-in degree assortativity (Newman 2002): the Pearson
    correlation, over distinct non-self edges, between the source's
    out-degree and the target's in-degree. Organic webs are
    DISassortative (big hubs link small pages, r < 0); link farms and
    mirror rings push r positive — the one-scalar complement to the
    reciprocal-share and triangle screens.

    Exactness: every moment (m, Σx, Σy, Σxy, Σx², Σy²) is an exact
    integer carried in decimal(38,0) — degree products at 10⁹-edge /
    10⁶-degree scale overflow BIGINT, and ANSI throws — so
    ``r = (mΣxy − ΣxΣy) / (√(mΣx²−Σx²)·√(mΣy²−Σy²))`` is two square
    roots and one division of identical integers in both engines.
    Degenerate graphs (uniform degrees → zero variance) report NULL
    via try_divide, never a crash.

    Scale shape: hygiene + two degree aggs + two equi-joins back to
    the edge frame + one global agg — no window, no driver loop.

    Output (one row): ``(m, sxy, r)``.
    """
    e = (
        edges.select(
            F.col(src_col).alias("s"), F.col(dst_col).alias("d")
        )
        .where(F.col("s") != F.col("d"))
        .distinct()
    )
    od = e.groupBy("s").agg(F.count(F.lit(1)).alias("x"))
    idg = e.groupBy("d").agg(F.count(F.lit(1)).alias("y"))
    dec = "decimal(38,0)"
    pairs = (
        e.join(od, "s")
        .join(idg, "d")
        .select(F.col("x").cast(dec).alias("x"), F.col("y").cast(dec).alias("y"))
    )
    agg = pairs.agg(
        F.count(F.lit(1)).cast(dec).alias("m"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast(
        "double"
    )
    vx = (F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast(
        "double"
    )
    vy = (F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast(
        "double"
    )
    return agg.select(
        F.col("m").cast("long").alias("m"),
        # sxy stays decimal(38,0): a long cast would overflow at the
        # same 10^9-edge scale the decimal moments exist for (the q136
        # entry casts for the driver's int64 compare at sf scale)
        F.col("sxy").alias("sxy"),
        F.round(
            F.try_divide(num, F.sqrt(vx) * F.sqrt(vy)), 6
        ).alias("r"),
    )


def neighborhood_function(
    edges: DataFrame,
    rounds: int = 4,
    p: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """HyperANF (Boldi, Rosa & Vigna 2011): the neighborhood function
    N(t) = #(u,v) pairs with a directed path u→v of length ≤ t,
    estimated by giving every node an HLL of its reachable ball and
    max-MERGING out-neighbors' registers each round — the web-scale
    way to read a graph's effective diameter (BFS per node is n·m;
    this is ``rounds`` scans of a (node, register) frame).

    Registers live as SPARSE (node, bk, reg) rows — merge is one
    union + groupBy max per round (register max is associative and
    order-free, so the iteration is hash-comparable), lineage
    truncated per round via localCheckpoint (the kcore/OPIC pattern).
    The per-node estimate is the q87 HLL estimator verbatim (same
    md5/mask/rank/linear-counting math — one sketch stack, one
    divergence surface). N(t) sums it over nodes — and a float sum
    over thousands of nodes is ORDER-dependent, so each node's
    estimate is first quantized to integer micro-units via
    ``floor(x·10⁶ + 0.5)`` (the engine-portable round-half-up the
    int8 quantizer uses): the node sum is then an EXACT integer and
    the curve hash-compares at any node count.

    Output: one row per t in [0, rounds]: ``(t, n_pairs, frac)`` with
    frac = N(t)/N(rounds) round-6 — read the effective diameter as
    the first t with frac ≥ 0.9.
    """
    from .dedup import _md5_lower64
    from .sketch import hll_estimate

    m = 1 << p
    mask63 = (1 << 63) - 1
    e = (
        edges.select(
            F.col(src_col).alias("u"), F.col(dst_col).alias("w")
        )
        .where(F.col("u") != F.col("w"))
        .distinct()
        .persist()
    )
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("w").alias("node")))
        .distinct()
    )
    h = _md5_lower64(F.col("node")).bitwiseAND(F.lit(mask63))
    wbits = F.shiftright(h, p)
    rho = F.when(wbits == 0, F.lit(64 - p)).otherwise(
        F.lit(64 - p) - F.length(F.bin(wbits))
    )
    state = nodes.select(
        "node", F.pmod(h, F.lit(m)).alias("bk"), rho.alias("reg")
    ).localCheckpoint(eager=True)

    def estimate(st: DataFrame, t: int) -> DataFrame:
        stats = st.groupBy("node").agg(
            F.count(F.lit(1)).alias("present"),
            F.sum(F.pow(F.lit(2.0), -F.col("reg"))).alias("zp"),
        )
        est = hll_estimate(F.col("present"), F.col("zp"), m)
        micro = F.floor(est * F.lit(1e6) + F.lit(0.5)).cast("long")
        return stats.agg(
            F.lit(t).cast("int").alias("t"),
            F.sum(micro).cast("long").alias("_micro"),
        )

    outs = [estimate(state, 0)]
    for t in range(1, rounds + 1):
        pulled = e.join(state, F.col("w") == F.col("node")).select(
            F.col("u").alias("node"), "bk", "reg"
        )
        state = (
            state.unionByName(pulled)
            .groupBy("node", "bk")
            .agg(F.max("reg").alias("reg"))
            .localCheckpoint(eager=True)
        )
        outs.append(estimate(state, t))
    curve = outs[0]
    for o in outs[1:]:
        curve = curve.unionByName(o)
    e.unpersist()
    final = curve.where(F.col("t") == rounds).select(
        F.col("_micro").alias("_f")
    )
    return (
        curve.crossJoin(F.broadcast(final))
        .select(
            "t",
            F.round(F.col("_micro") / F.lit(1e6), 6).alias("n_pairs"),
            F.round(
                F.try_divide(
                    F.col("_micro").cast("double"),
                    F.col("_f").cast("double"),
                ),
                6,
            ).alias("frac"),
        )
        .orderBy("t")
    )


def anf_oracle_sql(edges_sql: str, rounds: int = 4, p: int = 6) -> str:
    """DuckDB twin of :func:`neighborhood_function`, unrolled as
    MATERIALIZED CTEs (the iterative-graph oracle recipe): same
    hygiene, the q87 HLL hash/rank math, per-round sparse register
    max-merge, the same folded estimator literals, micro-unit
    quantization and the frac division. ``edges_sql`` must yield
    (src, dst)."""
    from .sketch import _alpha

    m = 1 << p
    amm = repr(_alpha(m) * m * m)
    rk = 64 - p
    est = (
        f"CASE WHEN {amm} / (zp + ({m} - present)) <= {2.5 * m}"
        f" AND ({m} - present) > 0"
        f" THEN {m} * ln({m} / ({m} - present))"
        f" ELSE {amm} / (zp + ({m} - present)) END"
    )
    parts = [
        f"""WITH raw AS ({edges_sql}),
e AS MATERIALIZED (
  SELECT DISTINCT src AS u, dst AS w FROM raw WHERE src <> dst),
nodes AS MATERIALIZED (
  SELECT u AS node FROM e UNION SELECT w FROM e),
hashed AS (
  SELECT node,
         CAST(CAST(md5_number_lower(node) AS HUGEINT)
              % (CAST(1 AS HUGEINT) << 63) AS BIGINT) AS h
  FROM nodes),
s0 AS MATERIALIZED (
  SELECT node, h % {m} AS bk,
         CASE WHEN (h >> {p}) = 0 THEN {rk}
              ELSE {rk} - length(bin(h >> {p})) END AS reg
  FROM hashed)"""
    ]
    for t in range(1, rounds + 1):
        parts.append(
            f"""s{t} AS MATERIALIZED (
  SELECT node, bk, max(reg) AS reg FROM (
    SELECT * FROM s{t - 1}
    UNION ALL
    SELECT e.u AS node, s.bk, s.reg
    FROM e JOIN s{t - 1} s ON s.node = e.w)
  GROUP BY node, bk)"""
        )
    for t in range(rounds + 1):
        parts.append(
            f"""m{t} AS (
  SELECT {t} AS t,
         CAST(sum(CAST(floor(({est}) * 1000000 + 0.5) AS BIGINT))
           AS BIGINT) AS micro
  FROM (
    SELECT node, count(*) AS present,
           sum(power(2.0, -reg)) AS zp
    FROM s{t} GROUP BY node))"""
        )
    union = "\nUNION ALL\n".join(
        f"SELECT * FROM m{t}" for t in range(rounds + 1)
    )
    parts.append(f"curve AS ({union})")
    parts.append(
        f"fin AS (SELECT micro AS f FROM curve WHERE t = {rounds})"
    )
    final = f"""SELECT CAST(t AS INT) AS t,
       round(micro / 1000000.0, 6) AS n_pairs,
       round(CAST(micro AS DOUBLE) / CAST(f AS DOUBLE), 6) AS frac
FROM curve, fin ORDER BY t"""
    return ",\n".join(parts) + "\n" + final


def harmonic_centrality(
    edges: DataFrame,
    rounds: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """EXACT out-harmonic centrality H(u) = Σ_{v≠u, d(u,v)≤rounds}
    1/d(u,v) over the directed host graph — the centrality Boldi &
    Vigna ("Axioms for Centrality", 2014) recommend over closeness
    because unreachable nodes contribute 0 instead of poisoning the
    mean. For a crawl scheduler it reads as *reach power*: how much of
    the web a host opens up, discounted by link distance — a natural
    seed-selection score next to ``greedy_seed_cover``.

    Exact all-pairs BFS via ``rounds`` min-relaxation rounds over a
    SPARSE (src, node, depth) frame (the ``bfs_depths`` recurrence
    with every node as its own seed): one equi-key join + min-groupBy
    per round, lineage truncated per round. Exact-all-pairs is
    O(n·m) work and an n²-bounded state — right for HOST graphs
    (10⁶–10⁸ hosts, not pages). For page-level graphs use the
    HyperBall estimate instead: :func:`neighborhood_function` already
    maintains the per-node reachable-ball HLLs; harmonic follows by
    differencing rounds (Boldi & Vigna 2013) — documented scale path,
    same register stack.

    1/d sums in EXACT integer micro-units (``1000000 div d`` — the
    q147/q152 convention), so the score is bit-reproducible against
    the unrolled-CTE oracle (q168). A round past the graph's
    eccentricity is a no-op, so fixed ``rounds`` is exact whenever it
    covers the true diameter; beyond-horizon pairs contribute 0 by
    harmonic's own definition.

    Returns ``(host, n_reached, harmonic_micro)`` — ``n_reached``
    counts v≠u within the horizon.
    """
    e, hosts = clean_host_edges(edges, src_col, dst_col)
    d = hosts.select(
        F.col("host").alias("u"),
        F.col("host").alias("v"),
        F.lit(0).cast("long").alias("depth"),
    )
    for _ in range(rounds):
        step = (
            d.join(e, d.v == e.src)
            .select(
                "u",
                F.col("dst").alias("v"),
                (F.col("depth") + F.lit(1)).alias("depth"),
            )
        )
        d = (
            d.unionByName(step)
            .groupBy("u", "v")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
    reached = d.where(F.col("depth") > 0)
    agg = reached.groupBy("u").agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.sum(F.expr("1000000 div depth")).cast("long").alias(
            "harmonic_micro"
        ),
    )
    return hosts.join(agg, hosts.host == agg.u, "left").select(
        "host",
        F.coalesce(F.col("n_reached"), F.lit(0)).cast("long").alias(
            "n_reached"
        ),
        F.coalesce(F.col("harmonic_micro"), F.lit(0)).cast("long").alias(
            "harmonic_micro"
        ),
    )


def harmonic_oracle_sql(raw_edges_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of :func:`harmonic_centrality`: the all-pairs
    min-relaxation unrolled as MATERIALIZED CTEs (the bfs_depths
    oracle pattern lifted to (u, v) state) — all-integer, exact."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "d0 AS MATERIALIZED (SELECT host AS u, host AS v,"
        " CAST(0 AS BIGINT) AS depth FROM hosts),",
    ]
    for i in range(1, rounds + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT u, v, min(depth) AS depth"
            f" FROM (SELECT u, v, depth FROM d{i - 1}"
            f" UNION ALL SELECT d.u, e.dst, d.depth + 1"
            f" FROM e JOIN d{i - 1} d ON e.src = d.v) x"
            " GROUP BY u, v),"
        )
    parts.append(
        "agg AS (SELECT u, count(*) AS n_reached,"
        " sum(1000000 // depth) AS harmonic_micro"
        f" FROM d{rounds} WHERE depth > 0 GROUP BY u)"
    )
    final = (
        "SELECT hosts.host,"
        " CAST(coalesce(agg.n_reached, 0) AS BIGINT) AS n_reached,"
        " CAST(coalesce(agg.harmonic_micro, 0) AS BIGINT)"
        " AS harmonic_micro"
        " FROM hosts LEFT JOIN agg ON hosts.host = agg.u"
        " ORDER BY hosts.host"
    )
    return "\n".join(parts) + "\n" + final


def bowtie(
    edges: DataFrame,
    rounds: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Bow-tie decomposition of the directed host graph (Broder et
    al., "Graph structure in the Web", WWW 2000) — the canonical
    web-corpus structure audit: every host classified as

    - ``core``   — the pivot's strongly-connected component,
    - ``in``     — reaches the core but is not reached by it,
    - ``out``    — reached by the core but cannot get back,
    - ``tube``   — on an IN→OUT path that bypasses the core,
    - ``tendril``— hangs off IN (reachable from IN, dead-ends) or
                   feeds OUT (reaches OUT, unreachable from IN/core),
    - ``disconnected`` — none of the above within the horizon.

    For a crawl it answers "where does seed-reachable web end":
    frontier budget spent on OUT/tendril hosts never refreshes the
    core, and a large DISCONNECTED share means the seed list — not
    politeness — is the coverage bottleneck.

    FW-BW single-pivot scheme: pivot = max-out-degree host (tie →
    lexicographic min; deterministic in both engines), F/B = forward/
    backward reachable sets within ``rounds`` frontier expansions,
    core = F∩B, then two more sweeps (forward from IN, backward from
    OUT) split the remainder into tube/tendril/disconnected. Four
    BFS passes, each round ONE equi-key join + distinct over a
    node-set frame (O(n) state, never pairs — contrast
    ``harmonic_centrality``'s O(n²) all-pairs state), lineage
    truncated per round. ``rounds`` past the true eccentricity is a
    no-op, so a fixed horizon covering the diameter is exact — same
    convention as ``bfs_depths``/``harmonic_centrality``.

    The single ``.collect()`` is the 1-row pivot election (bounded
    scalar, the iterative-operator convention). Returns
    ``(host, component)``.
    """
    e, hosts = clean_host_edges(edges, src_col, dst_col)
    pivot_rows = (
        e.groupBy("src")
        .agg(F.count(F.lit(1)).alias("deg"))
        .orderBy(F.col("deg").desc(), F.col("src").asc())
        .limit(1)
        .collect()
    )
    if not pivot_rows:
        return hosts.select(
            "host", F.lit("disconnected").alias("component")
        )
    pivot = pivot_rows[0]["src"]

    def sweep(seeds: DataFrame, forward: bool) -> DataFrame:
        """Distinct reachable-node set from ``seeds`` (inclusive)
        within ``rounds`` expansions, following edges forward or
        backward."""
        frm, to = ("src", "dst") if forward else ("dst", "src")
        r = seeds.select(F.col("host").alias("v")).distinct()
        for _ in range(rounds):
            step = (
                r.alias("r")
                .join(e.alias("ee"), F.col("r.v") == F.col(f"ee.{frm}"))
                .select(F.col(f"ee.{to}").alias("v"))
            )
            r = (
                r.unionByName(step)
                .distinct()
                .localCheckpoint(eager=False)
            )
        return r

    seed = hosts.where(F.col("host") == F.lit(pivot))
    fset = sweep(seed, forward=True)
    bset = sweep(seed, forward=False)

    flagged = (
        hosts.join(
            fset.select(F.col("v").alias("host"), F.lit(1).alias("f")),
            "host",
            "left",
        )
        .join(
            bset.select(F.col("v").alias("host"), F.lit(1).alias("b")),
            "host",
            "left",
        )
        .select(
            "host",
            F.coalesce("f", F.lit(0)).alias("f"),
            F.coalesce("b", F.lit(0)).alias("b"),
        )
        .cache()
    )
    in_seeds = flagged.where((F.col("b") == 1) & (F.col("f") == 0))
    out_seeds = flagged.where((F.col("f") == 1) & (F.col("b") == 0))
    tin = sweep(in_seeds, forward=True)
    tout = sweep(out_seeds, forward=False)

    out = (
        flagged.join(
            tin.select(F.col("v").alias("host"), F.lit(1).alias("ti")),
            "host",
            "left",
        )
        .join(
            tout.select(F.col("v").alias("host"), F.lit(1).alias("to")),
            "host",
            "left",
        )
        .select(
            "host",
            F.when((F.col("f") == 1) & (F.col("b") == 1), "core")
            .when(F.col("b") == 1, "in")
            .when(F.col("f") == 1, "out")
            .when(
                F.coalesce("ti", F.lit(0))
                + F.coalesce("to", F.lit(0))
                == 2,
                "tube",
            )
            .when(
                F.coalesce("ti", F.lit(0))
                + F.coalesce("to", F.lit(0))
                == 1,
                "tendril",
            )
            .otherwise("disconnected")
            .alias("component"),
        )
    )
    return out


def bowtie_oracle_sql(raw_edges_sql: str, rounds: int = 6) -> str:
    """DuckDB twin of :func:`bowtie`: pivot election, the four
    frontier sweeps unrolled as MATERIALIZED set-CTEs, and the same
    classification CASE."""

    def sweep(name: str, seeds: str, forward: bool) -> list[str]:
        frm, to = ("src", "dst") if forward else ("dst", "src")
        parts = [f"{name}0 AS MATERIALIZED ({seeds}),"]
        for i in range(1, rounds + 1):
            parts.append(
                f"{name}{i} AS MATERIALIZED (SELECT DISTINCT v FROM"
                f" (SELECT v FROM {name}{i - 1}"
                f" UNION ALL SELECT e.{to} AS v FROM e"
                f" JOIN {name}{i - 1} r ON e.{frm} = r.v) x),"
            )
        return parts

    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "pv AS MATERIALIZED (SELECT src AS v FROM"
        " (SELECT src, count(*) AS deg FROM e GROUP BY src)"
        " ORDER BY deg DESC, src ASC LIMIT 1),",
    ]
    parts += sweep("f", "SELECT v FROM pv", forward=True)
    parts += sweep("b", "SELECT v FROM pv", forward=False)
    parts.append(
        "flagged AS MATERIALIZED (SELECT hosts.host,"
        f" CASE WHEN f{rounds}.v IS NOT NULL THEN 1 ELSE 0 END AS f,"
        f" CASE WHEN b{rounds}.v IS NOT NULL THEN 1 ELSE 0 END AS b"
        f" FROM hosts LEFT JOIN f{rounds} ON hosts.host = f{rounds}.v"
        f" LEFT JOIN b{rounds} ON hosts.host = b{rounds}.v),"
    )
    parts += sweep(
        "ti",
        "SELECT host AS v FROM flagged WHERE b = 1 AND f = 0",
        forward=True,
    )
    parts += sweep(
        "tp",
        "SELECT host AS v FROM flagged WHERE f = 1 AND b = 0",
        forward=False,
    )
    parts.append(
        "cls AS (SELECT fl.host,"
        " CASE WHEN fl.f = 1 AND fl.b = 1 THEN 'core'"
        " WHEN fl.b = 1 THEN 'in'"
        " WHEN fl.f = 1 THEN 'out'"
        " WHEN ti.v IS NOT NULL AND tp.v IS NOT NULL THEN 'tube'"
        " WHEN ti.v IS NOT NULL OR tp.v IS NOT NULL THEN 'tendril'"
        " ELSE 'disconnected' END AS component"
        f" FROM flagged fl LEFT JOIN ti{rounds} ti ON fl.host = ti.v"
        f" LEFT JOIN tp{rounds} tp ON fl.host = tp.v)"
    )
    final = "SELECT host, component FROM cls ORDER BY host"
    return "\n".join(parts) + "\n" + final


def scc(
    edges: DataFrame,
    outer_rounds: int = 3,
    inner_rounds: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    verify: bool = False,
) -> DataFrame:
    """EXACT strongly-connected components by iterated forward/
    backward min-label refinement (the coloring family — Orzan 2004 /
    FW-BW label refinement): generalizes :func:`bowtie` (which only
    materializes the PIVOT's SCC) to every component — the host-graph
    condensation a crawl needs to find ALL link cliques, not just the
    giant one.

    Each outer round, within the current class partition: ``f(v)`` =
    min node id that reaches v along class-internal edges, ``b(v)`` =
    min id v reaches (two min-label propagations, ``inner_rounds``
    relaxations each); the new class is the pair ``f|b``. Two
    invariants make the fixpoint exactly the SCCs: (1) an SCC never
    splits — any path inside a u↔v cycle lies wholly in their SCC, so
    SCC members always share (f, b); (2) a stable class is strongly
    connected — constant f ≡ m_f and b ≡ m_b force m_f = m_b (b(m_f)
    ≤ m_f by self-reach, so m_b < m_f is impossible, and vice versa),
    hence m reaches every member and every member reaches m.
    Fixed-round contract (``bfs_depths`` convention): exact whenever
    ``inner_rounds`` ≥ max within-class distance-to-label-source and
    ``outer_rounds`` suffices for the refinement to stabilize (1-2
    rounds beyond the first split cascade in practice). UNLIKE the
    distance operators, truncation here is not graceful — an
    under-provisioned ``inner_rounds`` can SPLIT a true SCC (the
    label simply hasn't arrived), so production callers should pass
    ``verify=True``: one extra outer round re-runs the refinement and
    raises if any class still moves. The oracle keeps fixed rounds —
    rounds past convergence are exact no-ops, so a verified Spark run
    matches any sufficiently-deep unrolled oracle.

    Scale shape: per inner round ONE equi-key join + min-groupBy over
    an O(n) (node, label) frame — never pairs, never neighborhoods;
    the class restriction is two hash joins re-labeling the edge
    list per outer round; lineage truncated every round. For
    page-level graphs run the same loop on the HOST condensation
    first (10^6–10^8 nodes), the standard web-graph reduction.

    Returns ``(host, scc_id, scc_size)`` — ``scc_id`` is the
    component's min member id at convergence.
    """
    e, hosts = clean_host_edges(edges, src_col, dst_col)
    cls = hosts.select("host", F.lit("*").alias("cls"))

    def minprop(ee: DataFrame, forward: bool) -> DataFrame:
        frm, to = ("src", "dst") if forward else ("dst", "src")
        d = hosts.select(
            F.col("host").alias("v"), F.col("host").alias("lab")
        )
        for _ in range(inner_rounds):
            step = (
                d.alias("d")
                .join(
                    ee.alias("ee"), F.col("d.v") == F.col(f"ee.{frm}")
                )
                .select(
                    F.col(f"ee.{to}").alias("v"),
                    F.col("d.lab").alias("lab"),
                )
            )
            d = (
                d.unionByName(step)
                .groupBy("v")
                .agg(F.min("lab").alias("lab"))
                .localCheckpoint(eager=False)
            )
        return d

    def refine(cur: DataFrame) -> DataFrame:
        ee = (
            e.alias("e")
            .join(
                cur.alias("cs"),
                F.col("e.src") == F.col("cs.host"),
            )
            .join(
                cur.alias("cd"),
                F.col("e.dst") == F.col("cd.host"),
            )
            .where(F.col("cs.cls") == F.col("cd.cls"))
            .select(F.col("e.src").alias("src"), F.col("e.dst").alias("dst"))
            .localCheckpoint(eager=False)
        )
        f = minprop(ee, forward=True)
        b = minprop(ee, forward=False)
        return (
            f.select(F.col("v").alias("host"), F.col("lab").alias("fl"))
            .join(
                b.select(F.col("v").alias("host"), F.col("lab").alias("bl")),
                "host",
            )
            .select(
                "host", F.concat("fl", F.lit("|"), "bl").alias("cls")
            )
            .localCheckpoint(eager=False)
        )

    for _ in range(outer_rounds):
        cls = refine(cls)
    if verify:
        nxt = refine(cls)
        moved = (
            cls.alias("a")
            .join(nxt.alias("b"), F.col("a.host") == F.col("b.host"))
            .where(F.col("a.cls") != F.col("b.cls"))
            .count()
        )
        if moved:
            raise RuntimeError(
                f"scc: {moved} hosts still refining after "
                f"{outer_rounds} outer rounds — raise outer_rounds/"
                "inner_rounds (insufficient depth can split true SCCs)"
            )
    # At convergence f == b == min member; strip to it.
    comp = cls.select(
        "host",
        F.substring_index(F.col("cls"), "|", 1).alias("scc_id"),
    )
    sizes = comp.groupBy("scc_id").agg(
        F.count(F.lit(1)).alias("scc_size")
    )
    return comp.join(sizes, "scc_id").select("host", "scc_id", "scc_size")


def scc_oracle_sql(
    raw_edges_sql: str,
    outer_rounds: int = 3,
    inner_rounds: int = 6,
) -> str:
    """DuckDB twin of :func:`scc`: every outer round's class-restricted
    edge list and both min-label propagations unrolled as MATERIALIZED
    CTEs, the same f|b refinement and the min-member strip."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "cls0 AS MATERIALIZED (SELECT host, '*' AS cls FROM hosts),",
    ]
    for r in range(1, outer_rounds + 1):
        parts.append(
            f"ee{r} AS MATERIALIZED (SELECT e.src, e.dst FROM e"
            f" JOIN cls{r - 1} cs ON e.src = cs.host"
            f" JOIN cls{r - 1} cd ON e.dst = cd.host"
            " WHERE cs.cls = cd.cls),"
        )
        for name, frm, to in ((f"f{r}_", "src", "dst"), (f"b{r}_", "dst", "src")):
            parts.append(
                f"{name}0 AS MATERIALIZED (SELECT host AS v,"
                " host AS lab FROM hosts),"
            )
            for i in range(1, inner_rounds + 1):
                parts.append(
                    f"{name}{i} AS MATERIALIZED (SELECT v, min(lab)"
                    f" AS lab FROM (SELECT v, lab FROM {name}{i - 1}"
                    f" UNION ALL SELECT ee{r}.{to} AS v, d.lab"
                    f" FROM ee{r} JOIN {name}{i - 1} d"
                    f" ON ee{r}.{frm} = d.v) x GROUP BY v),"
                )
        parts.append(
            f"cls{r} AS MATERIALIZED (SELECT f.v AS host,"
            f" f.lab || '|' || b.lab AS cls"
            f" FROM f{r}_{inner_rounds} f"
            f" JOIN b{r}_{inner_rounds} b ON f.v = b.v),"
        )
    parts.append(
        "comp AS (SELECT host,"
        f" split_part(cls, '|', 1) AS scc_id FROM cls{outer_rounds}),"
    )
    parts.append(
        "sizes AS (SELECT scc_id, CAST(count(*) AS BIGINT)"
        " AS scc_size FROM comp GROUP BY scc_id)"
    )
    final = (
        "SELECT comp.host, comp.scc_id, sizes.scc_size"
        " FROM comp JOIN sizes ON comp.scc_id = sizes.scc_id"
        " ORDER BY comp.host"
    )
    return "\n".join(parts) + "\n" + final


def hub_removal_resilience(
    edges: DataFrame,
    ks: "tuple[int, ...]" = (0, 1, 2),
    rounds: int = 6,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
) -> DataFrame:
    """Percolation / robustness audit of the host graph: weakly-
    connected component structure BEFORE and AFTER removing the
    top-k highest-degree hubs — the classic scale-free fragility
    measurement (Albert-Jeong-Barabási: random failure barely dents a
    power-law web, targeted hub removal shatters it). Crawl reading:
    if blocklisting / rate-limiting the top hubs fragments the
    reachable web, seed diversity — not frontier priority — is the
    coverage insurance.

    Per scenario k: drop the k hubs (undirected degree desc, host asc
    — deterministic), run min-label propagation over the remaining
    undirected edges (``rounds`` relaxations, exact when ≥ diameter,
    the fixed-round contract), roll up component count / largest
    size / isolated survivors. Hub election is a bounded
    ``max(ks)``-row collect (per-round scalar convention).

    Scale: per k ONE label frame of O(n) rows relaxed ``rounds``
    times (equi-join + min-groupBy each) — the q177 register shape;
    degree is one hash agg. Returns one row per k:
    ``(k, n_hosts, n_components, largest, largest_share_micro)``.
    """
    und = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .where(
            F.col("a").isNotNull()
            & F.col("b").isNotNull()
            & (F.col("a") != F.col("b"))
        )
        .select(
            F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")
        )
        .distinct()
        .cache()
    )
    nodes = (
        und.select(F.col("u").alias("host"))
        .unionByName(und.select(F.col("v").alias("host")))
        .distinct()
        .cache()
    )
    deg = (
        und.select(F.col("u").alias("host"))
        .unionByName(und.select(F.col("v").alias("host")))
        .groupBy("host")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    kmax = max(ks)
    hubs = [
        r["host"]
        for r in deg.orderBy(F.col("deg").desc(), F.col("host").asc())
        .limit(kmax)
        .collect()
    ]

    spark = edges.sparkSession
    out = None
    for k in ks:
        drop = set(hubs[:k])
        surv_nodes = nodes.where(~F.col("host").isin(*drop) if drop else F.lit(True))
        ee = und
        if drop:
            ee = und.where(
                ~F.col("u").isin(*drop) & ~F.col("v").isin(*drop)
            )
        bi = ee.select("u", "v").unionByName(
            ee.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        d = surv_nodes.select(
            F.col("host").alias("n"), F.col("host").alias("lab")
        )
        for _ in range(rounds):
            step = (
                d.alias("d")
                .join(bi.alias("e"), F.col("d.n") == F.col("e.u"))
                .select(F.col("e.v").alias("n"), F.col("d.lab").alias("lab"))
            )
            d = (
                d.unionByName(step)
                .groupBy("n")
                .agg(F.min("lab").alias("lab"))
                .localCheckpoint(eager=False)
            )
        sizes = d.groupBy("lab").agg(F.count(F.lit(1)).alias("sz"))
        row = sizes.agg(
            F.lit(k).alias("k"),
            F.sum("sz").cast("long").alias("n_hosts"),
            F.count(F.lit(1)).cast("long").alias("n_components"),
            F.max("sz").cast("long").alias("largest"),
        ).withColumn(
            "largest_share_micro",
            F.expr(
                "CASE WHEN n_hosts > 0 THEN (largest * CAST(1000000"
                " AS BIGINT)) DIV n_hosts ELSE CAST(0 AS BIGINT) END"
            ),
        )
        out = row if out is None else out.unionByName(row)
    return out


def hub_removal_oracle_sql(
    raw_edges_sql: str,
    ks: "tuple[int, ...]" = (0, 1, 2),
    rounds: int = 6,
) -> str:
    """DuckDB twin of :func:`hub_removal_resilience`: hub ranking +
    per-scenario unrolled min-label propagation + rollup."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "und AS MATERIALIZED (SELECT DISTINCT least(src, dst) AS u,"
        " greatest(src, dst) AS v FROM raw WHERE src IS NOT NULL"
        " AND dst IS NOT NULL AND src <> dst),",
        "nodes AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT u AS host FROM und UNION ALL SELECT v FROM und)),",
        "deg AS MATERIALIZED (SELECT host, count(*) AS deg FROM"
        " (SELECT u AS host FROM und UNION ALL SELECT v FROM und)"
        " GROUP BY host),",
        "hubs AS MATERIALIZED (SELECT host, row_number() OVER"
        " (ORDER BY deg DESC, host ASC) AS rk FROM deg),",
    ]
    selects = []
    for k in ks:
        parts.append(
            f"sn{k} AS MATERIALIZED (SELECT host FROM nodes WHERE"
            f" host NOT IN (SELECT host FROM hubs WHERE rk <= {k})),"
        )
        parts.append(
            f"se{k} AS MATERIALIZED (SELECT u, v FROM und WHERE"
            f" u IN (SELECT host FROM sn{k})"
            f" AND v IN (SELECT host FROM sn{k})),"
        )
        parts.append(
            f"bi{k} AS MATERIALIZED (SELECT u, v FROM se{k}"
            f" UNION ALL SELECT v AS u, u AS v FROM se{k}),"
        )
        parts.append(
            f"d{k}_0 AS MATERIALIZED (SELECT host AS n, host AS lab"
            f" FROM sn{k}),"
        )
        for i in range(1, rounds + 1):
            parts.append(
                f"d{k}_{i} AS MATERIALIZED (SELECT n, min(lab) AS lab"
                f" FROM (SELECT n, lab FROM d{k}_{i - 1}"
                f" UNION ALL SELECT bi{k}.v AS n, d.lab"
                f" FROM bi{k} JOIN d{k}_{i - 1} d ON bi{k}.u = d.n) x"
                " GROUP BY n),"
            )
        parts.append(
            f"sz{k} AS MATERIALIZED (SELECT lab, count(*) AS sz"
            f" FROM d{k}_{rounds} GROUP BY lab),"
        )
        selects.append(
            f"SELECT {k} AS k, CAST(sum(sz) AS BIGINT) AS n_hosts,"
            " CAST(count(*) AS BIGINT) AS n_components,"
            " CAST(max(sz) AS BIGINT) AS largest,"
            " CASE WHEN sum(sz) > 0 THEN (max(sz) * CAST(1000000 AS"
            " BIGINT)) // sum(sz) ELSE CAST(0 AS BIGINT) END"
            f" AS largest_share_micro FROM sz{k}"
        )
    parts[-1] = parts[-1].rstrip(",")
    body = " UNION ALL ".join(selects)
    return (
        "\n".join(parts)
        + ",\nres AS ("
        + body
        + ")\nSELECT * FROM res ORDER BY k"
    )
