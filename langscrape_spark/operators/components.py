"""Distributed connected components over duplicate-pair edges, and
duplicate-cluster resolution on top of it.

The pair generators (``minhash_lsh_pairs``, ``simhash_near_dups``,
``ngram_jaccard_pairs``, the embedding near-dup family) emit EDGES;
an actual dedup pass must then group transitively-connected documents
into clusters and elect one canonical survivor per cluster — near-dup
relations are not transitive, so "keep id_a of every pair" both
over- and under-deletes. This module is that second half.

Algorithm: alternating large-star / small-star (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) expressed as
plain DataFrame aggregations and equi-joins:

- large-star: every node points its LARGER neighbors at the minimum
  of its neighborhood (including itself);
- small-star: every node points its smaller-or-equal neighbors (and
  itself) at that minimum.

Both steps are a ``groupBy(u).min(v)`` plus one equi-join back on
``u`` — the neighborhood is never materialized as an array, so a hot
node (a star center accumulating its whole component, which is the
algorithm's FIXED POINT, not an anomaly) costs one shuffle partition,
not one task's memory. Converges in O(log n) rounds on real graphs
(near-dup clusters are dense, typically 2-4 rounds); each round is two
shuffles on uniformly-hashed node ids. This is the same fixed-action
iterative shape as ``hostrank.host_pagerank`` (bounded driver actions
per round, ``localCheckpoint`` lineage truncation).

At 100 TB: the edge list is the OUTPUT of the LSH passes — orders of
magnitude smaller than the corpus (pairs, not documents, and only
within buckets), so the per-round shuffles are tiny next to the
signature pass that produced them. No step is quadratic in component
size; the star fixed point is exactly |component|-1 edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def _canonical_edges(edges: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Directed (u > v) self-loop-free distinct edge list."""
    a, b = F.col(a_col), F.col(b_col)
    return (
        edges.where(a != b)
        .select(
            F.greatest(a, b).alias("u"),
            F.least(a, b).alias("v"),
        )
        .distinct()
    )


def _large_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every neighbor v > u, m = min(N(u) ∪ {u}).

    Works on the symmetrized adjacency; output is again u > v
    directed (m is the neighborhood min, so m < v always)."""
    sym = edges.unionByName(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    )
    mins = sym.groupBy("u").agg(
        F.least(F.min("v"), F.col("u")).alias("m")
    )
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """(v, m) for every SMALLER neighbor v of u plus (u, m) itself,
    m = min of u's smaller neighbors; operates on the directed
    (u > v) list so m = min(N<(u))."""
    mins = edges.groupBy("u").agg(F.min("v").alias("m"))
    relink = (
        edges.join(mins, "u")
        .where(F.col("v") != F.col("m"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
    )
    self_link = mins.select("u", F.col("m").alias("v"))
    return relink.unionByName(self_link).distinct()


def _edge_digest(edges: DataFrame):
    """(count, order-independent hash) of an edge set — one action."""
    row = edges.agg(
        F.count("*").alias("n"),
        # decimal(38,0) sum: ANSI mode would overflow a long sum of
        # 64-bit hashes; decimal is exact and order-independent
        F.coalesce(
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def connected_components(
    edges: DataFrame,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 50,
) -> DataFrame:
    """Component labels for every node appearing in ``edges``:
    ``(id, component)`` where ``component`` is the minimum node id of
    the connected component. Nodes absent from ``edges`` (documents in
    no duplicate pair) are not emitted — callers left-join and
    coalesce to the node's own id (see :func:`resolve_duplicates`).

    Alternates large-star / small-star until the directed edge set is
    a fixed point (count + order-independent xxhash64 digest — one
    driver action per round). Raises ``RuntimeError`` if not converged
    within ``max_iterations`` rather than returning a partially
    contracted labeling.
    """
    cur = _canonical_edges(edges, a_col, b_col).localCheckpoint(eager=True)
    prev_digest = _edge_digest(cur)
    if prev_digest[0] == 0:
        return cur.select(
            F.col("u").alias("id"), F.col("v").alias("component")
        )
    for _ in range(max_iterations):
        nxt = _small_star(_large_star(cur)).localCheckpoint(eager=True)
        digest = _edge_digest(nxt)
        cur.unpersist()
        cur = nxt
        if digest == prev_digest:
            break
        prev_digest = digest
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_iterations} "
            "rounds (adversarial chain input? raise max_iterations)"
        )
    # Fixed point is a star forest: every non-center node appears
    # exactly once as u with its center as v; centers only as v.
    labels = cur.select(F.col("u").alias("id"), F.col("v").alias("component"))
    centers = cur.select(
        F.col("v").alias("id"), F.col("v").alias("component")
    ).distinct()
    return labels.unionByName(centers)


def resolve_duplicates(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    a_col: str = "id_a",
    b_col: str = "id_b",
) -> DataFrame:
    """Annotate ``docs`` with the duplicate-cluster resolution:
    ``canonical_id`` (the component minimum — the elected survivor),
    ``cluster_size`` and ``is_canonical``. Downstream dedup is
    ``.where("is_canonical")``; the full mapping is kept so provenance
    (which survivor replaced me) stays queryable, which a 100 TB
    training-data pipeline needs for attribution/debugging.

    One equi-join on the doc id against the (tiny) component map plus
    one count aggregation on ``canonical_id``; no broadcast hint — the
    component map is pair-bounded, so AQE picks broadcast when it fits
    and a shuffle join when a pathological pair volume would OOM a
    broadcast."""
    comp = connected_components(pairs, a_col, b_col)
    labeled = docs.join(
        comp, docs[id_col] == comp["id"], "left"
    ).select(
        *[docs[c] for c in docs.columns],
        F.coalesce(comp["component"], docs[id_col]).alias("canonical_id"),
    )
    sizes = labeled.groupBy("canonical_id").agg(
        F.count("*").alias("cluster_size")
    )
    return labeled.join(sizes, "canonical_id").select(
        *[labeled[c] for c in docs.columns],
        "canonical_id",
        "cluster_size",
        (F.col(id_col) == F.col("canonical_id")).alias("is_canonical"),
    )


def label_propagation(
    edges: DataFrame,
    src_col: str = "src_host",
    dst_col: str = "dst_host",
    iterations: int = 4,
) -> DataFrame:
    """Community detection by synchronous majority label propagation
    (Raghavan et al. 2007), the cheap complement to
    ``connected_components``: components find *reachability*
    clusters, LPA finds *densely-linked* ones — two host families
    joined by one bridge edge are ONE component but TWO communities.
    Deterministic variant: every node votes with all neighbor labels
    plus its own (self-vote), adopting the most frequent label with
    ties broken by the smallest label — pure integer/string
    arithmetic, so the unrolled-CTE oracle matches exactly (no float
    anywhere).

    Scale shape: the symmetrized edge list is cached once; each round
    is ONE equi-key join (neighbor → label), one (host, label) count
    aggregation (map-side combinable — a hub's repeated neighbor
    labels collapse before the shuffle), and a per-host
    ``row_number`` window (partitioned by host, parallel by
    construction). Neighbor lists are never materialized as arrays;
    a 10^6-degree hub is one reduce group. ``localCheckpoint`` per
    round keeps the plan flat.

    Returns ``(host, community, community_size)``.
    """
    from pyspark.sql import Window

    e = (
        edges.select(
            F.col(src_col).alias("a"), F.col(dst_col).alias("b")
        )
        .where(F.col("a").isNotNull() & F.col("b").isNotNull())
        .distinct()
    )
    hosts = (
        e.select(F.col("a").alias("host"))
        .unionByName(e.select(F.col("b").alias("host")))
        .distinct()
        .cache()
    )
    und = (
        e.select(F.col("a").alias("host"), F.col("b").alias("nb"))
        .unionByName(
            e.select(F.col("b").alias("host"), F.col("a").alias("nb"))
        )
        .unionByName(
            hosts.select("host", F.col("host").alias("nb"))
        )
        .distinct()
        .cache()
    )
    und.count()

    labels = hosts.select("host", F.col("host").alias("lab"))
    w = Window.partitionBy("host").orderBy(F.desc("c"), F.asc("lab"))
    for _ in range(iterations):
        votes = (
            und.join(
                labels.withColumnRenamed("host", "nb"), "nb"
            )
            .groupBy("host", "lab")
            .agg(F.count(F.lit(1)).alias("c"))
        )
        labels = (
            votes.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") == 1)
            .select("host", "lab")
            .localCheckpoint(eager=False)
        )

    sizes = labels.groupBy("lab").agg(
        F.count(F.lit(1)).alias("community_size")
    )
    return labels.join(sizes, "lab").select(
        "host",
        F.col("lab").alias("community"),
        F.col("community_size").cast("long").alias("community_size"),
    )


def label_propagation_oracle_sql(
    raw_edges_sql: str, iterations: int = 4
) -> str:
    """DuckDB twin of ``label_propagation``: the vote/adopt rounds
    unrolled as MATERIALIZED CTEs (same exponential-inlining hazard
    as the hostrank builders) with identical tie-breaks."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src AS a, dst AS b FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT a AS host FROM e UNION ALL SELECT b FROM e)),",
        "und AS MATERIALIZED (SELECT DISTINCT host, nb FROM ("
        "SELECT a AS host, b AS nb FROM e"
        " UNION ALL SELECT b, a FROM e"
        " UNION ALL SELECT host, host FROM hosts)),",
        "l0 AS MATERIALIZED (SELECT host, host AS lab FROM hosts),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"v{i} AS MATERIALIZED (SELECT u.host, l.lab,"
            f" count(*) AS c FROM und u JOIN l{i - 1} l"
            " ON u.nb = l.host GROUP BY u.host, l.lab),",
            f"l{i} AS MATERIALIZED (SELECT host, lab FROM ("
            "SELECT host, lab, row_number() OVER (PARTITION BY host"
            f" ORDER BY c DESC, lab) AS rn FROM v{i}) WHERE rn = 1),",
        ]
    n = iterations
    parts.append(
        f"sizes AS (SELECT lab, count(*) AS sz FROM l{n} GROUP BY lab)"
    )
    return (
        "\n".join(parts)
        + f"\nSELECT l.host, l.lab AS community,"
        f" CAST(s.sz AS BIGINT) AS community_size"
        f" FROM l{n} l JOIN sizes s USING (lab) ORDER BY l.host"
    )
