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


def hits(edges: DataFrame, iterations: int = 6) -> DataFrame:
    """Kleinberg HITS over the host graph: ``(host, authority, hub)``
    by fixed-iteration power iteration with L1 normalization after
    every half-step (deterministic — no convergence test, no
    sampling). Complements PageRank: authorities are where content
    concentrates (fetch-priority signal), hubs are the directory
    pages whose outlinks seed frontiers.

    Scale shape: same as ``host_pagerank`` — the deduped host edge
    list is cached once; each half-step is ONE equi-key join +
    grouped sum (map-side combinable), the normalizer is a bounded
    scalar collect that doubles as the iteration's checkpoint
    materializer (the A/B'd pattern from host_pagerank), and lineage
    is truncated per half-step so the plan stays flat at any
    iteration count. Score frames stay SPARSE (hosts with zero score
    are absent) until the final outer join.
    """
    if iterations < 1:
        raise ValueError("hits: iterations must be >= 1")
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    e, hosts = clean_host_edges(edges)
    if hosts.count() == 0:
        return spark.createDataFrame(
            [], "host string, authority double, hub double"
        )

    hub = hosts.select("host", F.lit(1.0).alias("s"))
    auth = None

    def _half_step(scores: DataFrame, join_on: str, out_key: str):
        raw = (
            e.join(scores, e[join_on] == scores.host)
            .groupBy(e[out_key].alias("host"))
            .agg(F.sum("s").alias("s"))
        ).localCheckpoint(eager=False)
        tot = raw.agg(F.sum("s")).first()[0]  # bounded scalar; also
        # eagerly materializes the half-step's checkpoint
        return raw.select("host", (F.col("s") / F.lit(tot)).alias("s"))

    for _ in range(iterations):
        auth = _half_step(hub, "src", "dst")
        hub = _half_step(auth, "dst", "src")

    return (
        hosts.join(auth.withColumnRenamed("s", "_a"), "host", "left")
        .join(hub.withColumnRenamed("s", "_h"), "host", "left")
        .select(
            "host",
            F.round(F.coalesce("_a", F.lit(0.0)), 6).alias("authority"),
            F.round(F.coalesce("_h", F.lit(0.0)), 6).alias("hub"),
        )
    )


def hits_oracle_sql(raw_edges_sql: str, iterations: int = 6) -> str:
    """The DuckDB twin of ``hits``: the power iteration unrolled as
    chained CTEs (the bpe_oracle_sql pattern), one a/h CTE pair per
    half-step with the L1 normalizer as a scalar subquery — proving
    the Spark loop's joins, grouped sums and normalization exact at
    round-6."""
    # every CTE MATERIALIZED: without it DuckDB inlines each
    # reference, and the h{i} -> a{i} -> h{i-1} chain doubles the
    # inlined tree per iteration (2^(2k) scans of the base table —
    # observed as an fd blowup at 6 iterations)
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "h0 AS MATERIALIZED (SELECT host, 1.0 AS s FROM hosts),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"a{i}r AS MATERIALIZED (SELECT e.dst AS host, sum(h.s) AS s"
            f" FROM e JOIN h{i - 1} h ON e.src = h.host GROUP BY e.dst),",
            f"a{i} AS MATERIALIZED (SELECT host,"
            f" s / (SELECT sum(s) FROM a{i}r) AS s FROM a{i}r),",
            f"h{i}r AS MATERIALIZED (SELECT e.src AS host, sum(a.s) AS s"
            f" FROM e JOIN a{i} a ON e.dst = a.host GROUP BY e.src),",
            f"h{i} AS MATERIALIZED (SELECT host,"
            f" s / (SELECT sum(s) FROM h{i}r) AS s FROM h{i}r),",
        ]
    n = iterations
    parts.append(
        "fin AS (SELECT hosts.host,"
        f" round(coalesce(a.s, 0), 6) AS authority,"
        f" round(coalesce(h.s, 0), 6) AS hub"
        f" FROM hosts LEFT JOIN a{n} a ON hosts.host = a.host"
        f" LEFT JOIN h{n} h ON hosts.host = h.host)"
    )
    return "\n".join(parts) + "\nSELECT * FROM fin ORDER BY host"


def salsa(edges: DataFrame, iterations: int = 6) -> DataFrame:
    """SALSA (Lempel & Moran 2001) over the host graph: ``(host,
    authority, hub)`` from the stochastic hub/authority random walk —
    HITS's two half-steps with DEGREE normalization instead of L1
    (back-propagate ``a(j)/indeg(j)`` to hubs, forward
    ``h(i)/outdeg(i)`` to authorities). Less hub-clique capture than
    HITS (the TKC effect SALSA was built to fix), which is what you
    want when link farms game the directory pages the crawler
    prioritizes. Fixed-iteration, uniform start over authority
    nodes; the chain is mass-preserving, so no per-step normalizer
    scalar is needed.

    Scale shape: indeg/outdeg attach to the deduped edge list ONCE
    (cached); each half-step is one equi-key join + grouped sum
    (map-side combinable) with per-half-step lineage truncation — the
    HITS pattern minus the normalizer collect (the bounded scalar
    here only materializes the checkpoint)."""
    if iterations < 1:
        raise ValueError("salsa: iterations must be >= 1")
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    e, hosts = clean_host_edges(edges)
    if hosts.count() == 0:
        return spark.createDataFrame(
            [], "host string, authority double, hub double"
        )
    ideg = e.groupBy("dst").agg(F.count(F.lit(1)).alias("_id"))
    odeg = e.groupBy("src").agg(F.count(F.lit(1)).alias("_od"))
    ew = e.join(ideg, "dst").join(odeg, "src").cache()
    n_auth = ideg.count()  # bounded scalar; also materializes ew's deps
    a = ideg.select(
        F.col("dst").alias("host"),
        (F.lit(1.0) / F.lit(float(n_auth))).alias("s"),
    )
    h = None

    def _truncate(df: DataFrame) -> DataFrame:
        out = df.localCheckpoint(eager=False)
        out.agg(F.sum("s")).first()  # bounded scalar = materializer
        return out

    for _ in range(iterations):
        h = _truncate(
            ew.join(a, ew["dst"] == a["host"])
            .groupBy(ew["src"].alias("host"))
            .agg(F.sum(F.col("s") / F.col("_id")).alias("s"))
        )
        a = _truncate(
            ew.join(h.withColumnRenamed("host", "_hh"),
                    ew["src"] == F.col("_hh"))
            .groupBy(ew["dst"].alias("host"))
            .agg(F.sum(F.col("s") / F.col("_od")).alias("s"))
        )
    return (
        hosts.join(a.withColumnRenamed("s", "_a"), "host", "left")
        .join(h.withColumnRenamed("s", "_h"), "host", "left")
        .select(
            "host",
            F.round(F.coalesce("_a", F.lit(0.0)), 6).alias("authority"),
            F.round(F.coalesce("_h", F.lit(0.0)), 6).alias("hub"),
        )
    )


def salsa_oracle_sql(raw_edges_sql: str, iterations: int = 6) -> str:
    """DuckDB twin of :func:`salsa`: the degree-normalized walk
    unrolled as MATERIALIZED CTEs (the hits_oracle_sql pattern),
    proving each half-step's join, per-term degree division and
    grouped sum exact at round-6."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "ideg AS MATERIALIZED (SELECT dst, count(*) AS d FROM e"
        " GROUP BY dst),",
        "odeg AS MATERIALIZED (SELECT src, count(*) AS d FROM e"
        " GROUP BY src),",
        "a0 AS MATERIALIZED (SELECT dst AS host,"
        " 1.0 / (SELECT count(*) FROM ideg) AS s FROM ideg),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"h{i} AS MATERIALIZED (SELECT e.src AS host,"
            f" sum(a.s / i2.d) AS s"
            f" FROM e JOIN a{i - 1} a ON e.dst = a.host"
            f" JOIN ideg i2 ON e.dst = i2.dst GROUP BY e.src),",
            f"a{i} AS MATERIALIZED (SELECT e.dst AS host,"
            f" sum(h.s / o.d) AS s"
            f" FROM e JOIN h{i} h ON e.src = h.host"
            f" JOIN odeg o ON e.src = o.src GROUP BY e.dst),",
        ]
    n = iterations
    parts.append(
        "fin AS (SELECT hosts.host,"
        " round(coalesce(a.s, 0), 6) AS authority,"
        " round(coalesce(h.s, 0), 6) AS hub"
        f" FROM hosts LEFT JOIN a{n} a ON hosts.host = a.host"
        f" LEFT JOIN h{n} h ON hosts.host = h.host)"
    )
    return "\n".join(parts) + "\nSELECT * FROM fin ORDER BY host"


def trustrank(
    edges: DataFrame,
    seeds: list,
    damping: float = 0.85,
    iterations: int = 8,
) -> DataFrame:
    """TrustRank (Gyöngyi/Garcia-Molina/Pedersen): PageRank
    personalized on a hand-vetted seed set — trust flows out of the
    seeds along out-links, so link-farm hosts that inflate plain
    PageRank stay near zero unless a trusted host (transitively)
    links to them. ``(host, trust, is_seed)``; dangling mass is
    redistributed to the SEED set (the paper's teleport vector), not
    uniformly like host_pagerank.

    Scale shape mirrors ``host_pagerank``: transition probabilities
    precomputed and cached; each iteration is one equi-key join +
    grouped sum plus a bounded dangling-mass scalar collect (which
    doubles as the previous iteration's checkpoint materializer);
    trust frames stay SPARSE — unreachable hosts never materialize
    rows until the final outer join. The new-trust merge is a
    2-source UNION-then-sum, exact cross-engine because IEEE
    addition is commutative (only associativity breaks, and each
    group has ≤2 rows).
    """
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    if not seeds:
        return spark.createDataFrame(
            [], "host string, trust double, is_seed int"
        )
    e, hosts = clean_host_edges(edges)
    if hosts.count() == 0:
        return spark.createDataFrame(
            [], "host string, trust double, is_seed int"
        )
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    trans = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("p"))
        .cache()
    )
    trans.count()
    srcs = trans.select("src").distinct().cache()

    s0 = 1.0 / len(seeds)
    seed_df = spark.createDataFrame(
        [(s,) for s in sorted(seeds)], "host string"
    ).cache()
    t = seed_df.select("host", F.lit(s0).alias("s"))
    base = 1.0 - damping
    for _ in range(iterations):
        contrib = (
            trans.join(t, trans.src == t.host)
            .groupBy(trans.dst.alias("host"))
            .agg(
                (F.lit(damping) * F.sum(F.col("s") * F.col("p"))).alias(
                    "v"
                )
            )
        )
        dang = (
            t.join(srcs, t.host == srcs.src, "left_anti")
            .agg(F.sum("s"))
            .first()[0]
            or 0.0
        )  # bounded scalar; also materializes the previous iteration
        seed_v = base * s0 + damping * dang * s0
        seed_rows = seed_df.select("host", F.lit(seed_v).alias("v"))
        t = (
            contrib.unionByName(seed_rows)
            .groupBy("host")
            .agg(F.sum("v").alias("s"))
            .localCheckpoint(eager=False)
        )

    is_seed = F.coalesce(
        F.when(F.col("_s").isNotNull(), F.lit(1)), F.lit(0)
    )
    return (
        hosts.join(t.withColumnRenamed("s", "_t"), "host", "left")
        .join(
            seed_df.select("host", F.lit(1).alias("_s")), "host", "left"
        )
        .select(
            "host",
            F.round(F.coalesce("_t", F.lit(0.0)), 6).alias("trust"),
            is_seed.alias("is_seed"),
        )
    )


def trustrank_oracle_sql(
    raw_edges_sql: str,
    seeds: list,
    damping: float = 0.85,
    iterations: int = 8,
) -> str:
    """DuckDB twin of ``trustrank``: the seeded power iteration
    unrolled as MATERIALIZED CTE chains (each t{i} is referenced by
    both the next contrib join and the dangling scalar — without
    materialization the inlined tree doubles per iteration)."""
    s0 = 1.0 / len(seeds)
    seed_vals = ", ".join(f"('{s}')" for s in sorted(seeds))
    d, b = repr(damping), repr(1.0 - damping)
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "od AS MATERIALIZED (SELECT src, count(*) AS od"
        " FROM e GROUP BY src),",
        "trans AS MATERIALIZED (SELECT e.src, e.dst,"
        " 1.0 / od.od AS p FROM e JOIN od ON e.src = od.src),",
        f"seeds AS MATERIALIZED (SELECT * FROM (VALUES {seed_vals})"
        " s(host)),",
        f"t0 AS MATERIALIZED (SELECT host, {repr(s0)} AS s FROM seeds),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"g{i} AS MATERIALIZED (SELECT coalesce(sum(s), 0.0) AS dang"
            f" FROM t{i - 1} WHERE host NOT IN (SELECT src FROM e)),",
            f"c{i} AS MATERIALIZED (SELECT tr.dst AS host,"
            f" {d} * sum(t.s * tr.p) AS v"
            f" FROM trans tr JOIN t{i - 1} t ON tr.src = t.host"
            " GROUP BY tr.dst),",
            f"t{i} AS MATERIALIZED (SELECT host, sum(v) AS s FROM ("
            f"SELECT host, v FROM c{i} UNION ALL"
            f" SELECT host, {b} * {repr(s0)}"
            f" + {d} * (SELECT dang FROM g{i}) * {repr(s0)} AS v"
            " FROM seeds) u GROUP BY host),",
        ]
    n = iterations
    parts.append(
        "fin AS (SELECT hosts.host,"
        " round(coalesce(t.s, 0), 6) AS trust,"
        " CASE WHEN hosts.host IN (SELECT host FROM seeds)"
        " THEN 1 ELSE 0 END AS is_seed"
        f" FROM hosts LEFT JOIN t{n} t ON hosts.host = t.host)"
    )
    return "\n".join(parts) + "\nSELECT * FROM fin ORDER BY host"


def bfs_depths(
    edges: DataFrame,
    seeds: list,
    max_depth: int = 6,
) -> DataFrame:
    """Minimum link distance from the seed set over the DIRECTED host
    graph — the crawl-depth signal the scheduler's priority penalty
    (``host_rank − depth·penalty``) consumes, computed exactly
    instead of accumulated incrementally during the crawl. Fixed
    ``max_depth`` rounds of min-relaxation (a round past the true
    eccentricity is a no-op, so the fixed count is exact whenever
    ``max_depth`` ≥ the seed set's reach); hosts beyond reach (or
    beyond ``max_depth``) report depth −1.

    Scale shape: the frontier frame stays SPARSE (reached hosts
    only); each round is one equi-key join out of the current frame
    plus a min-groupBy (map-side combinable), with lineage truncated
    per round — the host_pagerank iteration pattern with integer
    payloads, so the unrolled oracle matches exactly.

    Returns ``(host, depth, reached)`` over all hosts.
    """
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    if not seeds:
        return spark.createDataFrame(
            [], "host string, depth long, reached int"
        )
    e, hosts = clean_host_edges(edges)
    d = spark.createDataFrame(
        [(s, 0) for s in sorted(seeds)], "host string, depth long"
    )
    # a seed with no incident edge must still report depth 0 — hosts
    # only covers edge endpoints
    hosts = hosts.unionByName(d.select("host")).distinct()
    for _ in range(max_depth):
        step = (
            e.join(d, e.src == d.host)
            .select(
                F.col("dst").alias("host"),
                (F.col("depth") + F.lit(1)).alias("depth"),
            )
        )
        d = (
            d.unionByName(step)
            .groupBy("host")
            .agg(F.min("depth").alias("depth"))
            .localCheckpoint(eager=False)
        )
    return hosts.join(d, "host", "left").select(
        "host",
        F.coalesce(F.col("depth"), F.lit(-1)).cast("long").alias("depth"),
        F.when(F.col("depth").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
        .alias("reached"),
    )


def bfs_depths_oracle_sql(
    raw_edges_sql: str, seeds: list, max_depth: int = 6
) -> str:
    """DuckDB twin of ``bfs_depths``: min-relaxation rounds unrolled
    as MATERIALIZED CTEs (all-integer — exact)."""
    seed_vals = ", ".join(f"('{s}', 0)" for s in sorted(seeds))
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        f"d0 AS MATERIALIZED (SELECT * FROM (VALUES {seed_vals})"
        " s(host, depth)),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e"
        " UNION ALL SELECT host FROM d0)),",
    ]
    for i in range(1, max_depth + 1):
        parts.append(
            f"d{i} AS MATERIALIZED (SELECT host, min(depth) AS depth"
            f" FROM (SELECT host, depth FROM d{i - 1}"
            f" UNION ALL SELECT e.dst, d.depth + 1"
            f" FROM e JOIN d{i - 1} d ON e.src = d.host) u"
            " GROUP BY host),"
        )
    n = max_depth
    parts.append(
        "fin AS (SELECT hosts.host,"
        " CAST(coalesce(d.depth, -1) AS BIGINT) AS depth,"
        " CASE WHEN d.depth IS NOT NULL THEN 1 ELSE 0 END AS reached"
        f" FROM hosts LEFT JOIN d{n} d ON hosts.host = d.host)"
    )
    return "\n".join(parts) + "\nSELECT * FROM fin ORDER BY host"


def opic(edges: DataFrame, iterations: int = 6) -> DataFrame:
    """OPIC — On-line Page Importance Computation (Abiteboul/Preda/
    Cobena, WWW 2003), the classic ADAPTIVE crawl-priority signal:
    unlike offline PageRank it converges while the crawl runs, so the
    frontier can order fetches by accumulated cash history without a
    full-graph batch job. Synchronous batch variant: every host starts
    with cash 1/n; each round it banks its cash into its history and
    distributes it equally along out-edges; dangling cash is recycled
    uniformly (the paper's virtual root page). Total cash stays 1 and
    total history after T rounds is exactly T, so
    ``importance = history / T`` needs no normalizer pass.

    Output: ``(host, cash, history, importance)`` all round-6.

    Scale shape mirrors ``host_pagerank``/``trustrank``: cached
    transition probabilities, one equi-key join + grouped sum per
    round, a bounded dangling scalar collect per round (which also
    materializes the previous iteration), history merged by
    UNION-then-sum over ≤2-row groups (exact: IEEE addition is
    commutative)."""
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    empty = "host string, cash double, history double, importance double"
    e, hosts = clean_host_edges(edges)
    n = hosts.count()  # bounded scalar (host table, not pages)
    if n == 0:
        return spark.createDataFrame([], empty)
    out_deg = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    trans = (
        e.join(out_deg, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("p"))
        .cache()
    )
    trans.count()
    srcs = trans.select("src").distinct().cache()

    c = hosts.select("host", F.lit(1.0 / n).alias("c"))
    h = None
    for _ in range(iterations):
        dang = (
            c.join(srcs, c.host == srcs.src, "left_anti")
            .agg(F.sum("c"))
            .first()[0]
            or 0.0
        )  # bounded scalar; also materializes the previous iteration
        banked = c.select("host", F.col("c").alias("v"))
        h = (
            banked
            if h is None
            else h.select("host", F.col("h").alias("v"))
            .unionByName(banked)
            .groupBy("host")
            .agg(F.sum("v").alias("v"))
        ).withColumnRenamed("v", "h")
        contrib = (
            trans.join(c, trans.src == c.host)
            .groupBy(trans.dst.alias("host"))
            .agg(F.sum(F.col("c") * F.col("p")).alias("v"))
        )
        c = (
            hosts.join(contrib, "host", "left")
            .select(
                "host",
                (F.coalesce("v", F.lit(0.0)) + F.lit(dang / n)).alias("c"),
            )
            .localCheckpoint(eager=False)
        )
    return hosts.join(h, "host", "left").join(c, "host", "left").select(
        "host",
        F.round(F.coalesce("c", F.lit(0.0)), 6).alias("cash"),
        F.round(F.coalesce("h", F.lit(0.0)), 6).alias("history"),
        F.round(
            F.coalesce("h", F.lit(0.0)) / F.lit(float(iterations)), 6
        ).alias("importance"),
    )


def opic_oracle_sql(raw_edges_sql: str, iterations: int = 6) -> str:
    """DuckDB twin of ``opic``: the cash/history recurrence unrolled
    as MATERIALIZED CTEs (c{i}/h{i} are each read twice — without
    materialization the inlined tree doubles per iteration)."""
    parts = [
        f"WITH raw AS MATERIALIZED ({raw_edges_sql}),",
        "e AS MATERIALIZED (SELECT DISTINCT src, dst FROM raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        "hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        " (SELECT src AS host FROM e UNION ALL SELECT dst FROM e)),",
        "nn AS MATERIALIZED (SELECT count(*) AS n FROM hosts),",
        "od AS MATERIALIZED (SELECT src, count(*) AS od"
        " FROM e GROUP BY src),",
        "trans AS MATERIALIZED (SELECT e.src, e.dst,"
        " 1.0 / od.od AS p FROM e JOIN od ON e.src = od.src),",
        "c0 AS MATERIALIZED (SELECT host,"
        " 1.0 / (SELECT n FROM nn) AS c FROM hosts),",
    ]
    for i in range(1, iterations + 1):
        prev = f"c{i - 1}"
        parts += [
            f"g{i} AS MATERIALIZED (SELECT coalesce(sum(c), 0.0) AS dang"
            f" FROM {prev} WHERE host NOT IN (SELECT src FROM e)),",
            (
                f"h{i} AS MATERIALIZED (SELECT host, c AS h FROM c0),"
                if i == 1
                else f"h{i} AS MATERIALIZED (SELECT host, sum(v) AS h"
                f" FROM (SELECT host, h AS v FROM h{i - 1}"
                f" UNION ALL SELECT host, c AS v FROM {prev}) u"
                " GROUP BY host),"
            ),
            f"c{i} AS MATERIALIZED (SELECT hosts.host,"
            f" coalesce(x.v, 0.0)"
            f" + (SELECT dang FROM g{i}) / (SELECT n FROM nn) AS c"
            " FROM hosts LEFT JOIN (SELECT tr.dst AS host,"
            f" sum(t.c * tr.p) AS v FROM trans tr"
            f" JOIN {prev} t ON tr.src = t.host GROUP BY tr.dst) x"
            " ON hosts.host = x.host),",
        ]
    t = iterations
    parts.append(
        "fin AS (SELECT hosts.host,"
        f" round(coalesce(c{t}.c, 0), 6) AS cash,"
        f" round(coalesce(h{t}.h, 0), 6) AS history,"
        f" round(coalesce(h{t}.h, 0) / {repr(float(t))}, 6) AS importance"
        f" FROM hosts LEFT JOIN h{t} ON hosts.host = h{t}.host"
        f" LEFT JOIN c{t} ON hosts.host = c{t}.host)"
    )
    return "\n".join(parts) + "\nSELECT * FROM fin ORDER BY host"


def pagerank_warm(
    edges: DataFrame,
    prev_ranks: DataFrame | None,
    iterations: int = 3,
    damping: float = 0.85,
) -> DataFrame:
    """Warm-start (incremental) PageRank: power iteration over the
    CURRENT edge set initialized from a PREVIOUS snapshot's rank
    vector — the per-crawl-round production shape. A monthly 10^10
    -page graph changes a few percent per round; re-running 12 cold
    iterations each round wastes ~4x the work, while a warm start
    from last round's vector converges in 2-4 rounds (Langville &
    Meyer, "Deep Inside PageRank", §8 — power iteration error decays
    from the INITIAL error, and last round's vector starts ~e-2
    close instead of ~e0).

    Semantics: hygiene via ``clean_host_edges`` (distinct, no self
    loops); init rank = prev rank where the host existed, else 1/n
    (new hosts enter at teleport mass); the init vector is then
    L1-renormalized to exactly 1 (bounded scalar collect) so dropped
    hosts' stale mass doesn't leak; each round is one equi-join +
    grouped sum with uniform dangling-mass redistribution, lineage
    truncated per round — byte-for-byte the ``host_pagerank`` round
    kernel. ``prev_ranks=None`` (or empty) degrades to cold-start
    PageRank on the cleaned graph.

    Output: ``(host, rank round-6)`` over the CURRENT host set.
    Oracle twin: :func:`incremental_pagerank_oracle_sql`.
    """
    from .linkgraph import clean_host_edges

    spark = edges.sparkSession
    e, hosts = clean_host_edges(edges)
    n = hosts.count()
    if n == 0:
        return spark.createDataFrame([], "host string, rank double")
    od = e.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    trans = (
        e.join(od, "src")
        .select("src", "dst", (F.lit(1.0) / F.col("od")).alias("p"))
        .cache()
    )
    trans.count()
    srcs = trans.select("src").distinct().cache()

    if prev_ranks is None:
        prev_ranks = spark.createDataFrame([], "host string, rank double")
    r = hosts.join(
        prev_ranks.select("host", F.col("rank").alias("_pr")), "host", "left"
    ).select(
        "host", F.coalesce(F.col("_pr"), F.lit(1.0 / n)).alias("rank")
    )
    tot = r.agg(F.sum("rank")).first()[0] or 1.0
    r = r.select("host", (F.col("rank") / F.lit(tot)).alias("rank"))

    base = (1.0 - damping) / n
    for _ in range(iterations):
        linked = (
            r.join(srcs, r.host == srcs.src, "left_semi")
            .agg(F.sum("rank"))
            .first()[0]
            or 0.0
        )  # bounded scalar; materializes the previous round
        dang = (1.0 - linked) / n
        contrib = (
            trans.join(r, trans.src == r.host)
            .groupBy("dst")
            .agg(F.sum(F.col("p") * F.col("rank")).alias("in_rank"))
        )
        r = (
            hosts.join(contrib, hosts.host == contrib.dst, "left")
            .select(
                "host",
                (
                    F.lit(base)
                    + F.lit(damping)
                    * (
                        F.coalesce(F.col("in_rank"), F.lit(0.0))
                        + F.lit(dang)
                    )
                ).alias("rank"),
            )
            .localCheckpoint(eager=False)
        )
    return r.select("host", F.round("rank", 6).alias("rank"))


def _warm_phase_sql_parts(
    tag: str,
    raw_edges_sql: str,
    prev_cte: str | None,
    iterations: int,
    damping: float,
) -> tuple:
    """CTE parts for one ``pagerank_warm`` phase with ``tag``-prefixed
    names; returns (parts, final_rank_cte_name). ``prev_cte`` names a
    (host, rank) CTE for the warm init, or None for cold start."""
    d = repr(damping)
    parts = [
        f"{tag}raw AS MATERIALIZED ({raw_edges_sql}),",
        f"{tag}e AS MATERIALIZED (SELECT DISTINCT src, dst FROM {tag}raw"
        " WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),",
        f"{tag}hosts AS MATERIALIZED (SELECT DISTINCT host FROM"
        f" (SELECT src AS host FROM {tag}e"
        f" UNION ALL SELECT dst FROM {tag}e)),",
        f"{tag}n AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n"
        f" FROM {tag}hosts),",
        f"{tag}od AS MATERIALIZED (SELECT src, count(*) AS od"
        f" FROM {tag}e GROUP BY src),",
        f"{tag}trans AS MATERIALIZED (SELECT e.src, e.dst, 1.0 / od.od"
        f" AS p FROM {tag}e e JOIN {tag}od od ON e.src = od.src),",
    ]
    if prev_cte is None:
        init = (
            f"SELECT host, 1.0 / (SELECT n FROM {tag}n) AS rank"
            f" FROM {tag}hosts"
        )
    else:
        init = (
            f"SELECT h.host, coalesce(p.rank,"
            f" 1.0 / (SELECT n FROM {tag}n)) AS rank"
            f" FROM {tag}hosts h LEFT JOIN {prev_cte} p"
            " ON h.host = p.host"
        )
    parts += [
        f"{tag}r0a AS MATERIALIZED ({init}),",
        f"{tag}tot AS MATERIALIZED (SELECT sum(rank) AS t FROM {tag}r0a),",
        f"{tag}r0 AS MATERIALIZED (SELECT host,"
        f" rank / (SELECT t FROM {tag}tot) AS rank FROM {tag}r0a),",
    ]
    for i in range(1, iterations + 1):
        parts += [
            f"{tag}g{i} AS MATERIALIZED (SELECT"
            f" (1.0 - coalesce(sum(rank), 0.0)) / (SELECT n FROM {tag}n)"
            f" AS dang FROM {tag}r{i - 1}"
            f" WHERE host IN (SELECT src FROM {tag}e)),",
            f"{tag}c{i} AS MATERIALIZED (SELECT tr.dst AS host,"
            f" sum(tr.p * r.rank) AS in_rank"
            f" FROM {tag}trans tr JOIN {tag}r{i - 1} r"
            " ON tr.src = r.host GROUP BY tr.dst),",
            f"{tag}r{i} AS MATERIALIZED (SELECT h.host,"
            f" (1.0 - {d}) / (SELECT n FROM {tag}n)"
            f" + {d} * (coalesce(c.in_rank, 0.0)"
            f" + (SELECT dang FROM {tag}g{i})) AS rank"
            f" FROM {tag}hosts h LEFT JOIN {tag}c{i} c"
            " ON h.host = c.host),",
        ]
    return parts, f"{tag}r{iterations}"


def incremental_pagerank_oracle_sql(
    old_edges_sql: str,
    new_edges_sql: str,
    it_old: int,
    it_warm: int,
    damping: float = 0.85,
) -> str:
    """DuckDB twin of the two-phase incremental flow: cold PageRank
    on the OLD edge snapshot, then :func:`pagerank_warm` on the NEW
    snapshot initialized from phase 1 — both unrolled as MATERIALIZED
    CTE chains. Output matches the q193 query: (host, prev_rank NULL
    for new hosts, rank, moved = |delta| round-6)."""
    p1, r_old = _warm_phase_sql_parts(
        "o_", old_edges_sql, None, it_old, damping
    )
    p2, r_new = _warm_phase_sql_parts(
        "w_", new_edges_sql, f"{r_old}fin", it_warm, damping
    )
    parts = (
        ["WITH " + p1[0]]
        + p1[1:]
        + [
            f"{r_old}fin AS MATERIALIZED (SELECT host,"
            f" round(rank, 6) AS rank FROM {r_old}),"
        ]
        + p2
    )
    body = "\n".join(parts).rstrip(",")
    return f"""
        {body}
        SELECT h.host,
               p.rank AS prev_rank,
               round(r.rank, 6) AS rank,
               round(abs(round(r.rank, 6)
                     - coalesce(p.rank, 0.0)), 6) AS moved
        FROM w_hosts h
        LEFT JOIN {r_old}fin p ON h.host = p.host
        JOIN {r_new} r ON h.host = r.host
        ORDER BY h.host
    """
