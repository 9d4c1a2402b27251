"""TextRank keyword extraction (Mihalcea & Tarau, 2004).

Per-document PageRank over the word adjacency graph: words that sit
next to many well-connected words are keywords. The training-data use
is per-doc topical tagging at corpus scale (feeding mixture buckets,
dedup explanations, search facets) without any model artifact.

Everything is keyed by (doc_id, word), so the "per-document graph" is
just a grouped relational computation — NO per-doc collect, NO
applyInPandas: millions of tiny graphs iterate simultaneously inside
four corpus-wide join+agg rounds. Adjacency pairs come from one
array-local zip (no positional self-join), degrees and contributions
are map-side-combinable hash aggs, and the per-round frames stay
(doc, word)-sized.

Determinism contract: scores are compared and ranked at round-6 (ties
broken by word ascending) — the same convention the RRF/MMR rankers
use, so cross-engine ulp noise cannot flip a rank.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def textrank_keywords(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    damping: float = 0.85,
    iterations: int = 4,
    top_k: int = 3,
) -> DataFrame:
    """Top-``top_k`` TextRank keywords per document.

    Graph: distinct lowercased whitespace tokens as nodes; undirected
    edges between ADJACENT tokens (window 2), weighted by adjacency
    count; self-adjacency (``x x``) ignored. Iteration:
    ``r(v) = (1-d)/n + d * sum_u wt(u,v)/deg(u) * r(u)`` from the
    uniform start, ``iterations`` synchronous rounds. Output:
    ``(doc_id, rank, word, score)``, score round-6, rank by
    (round-6 score desc, word asc).
    """
    from .text import words_col

    toks = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            words_col(F.col(text_col)).alias("t"),
        )
        .where(F.size("t") > 0)
        .cache()  # read by the edge build AND the node table
    )
    # both edge directions from ONE explode pass (a unionAll of two
    # adj projections would tokenize + zip the corpus twice)
    und = (
        toks.where(F.size("t") > 1)
        .select(
            "doc_id",
            F.explode(
                F.flatten(
                    F.zip_with(
                        F.slice("t", 1, F.size("t") - 1),
                        F.slice("t", 2, F.size("t") - 1),
                        lambda a, b: F.array(
                            F.struct(a.alias("src"), b.alias("dst")),
                            F.struct(b.alias("src"), a.alias("dst")),
                        ),
                    )
                )
            ).alias("p"),
        )
        .where(F.col("p.src") != F.col("p.dst"))
        .select("doc_id", F.col("p.src").alias("src"), F.col("p.dst").alias("dst"))
    )
    edges = und.groupBy("doc_id", "src", "dst").agg(
        F.count(F.lit(1)).cast("double").alias("wt")
    )
    deg = edges.groupBy("doc_id", "src").agg(F.sum("wt").alias("deg"))
    trans = edges.join(deg, ["doc_id", "src"]).select(
        "doc_id", "src", "dst", (F.col("wt") / F.col("deg")).alias("p")
    ).cache()
    trans.count()

    nodes = (
        toks.select("doc_id", F.explode("t").alias("w"))
        .distinct()
        .withColumn(
            "n", F.count(F.lit(1)).over(Window.partitionBy("doc_id"))
        )
        .cache()
    )
    d, base = damping, 1.0 - damping
    r = nodes.select("doc_id", "w", (F.lit(1.0) / F.col("n")).alias("r"))
    for i in range(iterations):
        tr, rr = trans.alias("tr"), r.alias("rr")
        contrib = (
            tr.join(
                rr,
                (F.col("tr.doc_id") == F.col("rr.doc_id"))
                & (F.col("tr.src") == F.col("rr.w")),
            )
            .groupBy(
                F.col("tr.doc_id").alias("doc_id"),
                F.col("tr.dst").alias("w"),
            )
            .agg(F.sum(F.col("rr.r") * F.col("tr.p")).alias("v"))
        )
        r = (
            nodes.join(contrib, ["doc_id", "w"], "left")
            .select(
                "doc_id",
                "w",
                (
                    F.lit(base) / F.col("n")
                    + F.lit(d) * F.coalesce("v", F.lit(0.0))
                ).alias("r"),
            )
            .localCheckpoint(eager=False)
        )
    win = Window.partitionBy("doc_id").orderBy(
        F.round("r", 6).desc(), F.col("w").asc()
    )
    return (
        r.withColumn("rank", F.row_number().over(win))
        .where(F.col("rank") <= top_k)
        .select(
            "doc_id",
            F.col("rank").cast("int").alias("rank"),
            F.col("w").alias("word"),
            F.round("r", 6).alias("score"),
        )
    )


def textrank_oracle_sql(
    docs_sql: str,
    damping: float = 0.85,
    iterations: int = 4,
    top_k: int = 3,
) -> str:
    """DuckDB twin of :func:`textrank_keywords`. ``docs_sql`` must
    select ``(doc_id, text)``. The rounds unroll as MATERIALIZED CTEs
    keyed by (doc_id, w)."""
    d, base = repr(damping), repr(1.0 - damping)
    parts = [
        f"WITH src AS MATERIALIZED ({docs_sql}),",
        "tok AS MATERIALIZED (SELECT doc_id,"
        " list_filter(regexp_split_to_array(lower(text), '\\s+'),"
        " x -> x <> '') AS t FROM src WHERE len(list_filter("
        "regexp_split_to_array(lower(text), '\\s+'), x -> x <> '')) > 0),",
        "adj AS MATERIALIZED (SELECT doc_id, p.a AS a, p.b AS b FROM ("
        "SELECT doc_id, unnest(list_transform(range(1, len(t)),"
        " i -> {'a': t[CAST(i AS INT)], 'b': t[CAST(i + 1 AS INT)]}))"
        " AS p FROM tok WHERE len(t) > 1) WHERE p.a <> p.b),",
        "edges AS MATERIALIZED (SELECT doc_id, src, dst,"
        " CAST(count(*) AS DOUBLE) AS wt FROM ("
        "SELECT doc_id, a AS src, b AS dst FROM adj UNION ALL"
        " SELECT doc_id, b, a FROM adj) GROUP BY doc_id, src, dst),",
        "deg AS MATERIALIZED (SELECT doc_id, src, sum(wt) AS deg"
        " FROM edges GROUP BY doc_id, src),",
        "trans AS MATERIALIZED (SELECT e.doc_id, e.src, e.dst,"
        " e.wt / d.deg AS p FROM edges e"
        " JOIN deg d ON e.doc_id = d.doc_id AND e.src = d.src),",
        "nodes AS MATERIALIZED (SELECT doc_id, w,"
        " count(*) OVER (PARTITION BY doc_id) AS n FROM ("
        "SELECT DISTINCT doc_id, unnest(t) AS w FROM tok)),",
        "r0 AS MATERIALIZED (SELECT doc_id, w, 1.0 / n AS r FROM nodes),",
    ]
    for i in range(1, iterations + 1):
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT t.doc_id, t.dst AS w,"
            f" sum(r.r * t.p) AS v FROM trans t JOIN r{i - 1} r"
            " ON t.doc_id = r.doc_id AND t.src = r.w"
            " GROUP BY t.doc_id, t.dst),"
        )
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT nodes.doc_id, nodes.w,"
            f" {base} / nodes.n + {d} * coalesce(c.v, 0.0) AS r"
            f" FROM nodes LEFT JOIN c{i} c"
            " ON nodes.doc_id = c.doc_id AND nodes.w = c.w),"
        )
    t = iterations
    parts.append(
        "ranked AS (SELECT doc_id, w, r, row_number() OVER ("
        "PARTITION BY doc_id ORDER BY round(r, 6) DESC, w ASC) AS rk"
        f" FROM r{t})"
    )
    return "\n".join(parts) + (
        "\nSELECT doc_id, CAST(rk AS INT) AS rank, w AS word,"
        f" round(r, 6) AS score FROM ranked WHERE rk <= {top_k}"
        " ORDER BY doc_id, rank"
    )
