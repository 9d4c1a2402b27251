"""Evaluation operators — the feilian SWDE-style scoring layer
(SURVEY.md §2.5/2.6/2.9) as DataFrame ops.

- ``f1_by_group``: TP/FP/FN + precision/recall/F1 from exploded
  predicted-vs-truth value sets
  (``/root/reference/feilian/agents/fragments_agent.py:151-222``):
  TP = values in both sets, FP = predicted only, FN = truth only —
  a full-outer join on (key, value), i.e. the semi/anti-join pair.
- ``best_per_group``: top-1 by (f1 desc, n_extracted desc)
  (``fragments_agent.py:224-229``).
- ``scheme_report``: bidirectional key-set diff
  (``/root/reference/langscrape/json.py:21-56``).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import DataFrame, Window, functions as F


def f1_by_group(
    predicted: DataFrame,
    truth: DataFrame,
    key_cols: Sequence[str],
    value_col: str = "value",
) -> DataFrame:
    """Inputs: one row per (keys..., value) on each side (already
    exploded, distinct). Output per key group: tp, fp, fn, precision,
    recall, f1 (0.0 where undefined, matching the reference's guard)."""
    p = predicted.select(*key_cols, value_col).distinct().withColumn("p", F.lit(1))
    t = truth.select(*key_cols, value_col).distinct().withColumn("t", F.lit(1))
    joined = p.join(t, [*key_cols, value_col], "full_outer")
    agg = joined.groupBy(*key_cols).agg(
        F.sum(F.when(F.col("p").isNotNull() & F.col("t").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("p").isNotNull() & F.col("t").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("p").isNull() & F.col("t").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
    precision = F.when(F.col("tp") + F.col("fp") > 0,
                       F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    recall = F.when(F.col("tp") + F.col("fn") > 0,
                    F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    agg = agg.withColumn("precision", F.round(precision, 6)).withColumn(
        "recall", F.round(recall, 6)
    )
    f1 = F.when(
        F.col("precision") + F.col("recall") > 0,
        2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
    ).otherwise(F.lit(0.0))
    return agg.withColumn("f1", F.round(f1, 6))


def best_per_group(
    scored: DataFrame,
    group_cols: Sequence[str],
    f1_col: str = "f1",
    tiebreak_cols: Sequence[str] = (),
) -> DataFrame:
    """Top-1 per group by (f1 desc, tiebreaks desc) — the reference's
    ``sort_values(...).groupby(...).first()``."""
    order = [F.desc(f1_col)] + [F.desc(c) for c in tiebreak_cols]
    w = Window.partitionBy(*group_cols).orderBy(*order)
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def select_best_xpath(
    scored: DataFrame,
    group_cols: Sequence[str] = ("field_name",),
    xpath_col: str = "xpath",
    try_order_col: str = "try_order",
    invalid_col: str = "invalid",
    all_nonempty_col: str = "all_nonempty",
    total_extracted_col: str = "total_extracted",
) -> DataFrame:
    """The reference's xpath-selection cascade
    (``feilian/agents/agent.py:150-177``) as one ranked window.

    Input: one row per tried xpath per group with
    ``try_order`` (proposal order), ``invalid`` (any snippet reported
    an invalid-xpath feedback), ``all_nonempty`` (every snippet
    extracted something), ``total_extracted`` (sum of extracted value
    counts). Cascade: prefer valid xpaths that extracted on every
    snippet, taking the one with the FEWEST total extractions (the
    reference's precision heuristic); else the first valid by proposal
    order; else the first proposed. A single priority column encodes
    all three tiers, so the whole cascade is one window — ties inside
    tier 0 fall back to proposal order, matching the reference's
    stable sort."""
    priority = (
        F.when(F.col(invalid_col), F.lit(2))
        .when(F.col(all_nonempty_col), F.lit(0))
        .otherwise(F.lit(1))
    )
    tier_key = F.when(
        priority == 0, F.col(total_extracted_col)
    ).otherwise(F.col(try_order_col))
    w = Window.partitionBy(*group_cols).orderBy(
        priority.asc(), tier_key.asc(), F.col(try_order_col).asc()
    )
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def scheme_report(
    df: DataFrame, keys_col: str, expected_keys: Sequence[str]
) -> DataFrame:
    """Bidirectional key-set validation: adds ``missing_keys``,
    ``surplus_keys``, ``is_valid_scheme``."""
    expected = F.array(*[F.lit(k) for k in sorted(expected_keys)])
    got = F.array_sort(F.col(keys_col))
    return (
        df.withColumn("missing_keys", F.array_except(expected, got))
        .withColumn("surplus_keys", F.array_except(got, expected))
        .withColumn(
            "is_valid_scheme",
            (F.size("missing_keys") == 0) & (F.size("surplus_keys") == 0),
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    order_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Exact binary nDCG@k of a ranking against a relevance table —
    the standard retrieval-quality verdict on the engine's own BM25 /
    QL / fused rankers (their per-query scores are oracled; this
    scores the RANKING).

    DCG = Σ relᵢ / log2(i+1) over the top k by (order desc, id asc);
    IDCG = the same weights over min(k, R) ideal hits, with R = total
    relevant docs in the relevance table. EVERY weight — 1/log2(i+1)
    and the cumulative ideal sums — is a Python-computed literal
    (identical bits in both engines; no engine log evaluated at all),
    so nDCG is one division of two fixed-literal dot products.
    Missing ids in the relevance table count rel 0; duplicate
    relevance rows for one id are collapsed to their max rel BEFORE
    the join (a raw left join would fan top-k rows out and
    double-count R). R = 0 reports NULL via try_divide.

    Scale shape: the k cut is an ``orderBy(...).limit(k)`` — Spark
    plans it as TakeOrderedAndProject (per-partition top-k, merged on
    the driver) — so an arbitrarily large ``ranked`` input never
    funnels through a single-partition window; only the ≤k survivors
    see the row_number. Caveat: the cut ranks on the ROUND-6 score
    (repo convention for order-bearing comparisons — equal-true-score
    docs must fall to the id tie-break identically in both engines);
    if the caller's upstream top-N was cut on the UNROUNDED score and
    a round-6 tie straddles its boundary, the two cuts can pick
    different survivors — feed rankings produced under the same
    rounding convention.

    Output (one row): ``(k, n_ranked, n_relevant, dcg, idcg, ndcg)``.
    """
    import math

    from pyspark.sql import Window

    w = [1.0 / math.log2(i + 1) for i in range(1, k + 1)]
    cum = []
    t = 0.0
    for x in w:
        t += x
        cum.append(t)
    rel1, topk = _collapsed_rel_and_top(
        ranked, relevance, k, id_col, order_col, rel_col
    )
    order = [F.desc("_s6"), F.asc(id_col)]
    top = (
        topk
        .withColumn("_rn", F.row_number().over(Window.orderBy(*order)))
        # no broadcast hint: the relevance table is corpus-sized in
        # real use (q153 derives it from every document) — shuffling
        # the ≤k-row left side is trivial, force-collecting the right
        # side to the driver is not; let Catalyst/AQE pick
        .join(rel1, id_col, "left")
        .select("_rn", F.coalesce("_rel", F.lit(0)).alias("_rel"))
    )
    wmap = F.element_at(
        F.create_map(
            *[x for i, v in enumerate(w) for x in (F.lit(i + 1), F.lit(v))]
        ),
        F.col("_rn"),
    )
    r_total = rel1.agg(F.sum("_rel").cast("long").alias("_r"))
    cum_arr = F.array(*[F.lit(v) for v in cum])
    agg = top.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum(F.col("_rel") * wmap).alias("dcg"),
    )
    return (
        agg.crossJoin(F.broadcast(r_total))
        .select(
            F.lit(k).cast("int").alias("k"),
            "n_ranked",
            F.col("_r").alias("n_relevant"),
            F.round(F.coalesce("dcg", F.lit(0.0)), 6).alias("dcg"),
            F.when(
                F.col("_r") > 0,
                F.element_at(
                    cum_arr, F.least(F.col("_r"), F.lit(k)).cast("int")
                ),
            ).alias("_idcg"),
        )
        .select(
            "k",
            "n_ranked",
            "n_relevant",
            "dcg",
            F.round(F.coalesce("_idcg", F.lit(0.0)), 6).alias("idcg"),
            F.round(F.try_divide(F.col("dcg"), F.col("_idcg")), 6).alias(
                "ndcg"
            ),
        )
    )


def _collapsed_rel_and_top(
    ranked, relevance, k, id_col, order_col, rel_col
):
    """Shared scaffold of the ranking metrics (nDCG, AP): collapse
    duplicate relevance rows to max BEFORE any join (a raw left join
    would fan top-k rows out), and cut the top k on the ROUND-6
    score with id tie-break via orderBy+limit (TakeOrderedAndProject
    — never a global window). ONE definition so a rounding- or
    tie-break-convention change cannot drift between metrics."""
    rel1 = (
        relevance.select(
            F.col(id_col), F.col(rel_col).cast("int").alias("_rel")
        )
        .groupBy(id_col)
        .agg(F.max("_rel").alias("_rel"))
    )
    top = (
        ranked.select(
            F.col(id_col), F.round(F.col(order_col), 6).alias("_s6")
        )
        .orderBy(F.desc("_s6"), F.asc(id_col))
        .limit(k)
    )
    return rel1, top


def average_precision_at_k(
    ranked: DataFrame,
    relevance: DataFrame,
    k: int = 10,
    id_col: str = "doc_id",
    order_col: str = "score",
    rel_col: str = "rel",
) -> DataFrame:
    """Exact binary Average Precision@k — the area-under-PR verdict
    that complements :func:`ndcg_at_k` (nDCG rewards graded position,
    AP rewards precision at every recall point; TREC's primary
    metric).

    AP@k = (1/min(R, k)) Σ_{i<=k, rel_i=1} P@i with
    P@i = (#relevant in top i)/i — every term an exact integer
    rational until the final round-6 division (hits_i / i summed as
    DOUBLE over <=k literal-free terms; <=k additions of exact
    binary fractions, same expression order both engines).

    Same contracts as ndcg_at_k: the k cut is orderBy+limit
    (TakeOrderedAndProject — never a global window over the corpus),
    ranking on the ROUND-6 score with id tie-break, duplicate
    relevance rows collapse to max BEFORE the join, R = 0 reports
    NULL via try_divide.

    Output (one row): ``(k, n_ranked, n_relevant, n_hits, ap)``.
    """
    from pyspark.sql import Window

    rel1, top = _collapsed_rel_and_top(
        ranked, relevance, k, id_col, order_col, rel_col
    )
    w = Window.orderBy(F.desc("_s6"), F.asc(id_col))
    joined = top.join(rel1, id_col, "left").select(
        id_col,
        "_s6",
        F.coalesce((F.col("_rel") > 0).cast("int"), F.lit(0)).alias("_r"),
    )
    # rank + running hit count over the <=k-row frame (bounded window)
    scored = joined.select(
        "_r",
        F.row_number().over(w).alias("_i"),
        F.sum("_r").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).alias("_hits"),
    )
    tot_rel = rel1.agg(
        F.sum((F.col("_rel") > 0).cast("long")).alias("n_relevant")
    )
    agg = scored.agg(
        F.count(F.lit(1)).cast("long").alias("n_ranked"),
        F.sum("_r").cast("long").alias("n_hits"),
        F.sum(
            F.when(
                F.col("_r") == 1, F.col("_hits") / F.col("_i")
            ).otherwise(F.lit(0.0))
        ).alias("_ap_num"),
    )
    return agg.crossJoin(F.broadcast(tot_rel)).select(
        F.lit(k).alias("k"),
        "n_ranked",
        F.coalesce("n_relevant", F.lit(0)).alias("n_relevant"),
        "n_hits",
        F.round(
            F.try_divide(
                F.col("_ap_num"),
                F.least(F.coalesce("n_relevant", F.lit(0)), F.lit(k)).cast(
                    "double"
                ),
            ),
            6,
        ).alias("ap"),
    )
