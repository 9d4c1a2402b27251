"""Host-level quality rollup and whole-host filtering.

Web-scale curation pipelines (RefinedWeb / Penedo et al. 2023 §3.1,
CCNet's per-domain statistics) make keep/drop decisions at the HOST
level, not just per page: a host whose pages are overwhelmingly
low-quality (template farms, crawl traps, machine-generated spam)
is dropped wholesale, while low-evidence hosts (too few pages to
judge) pass through. This module provides the per-page signal
projection, the host rollup with a caller-supplied "bad page"
predicate, and the broadcast host filter.

Scale shape (100 TB):
- :func:`page_quality_signals` is ONE whole-stage-codegen projection
  (Gopher metrics + language-ID are split/filter/aggregate HOFs and
  regexp counts) — no UDFs, no shuffle;
- :func:`host_quality_rollup` is two equi-key hash aggregations on
  the host key with map-side partial aggregation — a host with 10^8
  pages is one reduce group, never a hot partition — plus a
  hosts×langs-sized window for the majority language (partitioned by
  host, fully parallel) and a hosts-sized join; the result is
  hosts-sized and broadcastable;
- :func:`filter_by_host_quality` is a broadcast LEFT SEMI join — the
  page corpus never shuffles to be filtered.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import gopher_quality_flags, lang_id


def page_quality_signals(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-page signal frame ``(id, host, n_words, gopher metrics,
    passes_gopher, lang)`` — the standard input shape for
    :func:`host_quality_rollup`. One codegen projection, no shuffle."""
    flags = gopher_quality_flags(
        df, text_col, id_col, keep_cols=(host_col, text_col)
    )
    return flags.withColumn("lang", lang_id(F.col(text_col))).drop(text_col)


def host_quality_rollup(
    pages: DataFrame,
    host_col: str = "host",
    bad: Optional[Column] = None,
    min_pages: int = 3,
    max_bad_share: float = 0.5,
) -> DataFrame:
    """Aggregate per-page signals to one row per host and decide
    ``host_keep``.

    ``bad`` is the caller's bad-page predicate evaluated over the
    ``pages`` columns (default: the full Gopher conjunction fails —
    ``~passes_gopher``; real pipelines substitute their own, e.g.
    perplexity-tail membership or a length floor). A host is kept when
    it has too few pages to judge (``n_pages < min_pages``) or its bad
    share is within ``max_bad_share`` — low-evidence hosts must pass
    through, RefinedWeb's convention, so a brand-new host is never
    starved by one bad page.

    Output: ``(host, n_pages, n_bad, bad_share, mean_words,
    majority_lang, majority_lang_share, host_keep)`` — hosts-sized,
    broadcastable. Ratios are exact small-integer divisions, so they
    reproduce bit-for-bit in ANSI SQL (oracle q64). Majority-language
    ties break to the lexicographically smallest code."""
    if bad is None:
        bad = ~F.col("passes_gopher")
    per = pages.groupBy(host_col).agg(
        F.count("*").cast("long").alias("n_pages"),
        F.sum(F.when(bad, 1).otherwise(0)).cast("long").alias("n_bad"),
        F.avg("n_words").alias("mean_words"),
    )
    lc = pages.groupBy(host_col, "lang").agg(F.count("*").alias("lang_n"))
    w = Window.partitionBy(host_col).orderBy(
        F.col("lang_n").desc(), F.col("lang").asc()
    )
    maj = (
        lc.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            host_col,
            F.col("lang").alias("majority_lang"),
            F.col("lang_n").alias("maj_n"),
        )
    )
    bad_share = F.col("n_bad") / F.col("n_pages")
    return per.join(maj, host_col).select(
        host_col,
        "n_pages",
        "n_bad",
        bad_share.alias("bad_share"),
        "mean_words",
        "majority_lang",
        (F.col("maj_n") / F.col("n_pages")).alias("majority_lang_share"),
        (
            (F.col("n_pages") < min_pages) | (bad_share <= max_bad_share)
        ).alias("host_keep"),
    )


def filter_by_host_quality(
    df: DataFrame, rollup: DataFrame, host_col: str = "host"
) -> DataFrame:
    """Keep only pages on kept hosts: broadcast LEFT SEMI join — the
    corpus side never shuffles."""
    kept = rollup.where(F.col("host_keep")).select(host_col)
    return df.join(F.broadcast(kept), host_col, "left_semi")


def gini_coefficient(
    df: DataFrame,
    value_col: str,
    id_col: str,
    group_cols=(),
) -> DataFrame:
    """Exact Gini coefficient of a non-negative mass column — the
    crawl-equity / concentration audit (is one host eating the fetch
    budget? is one source 90% of the token mass?), the scalar the
    Zipf profile (q82) summarizes as a curve.

    All-integer numerator/denominator: with values sorted ASCENDING
    (id tie-break → deterministic permutation) and 1-based position
    ``i``, ``G = (2·Σ i·xᵢ − (n+1)·Σx) / (n·Σx)`` — integer products,
    one final IEEE division, identical in any engine. The mass column
    is TRUNCATED to integer (``cast long``) and the sort ranks the
    SAME truncated value — that is the exactness contract; pre-scale
    fractional weights (e.g. ×10⁶ like the quantized-grid operators)
    rather than passing doubles, or the truncation silently reshapes
    the distribution. One per-group
    sort window + one agg. Zero-mass or empty groups report NULL via
    try_divide. Σ i·x bounds the range: n·max(x)·n < 2^63 (rank-bucket
    first past ~10⁹ rows·mass).

    Output: ``(*group_cols, n, total, gini)``.
    """
    g = list(group_cols)
    # rank the SAME truncated value the sums use — sorting the raw
    # column while summing the cast one would disagree on fractional
    # input instead of failing consistently
    xl = F.col(value_col).cast("long")
    w = Window.partitionBy(*g).orderBy(xl, F.col(id_col))
    ranked = df.where(F.col(value_col).isNotNull()).select(
        *g,
        xl.alias("x"),
        F.row_number().over(w).cast("long").alias("i"),
    )
    agg = ranked.groupBy(*g).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("x").cast("long").alias("total"),
        F.sum(F.col("i") * F.col("x")).cast("long").alias("iw"),
    )
    return agg.select(
        *g,
        "n",
        "total",
        F.round(
            F.try_divide(
                (
                    2 * F.col("iw")
                    - (F.col("n") + 1) * F.col("total")
                ).cast("double"),
                (F.col("n") * F.col("total")).cast("double"),
            ),
            6,
        ).alias("gini"),
    )


def ucb_scores(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    c: float = 2.0,
) -> DataFrame:
    """UCB1 arm scores (Auer et al. 2002) for adaptive crawl-budget
    allocation: each host is a bandit arm, each fetched page a pull,
    ``reward_col`` a 0/1 keep signal (page survived the quality
    gates). The next round's budget goes to the hosts ranked by
    ``ucb = mean_reward + sqrt(c·ln(N)/n)`` — exploit hosts that
    yield keepers, but keep exploring under-sampled hosts (the
    second term). This is the principled version of the static
    host-rank prior the frontier uses: rank from observed yield,
    with optimism bounds instead of a frozen score.

    Returns one row per arm: ``(arm, n, wins, mean_reward, ucb)``
    sorted by (ucb desc, arm) — feed the top rows (or q139's Hamilton
    apportionment over ``ucb``) into the next round's per-host
    budgets.

    Engine-portable exactness: ``ln(N)`` is micro-unit quantized to a
    BIGINT (the q152 log convention — the ONE transcendental), after
    which every step is correctly-rounded IEEE double arithmetic on
    identical values — ``wins/n``, ``c·lnq/(1e6·n)``, ``sqrt``, one
    addition — so the round-6 scores are bit-reproducible across
    engines, partitionings and reruns (a crawl controller whose
    budget flaps between identical runs is undebuggable).

    Scale shape: ONE map-side-combined hash aggregation on the arm
    key + a 1-row broadcast crossJoin for N; arms-sized output. No
    windows, no UDFs."""
    per = df.groupBy(F.col(arm_col).alias("arm")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col(reward_col).cast("long")).alias("wins"),
    )
    total = per.agg(F.sum("n").cast("long").alias("_N"))
    lnq = F.floor(
        F.log(F.col("_N").cast("double")) * F.lit(1e6) + F.lit(0.5)
    ).cast("long")
    scored = (
        per.crossJoin(F.broadcast(total))
        .withColumn("_lnq", lnq)
        .withColumn(
            "mean_reward",
            F.round(
                F.col("wins").cast("double") / F.col("n").cast("double"), 6
            ),
        )
        .withColumn(
            "ucb",
            F.round(
                F.col("wins").cast("double") / F.col("n").cast("double")
                + F.sqrt(
                    F.lit(float(c))
                    * F.col("_lnq").cast("double")
                    / (F.lit(1e6) * F.col("n").cast("double"))
                ),
                6,
            ),
        )
    )
    return scored.select(
        "arm", "n", "wins", "mean_reward", "ucb"
    ).orderBy(F.desc("ucb"), F.col("arm"))


def ucb_rank_table(
    df: DataFrame,
    arm_col: str,
    reward_col: str,
    c: float = 2.0,
) -> DataFrame:
    """:func:`ucb_scores` reshaped to the frontier's host-rank
    contract (``scheduler/policy.py``: ``(host, rank)`` with rank in
    [0, 1], missing host → 0): max-normalized UCB, the adaptive
    replacement for the static PageRank prior — feed the previous
    rounds' (host, kept) fetch log here and pass the result as
    ``host_rank`` to the next ``run_crawl`` round. Round-6 like
    ``host_rank_table``."""
    scores = ucb_scores(df, arm_col, reward_col, c)
    mx = scores.agg(F.max("ucb")).first()[0]  # arms-sized input,
    # bounded scalar (same shape as host_rank_table's normalizer)
    if not mx:
        return scores.select(F.col("arm").alias("host"),
                             F.lit(0.0).alias("rank"))
    return scores.select(
        F.col("arm").alias("host"),
        F.round(F.col("ucb") / F.lit(float(mx)), 6).alias("rank"),
    )


def eb_shrunken_rates(
    df: DataFrame,
    group_col: str,
    flag_col: str,
) -> DataFrame:
    """Empirical-Bayes (beta-binomial, method-of-moments) shrinkage
    of per-group binary rates — the fix for the classic hosting-rate
    fallacy: a 2-page host with 2 quality passes is NOT a better host
    than a 10k-page host at 92%, yet raw rates say so, and every
    rate-ranked decision (crawl budgets, filter policies, q64's
    rollup) inherits the noise. Shrinkage pulls each host toward the
    corpus prior with strength inversely proportional to evidence:

        m = mean of raw group rates,  v = their variance
        K = m(1-m)/v - 1              (prior pseudo-count; clamp >= 0,
                                       and v = 0 -> K = 0: identical
                                       rates need no shrinking)
        shrunk_g = (y_g + K*m) / (n_g + K)

    (Efron & Morris 1975's baseball estimator in beta-binomial form.)

    Scale shape: one hash-agg to (group, n, y); the prior (m, v, K)
    is a 1-row aggregate over the GROUP table (hosts-sized, not
    corpus-sized) broadcast back — no collect; the shrink itself is
    a codegen projection. Output per group:
    ``(group, n_rows, n_pos, raw_rate, k_strength, prior_mean,
    shrunk_rate)`` — rates round-6.
    """
    g = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col(flag_col).cast("long")).alias("y"),
        )
        .withColumn("rate", F.col("y") / F.col("n"))
    )
    prior = g.agg(
        F.avg("rate").alias("m"),
        F.var_pop("rate").alias("v"),
    ).select(
        "m",
        F.when(
            (F.col("v") > 0)
            & (F.col("m") * (1 - F.col("m")) / F.col("v") - 1 > 0),
            F.col("m") * (1 - F.col("m")) / F.col("v") - 1,
        )
        .otherwise(F.lit(0.0))
        .alias("k"),
    )
    return (
        g.crossJoin(F.broadcast(prior))
        .select(
            F.col("grp").alias(group_col),
            F.col("n").alias("n_rows"),
            F.col("y").alias("n_pos"),
            F.round("rate", 6).alias("raw_rate"),
            F.round("k", 6).alias("k_strength"),
            F.round("m", 6).alias("prior_mean"),
            F.round(
                (F.col("y") + F.col("k") * F.col("m"))
                / (F.col("n") + F.col("k")),
                6,
            ).alias("shrunk_rate"),
        )
    )
