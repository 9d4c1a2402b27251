"""Crawl-snapshot deltas: what changed between two crawls.

An incremental crawler needs, per re-crawl, the set of NEW urls (seen
now, not before), GONE urls (seen before, missing now), CHANGED pages
(same url, different content fingerprint) and UNCHANGED pages — and,
rolled up per host, a change *rate* that drives the revisit scheduler
(``operators/urls.py``-style freshness tiers; q48's sitemap-based
schedule is the other input). This extends the engine's versioned
catalog (``sources/catalog.py`` keeps every crawl round addressable)
with the cross-snapshot comparison a 100 TB refresh pipeline runs
between crawls.

Scale shape: ONE full-outer equi-key join on url — both sides are
corpus-sized, so the shuffle is unavoidable and correct; when both
snapshots live in the bucketed catalog layout (bucketed by url,
``sources/catalog.py::write_bucketed``) the join plans shuffle-free,
the same property the membership joins already exploit. The per-host
rollup is a second equi-key hash agg whose output is hosts-sized
(bounded, broadcastable into the scheduler).

Fingerprints reuse ``operators/text.py::fingerprint`` (md5 of
whitespace-normalized lowercase text) so "changed" means content
change, not markup/whitespace noise.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from .text import fingerprint


from .urls import host_of as _host  # shared definition keeps host keys joinable


def crawl_delta(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    fp_col: Optional[str] = None,
) -> DataFrame:
    """Per-url delta between two crawl snapshots.

    Returns ``(url, host, status, old_fp, new_fp)`` with ``status`` in
    ``new | gone | changed | unchanged``. If ``fp_col`` is given the
    snapshots already carry a fingerprint column (the catalog stores
    one); otherwise it is computed from ``text_col`` on both sides
    with the engine's canonical ``fingerprint``.

    Duplicate urls within a snapshot are collapsed to one row first
    (min fingerprint — deterministic) so the outer join cannot
    fan out; a crawl snapshot is logically keyed by url anyway.
    """
    def one(df: DataFrame, out: str) -> DataFrame:
        fp = F.col(fp_col) if fp_col else fingerprint(F.col(text_col))
        return (
            df.select(F.col(url_col).alias("url"), fp.alias(out))
            .groupBy("url")
            .agg(F.min(out).alias(out))
        )

    o = one(old_pages, "old_fp")
    n = one(new_pages, "new_fp")
    joined = o.join(n, "url", "full_outer")
    status = (
        F.when(F.col("old_fp").isNull(), F.lit("new"))
        .when(F.col("new_fp").isNull(), F.lit("gone"))
        .when(F.col("old_fp") == F.col("new_fp"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return joined.select(
        "url", _host(F.col("url")).alias("host"), status.alias("status"),
        "old_fp", "new_fp",
    )


def host_change_rates(delta: DataFrame) -> DataFrame:
    """Per-host rollup of a ``crawl_delta`` frame.

    ``(host, n_new, n_gone, n_changed, n_unchanged, change_rate)``
    where ``change_rate = changed / (changed + unchanged)`` — the
    fraction of *revisited* pages that actually changed, which is the
    number a revisit scheduler converts into a crawl interval
    (high-churn hosts get short intervals). NULL when the host had no
    revisited pages this round (all new/gone) — ``try_divide`` keeps
    ANSI mode from throwing.

    One hash agg, hosts-sized output.
    """
    c = lambda s: F.sum(F.when(F.col("status") == s, 1).otherwise(0))  # noqa: E731
    agg = delta.groupBy("host").agg(
        c("new").alias("n_new"),
        c("gone").alias("n_gone"),
        c("changed").alias("n_changed"),
        c("unchanged").alias("n_unchanged"),
    )
    return agg.withColumn(
        "change_rate",
        F.round(
            F.try_divide(
                F.col("n_changed"), F.col("n_changed") + F.col("n_unchanged")
            ),
            6,
        ),
    )


def revisit_priority(
    change_rates: DataFrame,
    host_ranks: DataFrame,
    w_change: float = 0.6,
    w_rank: float = 0.4,
    default_change: float = 0.5,
    max_interval_days: int = 30,
) -> DataFrame:
    """Convert per-host churn + importance into a re-crawl schedule.

    ``priority = w_change * change_rate + w_rank * rank_score`` —
    hosts that change often and matter most get re-crawled first.
    A host with no revisited pages yet (NULL ``change_rate`` from
    :func:`host_change_rates`) gets ``default_change`` (unknown churn
    is treated as moderate, not zero, so brand-new hosts are not
    starved); a host missing from ``host_ranks`` scores rank 0.
    ``interval_days = max(1, round(max_interval_days * (1 -
    priority)))`` is the scheduler-facing output.

    Both inputs are hosts-sized, so this is a broadcastable dimension
    join — the one part of the revisit loop that is NOT corpus-scale.
    """
    pr = F.round(
        F.lit(w_change)
        * F.coalesce(F.col("change_rate"), F.lit(default_change))
        + F.lit(w_rank) * F.coalesce(F.col("rank_score"), F.lit(0.0)),
        6,
    )
    return (
        change_rates.join(F.broadcast(host_ranks), "host", "left")
        .withColumn("priority", pr)
        .withColumn(
            "interval_days",
            F.greatest(
                F.lit(1),
                F.round(
                    F.lit(float(max_interval_days))
                    * (F.lit(1.0) - F.col("priority")),
                    0,
                ).cast("long"),
            ).cast("long"),
        )
        .select("host", "priority", "interval_days")
    )


def url_change_similarity(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    text_col: str = "text",
    k: int = 3,
    minor_threshold: float = 0.7,
    rewrite_threshold: float = 0.2,
) -> DataFrame:
    """HOW MUCH a revisited page changed — the granularity
    :func:`crawl_delta`'s binary changed/unchanged fingerprint lacks
    and the revisit scheduler wants (a page that rewrites wholesale
    each visit deserves a shorter interval than one that touches a
    timestamp).

    Per url present in BOTH snapshots: shingle Jaccard between old and
    new text plus a class — ``identical`` (1.0), ``minor``
    (>= minor_threshold), ``major`` (>= rewrite_threshold),
    ``rewritten`` (below), ``empty`` (either side too short to
    shingle; similarity is 0.0 one-sided, NULL when both are).
    Thresholds cut on the UNrounded exact rational (engine-portable).

    Scale shape: ONE url-keyed equi-join (shuffle-free from the
    bucketed catalog layout, exactly like ``crawl_delta``), then the
    intersection is computed ROW-LOCALLY with ``array_intersect`` on
    the two shingle sets — the pairing is given by the url, so no
    posting-list machinery, no second shuffle, no UDF.
    """
    from .dedup import shingles

    o = old_pages.select(
        F.col(url_col).alias("url"),
        shingles(F.col(text_col), k).alias("sh_old"),
    )
    n = new_pages.select(
        F.col(url_col).alias("url"),
        shingles(F.col(text_col), k).alias("sh_new"),
    )
    j = o.join(n, "url")
    inter = F.size(F.array_intersect("sh_old", "sh_new"))
    union = F.size("sh_old") + F.size("sh_new") - inter
    sim = F.try_divide(inter, union)
    return j.select(
        "url",
        F.size("sh_old").alias("n_sh_old"),
        F.size("sh_new").alias("n_sh_new"),
        sim.alias("similarity"),
        F.when(
            (F.size("sh_old") == 0) | (F.size("sh_new") == 0), F.lit("empty")
        )
        .when(inter == union, F.lit("identical"))
        .when(sim >= F.lit(minor_threshold), F.lit("minor"))
        .when(sim >= F.lit(rewrite_threshold), F.lit("major"))
        .otherwise(F.lit("rewritten"))
        .alias("change_class"),
    )


def unigram_js_divergence(
    old: DataFrame,
    new: DataFrame,
    group_col: str = "host",
    text_col: str = "text",
) -> DataFrame:
    """Per-group Jensen-Shannon divergence (in BITS, log2) between the
    unigram word distributions of two crawl snapshots — the
    distribution-shift detector a refresh pipeline runs per host:
    fingerprint deltas (``crawl_delta``) see per-PAGE edits, JS drift
    sees per-HOST template/content turnover even when every url
    changed "a little". JS is symmetric and bounded in [0, 1] bit, so
    thresholds transfer across hosts of different sizes.

    Output: ``(group, js_bits, vocab_old, vocab_new, vocab_common)``.

    Scale shape: each side is one explode + two hash aggs keyed by
    (group, word) — map-side combinable; the sides meet in ONE
    full-outer equi-key join on (group, word); per-group totals join
    back broadcast-free on the group key (hosts-sized frame). No UDF,
    no collect; term math is written op-for-op the way the DuckDB
    oracle repeats it (p·log2(2p/(p+q)) with zero-terms dropped).
    """
    from .text import words_col

    def side(df: DataFrame, tag: str) -> DataFrame:
        w = df.select(
            F.col(group_col).alias("g"),
            F.explode(words_col(F.col(text_col))).alias("w"),
        )
        cnt = w.groupBy("g", "w").agg(F.count(F.lit(1)).alias("c"))
        tot = cnt.groupBy("g").agg(F.sum("c").alias("t"))
        return cnt.join(tot, "g").select(
            "g", "w", (F.col("c") / F.col("t")).alias(f"p_{tag}")
        )

    po, pn = side(old, "old"), side(new, "new")
    j = po.join(pn, ["g", "w"], "full_outer").select(
        "g",
        "w",
        F.coalesce("p_old", F.lit(0.0)).alias("p"),
        F.coalesce("p_new", F.lit(0.0)).alias("q"),
    )
    term = lambda x, y: F.when(  # noqa: E731
        F.col(x) > 0,
        F.col(x) * F.log2(F.lit(2.0) * F.col(x) / (F.col("p") + F.col("q"))),
    ).otherwise(F.lit(0.0))
    return (
        j.groupBy(F.col("g").alias(group_col))
        .agg(
            F.round(
                F.lit(0.5) * F.sum(term("p", "q") + term("q", "p")), 6
            ).alias("js_bits"),
            F.sum(F.when(F.col("p") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_old"),
            F.sum(F.when(F.col("q") > 0, 1).otherwise(0))
            .cast("long")
            .alias("vocab_new"),
            F.sum(
                F.when((F.col("p") > 0) & (F.col("q") > 0), 1).otherwise(0)
            )
            .cast("long")
            .alias("vocab_common"),
        )
    )


def ema_weights(alpha: float, n_steps: int) -> list:
    """Closed-form weights of the recursive EMA ``e_t = alpha*v_t +
    (1-alpha)*e_{t-1}`` seeded with ``e_1 = v_1``, as ONE float list
    (1-indexed steps): ``w_i = alpha*(1-alpha)^(n-i)`` for i>1 and
    ``(1-alpha)^(n-1)`` for i=1. Computed once in Python and injected
    as LITERALS into both engines — cross-engine pow() rounding can
    never diverge a weight (the 1-lam exactness lesson: prefer alphas
    like 0.25 whose complement is a dyadic rational)."""
    decay = 1.0 - alpha
    ws = []
    for i in range(1, n_steps + 1):
        w = alpha if i > 1 else 1.0
        for _ in range(n_steps - i):
            w *= decay
        ws.append(w)
    return ws


def ema_over_steps(
    df: DataFrame,
    group_col: str,
    step_col: str,
    value_col: str,
    alpha: float = 0.25,
    n_steps: int = 3,
) -> DataFrame:
    """Per-group exponential moving average over a FIXED step ladder
    (steps 1..n_steps, one value per step) — the smoothing a revisit
    scheduler applies to per-snapshot change rates so one noisy crawl
    round doesn't whiplash the schedule. The recursion collapses to a
    literal-weighted sum, so the plan is a single map-side-combinable
    hash agg (no window, no order sensitivity: IEEE addition per
    ≤n_steps-row group is commutative only up to order, but the SAME
    ascending-step kernel is used in the oracle and group sizes are
    tiny). Output: ``(group, ema, last_value)`` round-6.
    """
    ws = ema_weights(alpha, n_steps)
    w = F.lit(None).cast("double")
    for i, wi in enumerate(ws, start=1):
        w = F.when(F.col(step_col) == i, F.lit(wi)).otherwise(w)
    return (
        df.withColumn("_w", w)
        .groupBy(F.col(group_col))
        .agg(
            F.round(F.sum(F.col(value_col) * F.col("_w")), 6).alias("ema"),
            F.round(
                F.max(
                    F.when(F.col(step_col) == n_steps, F.col(value_col))
                ),
                6,
            ).alias("last_value"),
        )
    )


def ks_statistic(
    old: DataFrame,
    new: DataFrame,
    value_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic per group — the
    score-drift alarm between two crawls / two pipeline versions:
    D = sup_x |F_old(x) - F_new(x)| over the empirical CDFs. Everything
    stays INTEGER: with counts cum_o, cum_n at each distinct value and
    totals n, m, the sup is max|cum_o·m - cum_n·n| / (n·m) — an exact
    rational, immune to float sum order, emitted as
    ``(ks_num, ks_den)`` plus the round-6 quotient.

    Scale shape: per-side (group, value) hash aggs, one full-outer
    equi-key join, then per-group ORDERED windows over the
    DISTINCT-VALUE frame (already aggregated — corpus-sized only if
    every score is unique; grid-bucket the score first at 100 TB,
    which a KS on continuous scores needs anyway). The cross-products
    cum·total are computed in decimal(38,0): two 10^10-row samples
    would overflow BIGINT (ANSI throws), and bucketing can't help —
    it shrinks the value grid, not the totals.

    Output: ``(group, n_old, n_new, ks_num, ks_den, ks)``; ks_num /
    ks_den are decimal(38,0) so the rational survives sample sizes a
    long can't; ks is NULL (never a crash) for a group present in
    only one sample (n·m = 0 — e.g. a source that disappeared
    between crawls, which is exactly a drift alarm worth reporting).
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return (
            df.select(
                F.col(group_col).alias("g"),
                F.col(value_col).cast("double").alias("v"),
            )
            .where(F.col("v").isNotNull())
            .groupBy("g", "v")
            .agg(F.count(F.lit(1)).alias(f"c_{tag}"))
        )

    j = side(old, "o").join(side(new, "n"), ["g", "v"], "full_outer").select(
        "g",
        "v",
        F.coalesce("c_o", F.lit(0)).alias("c_o"),
        F.coalesce("c_n", F.lit(0)).alias("c_n"),
    )
    wg = Window.partitionBy("g")
    w = wg.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    c = (
        j.withColumn("cum_o", F.sum("c_o").over(w))
        .withColumn("cum_n", F.sum("c_n").over(w))
        .withColumn("n", F.sum("c_o").over(wg))
        .withColumn("m", F.sum("c_n").over(wg))
    )
    dec = "decimal(38,0)"
    return (
        c.withColumn(
            "d",
            F.abs(
                F.col("cum_o").cast(dec) * F.col("m").cast(dec)
                - F.col("cum_n").cast(dec) * F.col("n").cast(dec)
            ),
        )
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.max("n").cast("long").alias("n_old"),
            F.max("m").cast("long").alias("n_new"),
            F.max("d").alias("ks_num"),
            (F.max("n").cast(dec) * F.max("m").cast(dec)).alias("ks_den"),
            F.round(
                F.try_divide(
                    F.max("d").cast("double"),
                    (F.max("n").cast(dec) * F.max("m").cast(dec)).cast(
                        "double"
                    ),
                ),
                6,
            ).alias("ks"),
        )
    )


def keep_rate_chi2(
    old: DataFrame,
    new: DataFrame,
    flag_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Did a gate's keep-rate actually CHANGE between two pipeline
    versions, or is the delta sampling noise? The 2×2 contingency
    chi-square per group — the curation-ops significance check next
    to the KS (numeric drift, q127) and JS (distribution drift, q119)
    alarms.

    Exactness: for the table [[a,b],[c,d]] (old keep/drop, new
    keep/drop), ``χ² = N·(ad − bc)² / ((a+b)(c+d)(a+c)(b+d))`` — the
    entire statistic is ONE rational of integer counts, carried in
    decimal(38,0) and divided once. Range: worst case N·(ad−bc)² ≈
    2n⁵ (a total keep↔drop rate flip), so decimal(38,0) holds to
    ~3·10⁷ rows PER SIDE per group — SAMPLE beyond that (a rate test
    needs nowhere near 10⁷ rows; past ~10⁵ everything reads
    "significant" anyway). Degenerate margins (a zero row or column — e.g. a
    gate that kept everything in both versions) report NULL via
    try_divide, never a crash. χ² ≥ 3.841 is the 95% line for 1 dof
    — emitted as a boolean so the caller needs no table.

    Output: ``(group, n_old, n_new, keep_old, keep_new, chi2,
    significant_95)``.
    """
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(F.col(group_col).alias("g")).agg(
            F.sum(F.col(flag_col).cast("int"))
            .cast("long")
            .alias(f"k_{tag}"),
            F.sum((~F.col(flag_col)).cast("int"))
            .cast("long")
            .alias(f"d_{tag}"),
        )

    j = side(old, "o").join(side(new, "n"), "g", "full_outer").select(
        "g",
        *[
            F.coalesce(c, F.lit(0)).alias(c)
            for c in ("k_o", "d_o", "k_n", "d_n")
        ],
    )
    dec = "decimal(38,0)"
    a = F.col("k_o").cast(dec)
    b = F.col("d_o").cast(dec)
    c = F.col("k_n").cast(dec)
    d = F.col("d_n").cast(dec)
    det = a * d - b * c
    num = ((a + b + c + d) * det * det).cast("double")
    den = ((a + b) * (c + d) * (a + c) * (b + d)).cast("double")
    chi2 = F.round(F.try_divide(num, den), 6)
    return j.select(
        F.col("g").alias(group_col),
        (F.col("k_o") + F.col("d_o")).alias("n_old"),
        (F.col("k_n") + F.col("d_n")).alias("n_new"),
        F.col("k_o").alias("keep_old"),
        F.col("k_n").alias("keep_new"),
        chi2.alias("chi2"),
        (chi2 >= 3.841).alias("significant_95"),
    )


def capture_recapture(
    s1: DataFrame,
    s2: DataFrame,
    key_col: str = "url",
    group_col: str = "source",
) -> DataFrame:
    """How big is the URL space we have NOT crawled? Capture-recapture
    over two overlapping crawl samples (Lincoln-Petersen with the
    Chapman correction): if crawl 1 saw n₁ urls, crawl 2 saw n₂, and
    m appeared in both, the frontier behind them is
    ``N̂ = (n₁+1)(n₂+1)/(m+1) − 1`` — the standard coverage estimator
    a recrawl planner reads before promising completeness. Chapman
    (the +1s) keeps the estimate finite and near-unbiased even at
    m = 0, where raw Lincoln-Petersen n₁n₂/m blows up (emitted too,
    NULL at m = 0 via try_divide).

    Exactness: counts are distinct-key integers; both estimators are
    ONE division of exact integer products ((n₁+1)(n₂+1) < 2^63 up to
    ~3·10⁹ urls per side — decimal-cast beyond). Per group: two
    distinct aggs + one distinct-key equi-join — no window, no
    collect.

    Output: ``(group, n1, n2, overlap, chapman, lincoln)``, round-6.
    """
    def keys(df: DataFrame) -> DataFrame:
        return df.select(
            F.col(group_col).alias("g"), F.col(key_col).alias("k")
        ).distinct()

    a, b = keys(s1), keys(s2)
    n1 = a.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n1"))
    n2 = b.groupBy("g").agg(F.count(F.lit(1)).cast("long").alias("n2"))
    m = (
        a.join(b, ["g", "k"])
        .groupBy("g")
        .agg(F.count(F.lit(1)).cast("long").alias("m"))
    )
    j = (
        n1.join(n2, "g", "full_outer")
        .join(m, "g", "left")
        .select(
            "g",
            F.coalesce("n1", F.lit(0)).alias("n1"),
            F.coalesce("n2", F.lit(0)).alias("n2"),
            F.coalesce("m", F.lit(0)).alias("m"),
        )
    )
    chapman = (
        ((F.col("n1") + 1) * (F.col("n2") + 1)).cast("double")
        / (F.col("m") + 1).cast("double")
        - F.lit(1.0)
    )
    lincoln = F.try_divide(
        (F.col("n1") * F.col("n2")).cast("double"),
        F.col("m").cast("double"),
    )
    return j.select(
        F.col("g").alias(group_col),
        "n1",
        "n2",
        F.col("m").alias("overlap"),
        F.round(chapman, 6).alias("chapman"),
        F.round(lincoln, 6).alias("lincoln"),
    )


def psi_drift(
    old: DataFrame,
    new: DataFrame,
    bin_col: str,
    group_col: str = "source",
) -> DataFrame:
    """Per-group Population Stability Index between two snapshots —
    the model-monitoring drift metric (banking scorecards, and the
    right alarm for a quality-classifier's score distribution sliding
    between crawl rounds): ``psi = Σ_bins (p_i − q_i)·ln(p_i/q_i)``
    over a caller-binned column (pass literal-edge bins so both
    engines bucket identical bits). Rule-of-thumb thresholds: <0.1
    stable, 0.1-0.25 drifting, >0.25 shifted.

    Zero-count bins are Laplace-smoothed: ``p_i = (c_i+1)/(N+B)``
    with ``B`` the number of distinct bins observed in EITHER side
    (per group) — deterministic, no epsilon knob, and the smoothed
    distributions still sum to 1. Output ``(group, psi, n_bins,
    n_old, n_new)``.

    Scale shape: two hash aggs keyed by (group, bin) meeting in ONE
    full-outer equi-key join, group-sized totals joined back on the
    group key — the ``unigram_js_divergence`` shape exactly; term
    math mirrors the oracle op-for-op, round-6 at the end."""
    def side(df: DataFrame, tag: str) -> DataFrame:
        return df.groupBy(
            F.col(group_col).alias("g"), F.col(bin_col).alias("b")
        ).agg(F.count(F.lit(1)).cast("long").alias(f"c_{tag}"))

    j = side(old, "o").join(side(new, "n"), ["g", "b"], "full_outer").select(
        "g",
        "b",
        F.coalesce("c_o", F.lit(0)).alias("co"),
        F.coalesce("c_n", F.lit(0)).alias("cn"),
    )
    tot = j.groupBy("g").agg(
        F.sum("co").alias("to"),
        F.sum("cn").alias("tn"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = (F.col("co") + F.lit(1)).cast("double") / (
        F.col("to") + F.col("nb")
    ).cast("double")
    q = (F.col("cn") + F.lit(1)).cast("double") / (
        F.col("tn") + F.col("nb")
    ).cast("double")
    return (
        j.join(tot, "g")
        .groupBy(F.col("g").alias(group_col))
        .agg(
            F.round(F.sum((p - q) * F.log(p / q)), 6).alias("psi"),
            F.first("nb").cast("long").alias("n_bins"),
            F.first("to").cast("long").alias("n_old"),
            F.first("tn").cast("long").alias("n_new"),
        )
    )


def revalidation_audit(
    old_pages: DataFrame,
    new_pages: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    bytes_col: str = "bytes",
    etag_col: str = "etag",
) -> DataFrame:
    """Per-url audit of what VALIDATOR-based refetching (If-None-Match
    / If-Modified-Since, RFC 9111 revalidation) would have done on
    this crawl round — the bandwidth planner for an incremental crawl:
    at 10^10 urls/round the dominant cost is body bytes, and the share
    of unchanged pages served as 304s is the single biggest lever.

    ``old_pages``: previous-round state ``(url, fp, bytes, etag)``
    (``etag`` NULL = origin sent no validator). ``new_pages``: this
    round's fetches ``(url, fp, bytes)``. One row per url with
    ``outcome``:

    - ``revalidated_304``  — validator present, fingerprint unchanged:
      the fetch could have been a 304; ``bytes_saved`` = this round's
      body size.
    - ``changed_200``      — validator present but content changed:
      full transfer was necessary.
    - ``wasted_refetch``   — NO validator and content unchanged: bytes
      burned that a validator would have saved (``bytes_wasted``).
    - ``unvalidated_200``  — no validator, content changed.
    - ``new`` / ``gone``   — frontier delta (no old / no new row).

    Same scale shape as :func:`crawl_delta`: ONE url-keyed full-outer
    equi-join (shuffle-free when both rounds live in the bucketed
    catalog layout) + a projection; duplicates collapse deterministically
    first (min fp / max bytes / max etag) so the join cannot fan out.
    """
    def one(df: DataFrame, with_etag: bool) -> DataFrame:
        aggs = [
            F.min(fp_col).alias("f"),
            F.max(F.col(bytes_col).cast("long")).alias("b"),
        ]
        if with_etag:
            aggs.append(F.max(etag_col).alias("e"))
        return df.groupBy(F.col(url_col).alias("url")).agg(*aggs)

    o = one(old_pages, with_etag=True).select(
        "url",
        F.col("f").alias("old_fp"),
        F.col("b").alias("old_bytes"),
        F.col("e").alias("old_etag"),
    )
    n = one(new_pages, with_etag=False).select(
        "url",
        F.col("f").alias("new_fp"),
        F.col("b").alias("new_bytes"),
    )
    j = o.join(n, "url", "full_outer")
    has_old = F.col("old_fp").isNotNull()
    has_new = F.col("new_fp").isNotNull()
    unchanged = F.col("old_fp") == F.col("new_fp")
    validated = F.col("old_etag").isNotNull()
    outcome = (
        F.when(~has_old, "new")
        .when(~has_new, "gone")
        .when(validated & unchanged, "revalidated_304")
        .when(validated, "changed_200")
        .when(unchanged, "wasted_refetch")
        .otherwise("unvalidated_200")
    )
    nb = F.coalesce(F.col("new_bytes"), F.lit(0))
    return j.select(
        "url",
        outcome.alias("outcome"),
        F.when(has_old & has_new & validated & unchanged, nb)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_saved"),
        F.when(
            has_old & has_new & ~validated & unchanged, nb
        )
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_wasted"),
        nb.cast("long").alias("new_bytes"),
    )


def revalidation_rollup(
    audit: DataFrame,
    host_col=None,
) -> DataFrame:
    """Host rollup of :func:`revalidation_audit`: request counts per
    outcome, bytes saved/wasted, and the 304 hit-rate over refetches
    in exact integer micro-units (``n_304·10^6 DIV n_refetched``).
    ``host_col`` defaults to the engine's canonical host-of-url."""
    h = host_col if host_col is not None else _host(F.col("url"))
    g = audit.groupBy(h.alias("host")).agg(
        F.count(F.lit(1)).alias("n_urls"),
        F.sum((F.col("outcome") == "revalidated_304").cast("long")).alias(
            "n_304"
        ),
        F.sum((F.col("outcome") == "wasted_refetch").cast("long")).alias(
            "n_wasted"
        ),
        F.sum(
            F.col("outcome").isin(
                "revalidated_304",
                "changed_200",
                "wasted_refetch",
                "unvalidated_200",
            ).cast("long")
        ).alias("n_refetched"),
        F.sum("bytes_saved").alias("bytes_saved"),
        F.sum("bytes_wasted").alias("bytes_wasted"),
    )
    rate = F.expr(
        "CASE WHEN n_refetched > 0 THEN (n_304 * CAST(1000000 AS"
        " BIGINT)) DIV n_refetched ELSE CAST(0 AS BIGINT) END"
    )
    return g.withColumn("hit_rate_micro", rate)
