"""Burst / anomaly detection over event streams (CUSUM).

A crawl-ops pipeline watches per-host and per-type event rates: a
sudden burst of new urls, fetch errors, or robots denials is the
signal to throttle, re-prioritize, or alert. The standard detector is
CUSUM (Page, 1954): ``s_t = max(0, s_{t-1} + (x_t - mu - slack))``
accumulates only above-baseline excess and alarms when it crosses a
threshold — one-sided, memoryless below baseline, and it detects
sustained small shifts that a per-bucket z-score misses.

The recurrence looks sequential, but the classic prefix identity makes
it a WINDOW computation: with ``d_t = x_t - mu - slack`` and prefix
sums ``P_t``, ``s_t = P_t - min(0, min_{j<=t} P_j)``. Both the cumsum
and the running min are per-group window functions — fully parallel
across groups, no UDF, no fold, and a DuckDB oracle can repeat them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def cusum_bursts(
    df: DataFrame,
    group_col: str,
    ts_col: str = "ts",
    buckets: int = 16,
    slack_frac: float = 0.25,
    threshold_frac: float = 2.0,
) -> DataFrame:
    """Per-group CUSUM over equal-width time buckets.

    Bucketizes ``ts_col`` into ``buckets`` equal-width cells over the
    GLOBAL observed time range (1-row aggregate broadcast back — no
    collect), densifies each group's series with zero-count cells (a
    skipped bucket is evidence, not a gap), and computes
    ``cusum_t = P_t - min(0, min_{j<=t} P_j)`` with
    ``d_t = n_t - mu - slack_frac*mu`` and per-group baseline
    ``mu = total/buckets``. Alarms where ``cusum > threshold_frac*mu``.

    Output: ``(group, bucket, n_events, cusum, alarm)``; ``cusum``
    round-6, ``alarm`` 0/1.
    """
    m = buckets
    d = df.select(
        F.col(group_col).alias("g"),
        F.unix_micros(F.col(ts_col).cast("timestamp"))
        .cast("double")
        .alias("x"),
    ).where(F.col("x").isNotNull() & F.col("g").isNotNull())
    rng = d.agg(F.min("x").alias("lo"), F.max("x").alias("hi"))
    binned = d.crossJoin(F.broadcast(rng)).select(
        "g",
        F.least(
            F.greatest(
                F.coalesce(
                    F.floor(
                        F.try_divide(
                            (F.col("x") - F.col("lo")) * F.lit(float(m)),
                            F.col("hi") - F.col("lo"),
                        )
                    ),
                    F.lit(0),
                ).cast("long"),
                F.lit(0),
            ),
            F.lit(m - 1),
        ).alias("b"),
    )
    cnt = binned.groupBy("g", "b").agg(F.count(F.lit(1)).alias("n"))
    grid = (
        cnt.select("g")
        .distinct()
        .crossJoin(
            df.sparkSession.range(m).select(F.col("id").alias("b"))
        )
    )
    dense = grid.join(cnt, ["g", "b"], "left").select(
        "g", "b", F.coalesce("n", F.lit(0)).cast("long").alias("n")
    )
    mu = F.sum("n").over(Window.partitionBy("g")) / F.lit(float(m))
    dcol = F.col("n") - F.col("mu") - F.lit(slack_frac) * F.col("mu")
    w = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = (
        dense.withColumn("mu", mu)
        .withColumn("p", F.sum(dcol).over(w))
        .withColumn("s", F.col("p") - F.least(F.min("p").over(w), F.lit(0.0)))
    )
    return out.select(
        F.col("g").alias(group_col),
        F.col("b").alias("bucket"),
        F.col("n").alias("n_events"),
        F.round("s", 6).alias("cusum"),
        F.when(F.col("s") > F.lit(threshold_frac) * F.col("mu"), 1)
        .otherwise(0)
        .alias("alarm"),
    )


def benford_audit(
    df: DataFrame,
    value_col: str,
    group_cols=("source",),
) -> DataFrame:
    """First-significant-digit (Benford) conformity audit — the
    classic fabricated-numbers detector, pointed at crawl data:
    machine-generated listings, spun content and SEO spam carry
    numeric fields whose leading digits do NOT follow the log
    distribution organic magnitudes do.

    Operates on POSITIVE INTEGRAL values (lengths, counts, prices in
    cents): the leading digit comes from the integer's decimal string
    — exact and engine-portable, where a double's formatting is not
    (filter + cast enforce the contract; non-positive rows drop).
    Per group and digit 1-9 (densified — an absent digit is evidence,
    not a missing row): count, observed share, Benford expectation
    log10(1+1/d) as a Python-computed literal (identical bits in both
    engines), absolute deviation; plus the group MAD (mean absolute
    deviation, the standard conformity score — >0.015 is the usual
    nonconformity line) repeated per row for one-frame consumption.

    One count agg + a 9-row-per-group densify join — digits are a
    broadcast dimension.

    Output: ``(*group_cols, digit, n, share, expected, dev, mad)``.
    """
    import math

    g = list(group_cols)
    spark = df.sparkSession
    base = df.where(
        F.col(value_col).isNotNull()
        & (F.col(value_col) > 0)
        # integrality enforced in DATA, not just docs: a fractional
        # value would long-cast to a truncated (or digit-0) row and
        # silently bias the shares — drop it instead
        & (F.col(value_col) == F.floor(F.col(value_col)))
    ).select(
        *g,
        F.substring(F.col(value_col).cast("long").cast("string"), 1, 1)
        .cast("int")
        .alias("digit"),
    )
    counts = base.groupBy(*g, "digit").agg(
        F.count(F.lit(1)).alias("c")
    )
    digits = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit")
    )
    groups = base.select(*g).distinct()
    dense = (
        groups.crossJoin(F.broadcast(digits))
        .join(counts, g + ["digit"], "left")
        .select(*g, "digit", F.coalesce("c", F.lit(0)).alias("n"))
    )
    exp_map = F.element_at(
        F.create_map(
            *[
                x
                for d in range(1, 10)
                for x in (F.lit(d), F.lit(math.log10(1 + 1 / d)))
            ]
        ),
        F.col("digit"),
    )
    tot = Window.partitionBy(*g)
    scored = dense.withColumn(
        "share",
        F.round(
            F.try_divide(
                F.col("n").cast("double"),
                F.sum("n").over(tot).cast("double"),
            ),
            6,
        ),
    ).withColumn("expected", F.round(exp_map, 6)).withColumn(
        "dev", F.round(F.abs(F.col("share") - F.round(exp_map, 6)), 6)
    )
    return scored.withColumn(
        "mad", F.round(F.avg("dev").over(tot), 6)
    ).select(*g, "digit", "n", "share", "expected", "dev", "mad")


def burstiness(
    df: DataFrame,
    ts_col: str = "ts",
    group_col: str = "host",
    id_col: str = "event_id",
) -> DataFrame:
    """Goh–Barabási burstiness of per-entity inter-arrival times:
    ``B = (σ − μ)/(σ + μ)`` over the gaps — −1 is a metronome
    (perfectly periodic), 0 is Poisson, →1 is bursty. The adaptive-
    politeness signal CUSUM (q121) alarms on and this scores: a
    bursty host needs headroom, a periodic one doesn't.

    Exactness: gaps are integer MICROSECONDS (the q103/q135
    convention — one lag window on (ts, id)); the moments n, Σg, Σg²
    are exact integers in decimal(38,0) (Σg² at µs scale overflows
    BIGINT beyond ~day-long gaps × millions of events), and σ uses
    the SAMPLE variance identity (nΣg² − (Σg)²)/(n(n−1)) — so B is a
    fixed tree of two exact-integer casts, one sqrt and one division,
    identical in both engines at round-6. Entities with < 2 gaps (< 3
    events) report NULL (no variance to speak of); σ = μ = 0 (all
    gaps zero) reports NULL via try_divide, not 0/0.

    Output: ``(group, n_gaps, mean_gap_us, b)``.
    """
    base = df.where(F.col(ts_col).isNotNull()).select(
        F.col(group_col).alias("g"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("g").orderBy("_us", "_id")
    gaps = base.withColumn(
        "gap", F.col("_us") - F.lag("_us").over(w)
    ).where(F.col("gap").isNotNull())
    dec = "decimal(38,0)"
    agg = gaps.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum(F.col("gap").cast(dec)).alias("s1"),
        F.sum(F.col("gap").cast(dec) * F.col("gap").cast(dec)).alias(
            "s2"
        ),
    )
    n = F.col("n").cast(dec)
    var = F.try_divide(
        (n * F.col("s2") - F.col("s1") * F.col("s1")).cast("double"),
        (n * (n - 1)).cast("double"),
    )
    mu = F.try_divide(
        F.col("s1").cast("double"), F.col("n").cast("double")
    )
    sig = F.sqrt(var)
    return agg.select(
        F.col("g").alias(group_col),
        F.col("n").alias("n_gaps"),
        F.round(mu, 6).alias("mean_gap_us"),
        F.round(F.try_divide(sig - mu, sig + mu), 6).alias("b"),
    )


def soft404_templates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "host",
    max_chars: int = 400,
    min_cluster: int = 3,
) -> DataFrame:
    """Soft-404 / error-template detection — the crawl-ops screen for
    hosts that answer HTTP 200 with the same short "not found" /
    "access denied" / parked-domain body under many distinct URLs.
    Those pages poison dedup statistics, waste refresh budget, and (at
    training time) inject thousands of copies of boilerplate, so
    production crawlers (Bar-Yossef et al. 2004, "Sic transit gloria
    telae") fingerprint-cluster per host and drop the cluster.

    A cluster here is a per-host group of documents with the SAME
    64-bit SimHash fingerprint (:func:`..dedup.simhash64_fast`,
    hamming-0 — the scalable core; a radius-r variant composes
    :func:`..dedup.simhash_near_dups` with the connected-components
    resolver instead of this equality groupBy). Flagged iff it spans
    ``>= min_cluster`` distinct documents AND the mean body length is
    ``<= max_chars`` — error templates are short; a long identical
    body is syndication, which is the dedup pipeline's business, not
    this screen's.

    Shape at 100 TB: the fingerprint is one Arrow-batched projection
    pass; the groupBy is an equi-key hash agg with map-side combine,
    shuffling at most one row per (host, fingerprint) group; the
    distinct-id count uses Spark's expand-based partial distinct (ids
    are unique per row in normal use, so the expansion is a no-op
    guard against re-crawled rows). No windows, no joins, no driver
    state.

    Output: ``(host, simhash, n_pages, example_id, avg_chars)``, one
    row per flagged cluster.
    """
    from .dedup import simhash64_fast

    base = df.select(
        F.col(host_col).alias("host"),
        F.col(id_col).alias("id"),
        simhash64_fast(F.col(text_col)).alias("simhash"),
        F.length(F.col(text_col)).cast("long").alias("_nc"),
    )
    clusters = base.groupBy("host", "simhash").agg(
        F.countDistinct("id").alias("n_pages"),
        F.min("id").alias("example_id"),
        F.round(F.avg("_nc"), 6).alias("avg_chars"),
    )
    return clusters.where(
        (F.col("n_pages") >= int(min_cluster))
        & (F.col("avg_chars") <= float(max_chars))
    )
