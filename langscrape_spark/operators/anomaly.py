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
