"""Ranking / sampling operators (SURVEY.md §2.6-2.8).

Spark restatements of the reference's pandas groupby patterns:
- top-1/top-k per group (best-xpath-per-field,
  ``/root/reference/feilian/agents/fragments_agent.py:224-229``);
- stratified group sampling
  (``/root/reference/feilian/datasets/dataset.py:98-135``) made
  deterministic by ordering on md5(id) instead of a seeded RNG — the
  distributed-reproducible equivalent of ``random_state=42``;
- binned aggregates (``feilian/statistical_analysis.py:55-79``);
- percentile describes (``feilian/statistical_analysis.py:546-554``).
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_cols: Sequence[Column],
    k: int = 1,
    rank_col: str = "rn",
) -> DataFrame:
    w = Window.partitionBy(*group_cols).orderBy(*order_cols)
    return (
        df.withColumn(rank_col, F.row_number().over(w))
        .where(F.col(rank_col) <= k)
        .drop(rank_col)
    )


def stratified_sample(
    df: DataFrame, group_cols: Sequence[str], id_col: str, n: int
) -> DataFrame:
    """n rows per group, chosen by md5(id) order — deterministic across
    engines and partitionings (the seeded-sample analogue)."""
    w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")), F.col(id_col)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= n)
        .drop("_rn")
    )


def binned_avg(
    df: DataFrame, bin_col: str, bin_width: float, value_cols: Sequence[str]
) -> DataFrame:
    """``x // w * w`` binning + per-bin means."""
    b = (F.floor(F.col(bin_col) / bin_width) * bin_width).alias("bin")
    aggs = [F.avg(c).alias(f"avg_{c}") for c in value_cols]
    return df.groupBy(b).agg(*aggs)


def percentile_describe(
    df: DataFrame, group_cols: Sequence[str], value_col: str,
    percentiles: Sequence[float] = (0.05, 0.5, 0.95),
) -> DataFrame:
    """Exact interpolated percentiles per group (matches SQL
    ``quantile_cont``); plus count/mean."""
    return df.groupBy(*group_cols).agg(
        F.count(value_col).alias("n"),
        F.round(F.avg(value_col), 6).alias("mean"),
        *[
            F.round(
                F.expr(f"percentile({value_col}, {p})"), 6
            ).alias(f"p{int(p * 100):02d}")
            for p in percentiles
        ],
    )
