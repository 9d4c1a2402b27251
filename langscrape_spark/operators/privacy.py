"""Privacy risk audits for released training corpora — k-anonymity
(Sweeney 2002) and l-diversity (Machanavelli et al. 2007) over
quasi-identifier columns.

Reference scope: none (the reference never releases data); this is
the governance gate a webtext corpus passes before publication: if a
combination of quasi-identifiers (host, language, size bucket, date)
isolates fewer than k documents, those rows are re-identifiable by
linkage, and if the ``sensitive`` attribute is uniform inside a
group, membership alone leaks it.

Scale shape: both audits are ONE hash-aggregation over the QI tuple
(map-side partial counts, no windows, no joins except the final
broadcast of the one-row total), so they run at corpus scale for the
cost of a groupBy — the audit is cheaper than any query it guards.
NULL QI values group under their own key (NULL-safe grouping is what
groupBy does), matching GROUP BY in any SQL engine.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def k_anonymity_violations(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int,
) -> DataFrame:
    """Every QI group with fewer than ``k`` rows — the
    re-identifiable slices, smallest first. Output:
    ``qi_cols + (group_rows long)``."""
    qi = list(qi_cols)
    return (
        df.groupBy(*qi)
        .agg(F.count(F.lit(1)).alias("group_rows"))
        .where(F.col("group_rows") < k)
        .orderBy("group_rows", *qi)
    )


def k_anonymity_summary(
    df: DataFrame,
    qi_cols: Sequence[str],
    k: int,
    sensitive_col: str | None = None,
) -> DataFrame:
    """One audit row: total rows/groups, the corpus's actual k (the
    smallest group), violating group/row counts and the violating-row
    fraction; with ``sensitive_col``, also the corpus's l (min
    distinct sensitive values per group) — distinct-l, the simplest
    l-diversity instantiation. Round-6 fraction; everything else
    exact integers."""
    qi = list(qi_cols)
    aggs = [F.count(F.lit(1)).alias("group_rows")]
    if sensitive_col is not None:
        aggs.append(
            F.countDistinct(F.col(sensitive_col)).alias("_l")
        )
    groups = df.groupBy(*qi).agg(*aggs)
    out_aggs = [
        F.sum("group_rows").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.min("group_rows").alias("k_actual"),
        F.sum((F.col("group_rows") < k).cast("long")).alias(
            "violating_groups"
        ),
        F.sum(
            F.when(F.col("group_rows") < k, F.col("group_rows")).otherwise(
                F.lit(0)
            )
        ).alias("violating_rows"),
    ]
    if sensitive_col is not None:
        out_aggs.append(F.min("_l").alias("l_actual"))
    return groups.agg(*out_aggs).select(
        "*",
        F.round(
            F.col("violating_rows") / F.col("n_rows"), 6
        ).alias("violating_frac"),
    )
