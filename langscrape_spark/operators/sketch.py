"""Cardinality sketches — deterministic HyperLogLog (Flajolet et al.
2007) built from md5 arithmetic so the estimate is reproducible
bit-for-bit in ANSI SQL (DuckDB oracle q87).

Why a sketch at 100 TB: ``countDistinct`` shuffles every distinct
value; the HLL register table is ``m`` longs per group regardless of
cardinality, the (group, bucket) groupBy benefits fully from map-side
partial ``max`` aggregation (register merge IS max), and register
tables from different partitions/days/sources merge by the same max —
the standard mergeable-sketch contract. Spark's own
``approx_count_distinct`` is HLL++ but its estimate is not
reproducible outside the JVM; this one trades a little accuracy
headroom for a cross-engine-checkable definition.

Determinism: the hash is the md5 lower half masked to 63 bits (the
repo-wide ``md5_number_lower % 2^63`` convention), bucket = low ``p``
bits (power-of-two modulus: signed pmod == unsigned %), the remaining
``63 − p`` bits feed the leading-zero rank via ``length(bin(w))`` —
Spark's ``F.bin`` and DuckDB's ``bin`` both print without leading
zeros ('0' for 0, handled explicitly). ``2^{-reg}`` values are exact
powers of two; the only float-order sensitivity is the register sum
(≤ m terms), absorbed by the round-6 output.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

from .dedup import _md5_lower64

_MASK63 = 0x7FFFFFFFFFFFFFFF


def _alpha(m: int) -> float:
    # Flajolet et al. 2007 bias constants; the m >= 128 formula is
    # written identically in the DuckDB oracle so both engines fold
    # the same IEEE expression.
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1 + 1.079 / m)


def hll_distinct(
    df: DataFrame,
    value_col: str,
    group_cols: Sequence[str] = (),
    p: int = 8,
    out: str = "est",
) -> DataFrame:
    """Per-group HLL distinct-count estimate of ``value_col``
    (NULLs ignored, matching ``count(DISTINCT ...)``). ``p`` register
    bits (m = 2^p registers); the small-range linear-counting
    correction applies below 2.5·m with empty registers, per the
    paper. Output: ``group_cols + (out: double, round-6)``."""
    g = list(group_cols)
    m = 1 << p
    h = _md5_lower64(F.col(value_col).cast("string")).bitwiseAND(
        F.lit(_MASK63)
    )
    w = F.shiftright(h, p)
    rho = F.when(w == 0, F.lit(64 - p)).otherwise(
        F.lit(64 - p) - F.length(F.bin(w))
    )
    # NULL values flow through with a NULL bucket instead of a row
    # filter: their register row is skipped by count(col)/sum below,
    # so a group whose values are ALL NULL still surfaces — with
    # every register empty, linear counting gives m·ln(m/m) = 0,
    # exactly count(DISTINCT)'s answer for that group.
    regs = (
        df.select(*g, F.pmod(h, F.lit(m)).alias("_bk"), rho.alias("_rho"))
        .groupBy(*g, "_bk")
        .agg(F.max("_rho").alias("_reg"))
    )
    alpha = _alpha(m)
    stats = regs.groupBy(*g).agg(
        F.count(F.col("_bk")).alias("_present"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("_reg"))), F.lit(0.0)
        ).alias("_zp"),
    )
    v = F.lit(m) - F.col("_present")  # empty registers
    z = F.col("_zp") + v.cast("double")
    raw = F.lit(alpha * m * m) / z
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)
    return stats.select(*g, F.round(est, 6).alias(out))
