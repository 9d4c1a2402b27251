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


def hll_estimate(present, zp, m: int):
    """THE single HLL estimator expression (Flajolet et al. 2007):
    alpha·m²/z with linear counting below 2.5·m while empty registers
    remain — shared by :func:`hll_distinct` and the HyperANF
    neighborhood function so the 'one sketch stack' promise holds in
    code, not just docs. ``present`` = registers occupied, ``zp`` =
    Σ 2^−reg over occupied registers (both Columns)."""
    v = F.lit(m) - present
    z = zp + v.cast("double")
    raw = F.lit(_alpha(m) * m * m) / z
    return F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(m) * F.log(F.lit(m) / v)
    ).otherwise(raw)


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
    stats = regs.groupBy(*g).agg(
        F.count(F.col("_bk")).alias("_present"),
        F.coalesce(
            F.sum(F.pow(F.lit(2.0), -F.col("_reg"))), F.lit(0.0)
        ).alias("_zp"),
    )
    est = hll_estimate(F.col("_present"), F.col("_zp"), m)
    return stats.select(*g, F.round(est, 6).alias(out))


def _cm_hash(value, row: int, width: int):
    """Row-salted md5 bucket for the Count-Min sketch — the same
    masked md5-lower64 convention as HLL, salted with the row index
    so the d hash functions are independent; power-of-two width keeps
    signed pmod == unsigned %."""
    h = _md5_lower64(
        F.concat(F.lit(f"cm{row}:"), value.cast("string"))
    ).bitwiseAND(F.lit(_MASK63))
    return F.pmod(h, F.lit(width))


def _cm_probes(value, d: int, width: int):
    """The d (row, bucket) probes of one value, as an array of
    structs — THE shared hash shape of build and estimate; if the two
    ever hashed differently, every estimate would silently read
    unrelated counters."""
    return F.array(*[
        F.struct(
            F.lit(i).alias("row"), _cm_hash(value, i, width).alias("bucket")
        )
        for i in range(d)
    ])


def cm_build(
    df: DataFrame,
    value_col: str,
    d: int = 4,
    width: int = 256,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch (Cormode & Muthukrishnan 2005) of the
    ``value_col`` occurrence frequencies: ``d`` salted hash rows ×
    ``width`` counters, returned as the ``(row, bucket, cnt)`` counter
    frame (≤ d·width rows regardless of corpus size — the sketch
    contract). All arithmetic is integer, so the DuckDB oracle
    reproduces it EXACTLY, not just at round-6.

    With ``weight_col`` each input row counts as that many
    occurrences — so the sketch can be built from an ALREADY
    AGGREGATED (value, count) frame without re-scanning the corpus
    (identical counters, since the bucket sums are plain additions).

    Scale shape: one stack-explode to ``d`` rows per occurrence, one
    (row, bucket) groupBy whose key space is d·width — map-side
    partial sums collapse everything early, and sketches built over
    partitions/days/sources merge by plain counter addition. NULLs
    are ignored, matching frequency-of-value semantics."""
    v = F.col(value_col)
    w = F.col(weight_col) if weight_col else F.lit(1)
    return (
        df.where(v.isNotNull())
        .select(w.alias("_cm_w"), F.explode(_cm_probes(v, d, width)).alias("_rb"))
        .groupBy(
            F.col("_rb.row").alias("row"),
            F.col("_rb.bucket").alias("bucket"),
        )
        .agg(F.sum("_cm_w").cast("long").alias("cnt"))
    )


def cm_estimate(
    items: DataFrame,
    sketch: DataFrame,
    value_col: str,
    d: int = 4,
    width: int = 256,
    out: str = "est",
) -> DataFrame:
    """Point-query the sketch for EVERY row of ``items`` (duplicates
    preserved — output cardinality equals input cardinality): the
    Count-Min estimate is the MINIMUM of the ``d`` counters the item
    hashes to (never an underestimate; overestimates bounded by
    e/width · total with probability 1 − e^−d). ``d``/``width`` must
    match the build. The sketch side is ≤ d·width rows, so it rides a
    broadcast join; missing counters read as 0. Internal columns are
    ``_cm_``-prefixed so user columns named row/bucket/cnt survive;
    ``out`` must not collide with an items column."""
    if out in items.columns:
        raise ValueError(f"out column {out!r} already exists in items")
    v = F.col(value_col)
    probes = items.withColumn(
        "_cm_rid", F.monotonically_increasing_id()
    ).select(
        "*", F.explode(_cm_probes(v, d, width)).alias("_rb")
    ).select(
        *items.columns, "_cm_rid",
        F.col("_rb.row").alias("_cm_row"),
        F.col("_rb.bucket").alias("_cm_bucket"),
    )
    sk = sketch.select(
        F.col("row").alias("_cm_row"),
        F.col("bucket").alias("_cm_bucket"),
        F.col("cnt").alias("_cm_cnt"),
    )
    return (
        probes.join(F.broadcast(sk), ["_cm_row", "_cm_bucket"], "left")
        .groupBy("_cm_rid", *items.columns)
        .agg(
            F.min(F.coalesce(F.col("_cm_cnt"), F.lit(0)))
            .cast("long").alias(out)
        )
        .drop("_cm_rid")
    )


# ---------------------------------------------------------------------------
# Misra-Gries heavy hitters: sketch-prune-verify
# ---------------------------------------------------------------------------

def _mg_partition_candidates(value_col: str, k_counters: int):
    """mapInPandas kernel: one Misra-Gries summary per PARTITION,
    merged batch-by-batch (exact per-batch counts folded in, then the
    summary pruned back to ``k_counters`` by subtracting the
    (k+1)-largest count — the Agarwal et al. mergeable-summaries
    merge, error ≤ n_p/(k+1)). Emits just the surviving keys."""
    import heapq

    import pandas as pd

    def gen(batches):
        counters: dict = {}
        for pdf in batches:
            vc = pdf[value_col].dropna().value_counts()
            for t, c in vc.items():
                counters[t] = counters.get(t, 0) + int(c)
            if len(counters) > k_counters:
                # subtract the (k+1)-th largest count from everyone;
                # ≤ k survive, each decremented ≤ its own share of
                # the MG error budget
                cut = heapq.nlargest(
                    k_counters + 1, counters.values()
                )[-1]
                counters = {
                    t: c - cut for t, c in counters.items() if c > cut
                }
        if counters:
            yield pd.DataFrame({value_col: list(counters.keys())})

    return gen


def mg_heavy_hitters(
    items: DataFrame,
    value_col: str = "term",
    k_counters: int = 64,
    phi_den: int = 50,
) -> DataFrame:
    """EXACT φ-heavy hitters (global frequency · ``phi_den`` > total)
    by sketch-prune-verify: per-partition Misra-Gries summaries emit a
    small candidate superset, then ONE exact counting pass restricted
    to the broadcast candidates filters on the exact threshold.

    Correctness does not depend on partitioning: if
    f(x) · phi_den > n then by averaging some partition has
    f_p(x) · phi_den > n_p ≥ n_p · phi_den/(k_counters+1)-scaled
    budget (requires ``phi_den ≤ k_counters + 1``), so x survives
    that partition's summary — the union of summaries is a superset
    of every heavy hitter, and the verify pass makes the output exact
    and deterministic. At 100 TB the exact pass counts only
    ≤ partitions · k_counters keys (broadcast semi-join pruned)
    instead of the full vocabulary — the point of the sketch.

    Output: ``(term, freq, share)`` for every term with
    ``freq * phi_den > total``, ``share`` rounded to 6 dp.
    """
    if phi_den > k_counters + 1:
        raise ValueError(
            "phi_den must be <= k_counters+1 for the superset guarantee"
        )
    src = items.select(F.col(value_col).alias(value_col))
    cands = (
        src.mapInPandas(
            _mg_partition_candidates(value_col, k_counters),
            schema=f"{value_col} string",
        )
        .distinct()
    )
    total = src.agg(F.count(value_col).alias("_total"))
    exact = (
        src.join(F.broadcast(cands), value_col)
        .groupBy(value_col)
        .agg(F.count(F.lit(1)).cast("long").alias("freq"))
    )
    return (
        exact.crossJoin(F.broadcast(total))
        .where(F.col("freq") * phi_den > F.col("_total"))
        .select(
            value_col,
            "freq",
            F.round(F.col("freq") / F.col("_total"), 6).alias("share"),
        )
    )


def kmv_sketch(
    df: DataFrame,
    value_col: str,
    k: int,
    out: str = "h",
) -> DataFrame:
    """Bottom-k (KMV / theta) sketch of the distinct values of
    ``value_col``: the ``k`` smallest DISTINCT 63-bit md5-lower
    hashes, one per row (Bar-Yossef et al. 2002; the Theta-sketch
    framework of Dasgupta et al. 2016). NULLs ignored.

    Scale shape: a per-partition Arrow pass emits each partition's
    own k smallest distinct hashes (``np.unique`` is sort-based, so
    the slice is exact) — at most ``k`` rows per partition ever reach
    the final ``TakeOrderedAndProject``; the full distinct set is
    never shuffled. Correct because the global bottom-k of a union is
    contained in the union of per-partition bottom-k's. Deterministic:
    the sketch is a pure function of the value SET (md5 arithmetic,
    no RNG, no order sensitivity), so a DuckDB oracle re-derives it
    with ``md5_number_lower % 2^63`` + ``ORDER BY ... LIMIT k``, and
    sketches built on different partitionings are identical.

    Mergeability (the 100 TB contract): the union of two sketches,
    re-limited to the k smallest, IS the sketch of the union — daily
    crawl snapshots keep a k-row parquet each and any cross-snapshot
    estimate needs only those k-row frames, never the raw URL sets.
    """
    import pandas as pd

    if k < 2:
        raise ValueError("kmv_sketch needs k >= 2")
    h = _md5_lower64(F.col(value_col).cast("string")).bitwiseAND(
        F.lit(_MASK63)
    )
    hashed = df.select(h.alias(out)).where(F.col(out).isNotNull())

    def part_bottom_k(batches):
        import numpy as np

        best = None
        for pdf in batches:
            v = np.unique(pdf[out].to_numpy(dtype="int64"))[:k]
            if best is None:
                best = v
            else:
                best = np.unique(np.concatenate([best, v]))[:k]
        if best is not None and len(best):
            yield pd.DataFrame({out: best})

    return (
        hashed.mapInPandas(part_bottom_k, schema=f"{out} long")
        .groupBy(out)
        .agg(F.lit(1))
        .select(out)
        .orderBy(out)
        .limit(k)
    )


def theta_set_stats(
    a: DataFrame,
    b: DataFrame,
    value_col: str,
    k: int = 256,
) -> DataFrame:
    """Theta-sketch set-operation estimates between the distinct
    ``value_col`` sets of ``a`` and ``b`` — the crawl question "how
    many hosts/urls did both snapshots touch" without ever joining
    the raw sets.

    Mechanics (Theta framework): each side keeps its bottom-k sketch;
    theta = the k-th smallest hash when the sketch is full, else
    2^63 (the sketch then IS the exact distinct set). With
    theta* = min(theta_a, theta_b), every retained hash strictly below theta* is a
    uniform sample of the union at rate theta*/2^63, so
    |X| ~= count(X's hashes < theta*) * 2^63 / theta* (the k-th hash itself is excluded — the unbiased (k-1)/theta KMV estimator). Estimates for
    A, B, the union and the intersection all come from the two k-row
    frames; Jaccard = est_intersect / est_union. When both sketches
    are under-full every estimate collapses to the exact count —
    tested.

    Everything after the two sketches runs on <= 2k rows (driver-
    scale); only integer comparisons feed the counts, one float
    division per estimate at the end, round-6 output. Exact distinct
    counts are NOT computed here — pair with countDistinct in audit
    queries at test scale; at 100 TB the sketches replace them.

    Output: one row ``(k, full_a, full_b, theta_star, est_a, est_b,
    est_union, est_intersect, est_jaccard)``.
    """
    # Materialize both sketches ONCE: each k-row frame feeds four
    # consumers (theta, union, intersection, retained-count) and
    # without a checkpoint every consumer would re-execute the whole
    # hash-scan + bottom-k subtree (measured 29.6s -> ~8s at sf0.1).
    # localCheckpoint on a <=k-row frame costs microseconds and needs
    # no unpersist bookkeeping.
    sa = (
        kmv_sketch(a, value_col, k)
        .select(F.col("h").alias("ha"))
        .localCheckpoint(eager=True)
    )
    sb = (
        kmv_sketch(b, value_col, k)
        .select(F.col("h").alias("hb"))
        .localCheckpoint(eager=True)
    )
    lim = 1 << 63  # python int; exceeds LONG by 1 — kept driver-side
    ta = sa.agg(
        F.count("ha").alias("na"), F.max("ha").alias("maxa")
    ).select(
        "na",
        F.when(F.col("na") < k, F.lit(None).cast("long"))
        .otherwise(F.col("maxa"))
        .alias("tha"),
    )
    tb = sb.agg(
        F.count("hb").alias("nb"), F.max("hb").alias("maxb")
    ).select(
        "nb",
        F.when(F.col("nb") < k, F.lit(None).cast("long"))
        .otherwise(F.col("maxb"))
        .alias("thb"),
    )
    # theta* as a DOUBLE fraction of 2^63; NULL theta means "exact
    # side" (theta fraction 1.0). least() over the two fractions.
    th = ta.crossJoin(tb).select(
        "na",
        "nb",
        "tha",
        "thb",
        F.least(
            F.coalesce(F.col("tha").cast("double") / F.lit(float(lim)), F.lit(1.0)),
            F.coalesce(F.col("thb").cast("double") / F.lit(float(lim)), F.lit(1.0)),
        ).alias("theta_frac"),
        F.coalesce(F.least("tha", "thb"), F.greatest("tha", "thb")).alias(
            "theta_raw"
        ),
    )
    uni = (
        sa.select(F.col("ha").alias("h"))
        .unionByName(sb.select(F.col("hb").alias("h")))
        .distinct()
    )
    both = sa.join(sb, sa.ha == sb.hb).select(F.col("ha").alias("h"))
    # Retention gate: h < theta_raw when a raw theta exists, else all.
    cu = uni.crossJoin(F.broadcast(th)).where(
        F.col("theta_raw").isNull() | (F.col("h") < F.col("theta_raw"))
    )
    ci = both.crossJoin(F.broadcast(th)).where(
        F.col("theta_raw").isNull() | (F.col("h") < F.col("theta_raw"))
    )
    cnt_u = cu.agg(F.count("h").alias("cu"))
    cnt_i = ci.agg(F.count("h").alias("ci"))
    ca = (
        sa.crossJoin(F.broadcast(th))
        .where(F.col("theta_raw").isNull() | (F.col("ha") < F.col("theta_raw")))
        .agg(F.count("ha").alias("ca"))
    )
    cb = (
        sb.crossJoin(F.broadcast(th))
        .where(F.col("theta_raw").isNull() | (F.col("hb") < F.col("theta_raw")))
        .agg(F.count("hb").alias("cb"))
    )
    est = (
        th.crossJoin(cnt_u)
        .crossJoin(cnt_i)
        .crossJoin(ca)
        .crossJoin(cb)
    )
    scale = F.lit(1.0) / F.col("theta_frac")
    return est.select(
        F.lit(k).alias("k"),
        (F.col("na") >= k).cast("int").alias("full_a"),
        (F.col("nb") >= k).cast("int").alias("full_b"),
        F.round(F.col("theta_frac"), 6).alias("theta_star"),
        F.round(F.col("ca") * scale, 6).alias("est_a"),
        F.round(F.col("cb") * scale, 6).alias("est_b"),
        F.round(F.col("cu") * scale, 6).alias("est_union"),
        F.round(F.col("ci") * scale, 6).alias("est_intersect"),
        F.round(
            F.when(F.col("cu") > 0, F.col("ci") / F.col("cu")).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("est_jaccard"),
    )
