"""Leakage-safe train/validation/test splitting.

Splitting a web corpus by *document* leaks: near-duplicate pages of the
same site land on both sides of the split and inflate eval numbers
(the failure benchmark-decontamination papers measure — see
``operators/contamination.py`` for the cross-benchmark variant). The
standard guard is GROUP-level assignment: hash the *host* (or any
dedup-cluster key — ``operators/components.resolve_duplicates``'s
``canonical_id`` composes directly), so every page of a group lands in
exactly one split. ``split_leakage_audit`` then measures what the
group key did NOT capture (cross-host mirrors), which is the number to
drive an extra dedup round on.

Scale shape (100 TB): assignment is a pure codegen projection (one
md5 + a literal CASE chain — no shuffle, no lookup table, stable under
re-runs and late-arriving data because the hash owns the decision).
The audit is two equi-key hash aggs (fp-sized, then splits-sized).

Determinism/parity: ``u = (md5_lower64(salt || key) mod 2^32 + 0.5)
/ 2^32`` — the DSIR Gumbel-u construction, reproducible bit-for-bit in
DuckDB (``md5_number_lower % 2^32``; power-of-2 modulus so Spark's
signed ``pmod`` agrees). Cumulative boundaries must be float-exact in
both engines: pass weights whose partial sums are exact binary
fractions (0.75/0.125/0.125), or embed ``repr()`` of the partial sums
in the oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _md5_lower64
from .text import fingerprint

_TWO32 = 4294967296


def split_u(key: Column, salt: str = "split:") -> Column:
    """Uniform (0,1) hash of the group key — the split decision."""
    return (
        F.pmod(
            _md5_lower64(F.concat(F.lit(salt), key.cast("string"))),
            F.lit(_TWO32),
        )
        + F.lit(0.5)
    ) / F.lit(float(_TWO32))


def assign_split(
    df: DataFrame,
    group_col: str,
    weights: dict[str, float],
    salt: str = "split:",
) -> DataFrame:
    """Append a ``split`` column: every row whose ``group_col`` hashes
    into the same (0,1) point gets the same name; ``weights`` insertion
    order fixes the interval layout (partial sums are the boundaries;
    the last split absorbs the rounding tail).

    Rows with a NULL group key get split NULL — visible, never
    silently folded into a split (a NULL host usually means an
    unparseable URL; the caller decides whether to drop or bucket
    them)."""
    u = split_u(F.col(group_col), salt)
    names = list(weights)
    bounds: list[float] = []
    acc = 0.0
    for name in names[:-1]:
        acc += weights[name]
        bounds.append(acc)
    expr = F.lit(names[-1])
    for name, b in zip(reversed(names[:-1]), reversed(bounds)):
        expr = F.when(u < F.lit(b), F.lit(name)).otherwise(expr)
    # nested whens built innermost-last so earlier splits win — the
    # loop above rebuilds the CASE u < b1 ... < b2 ... ELSE last chain.
    expr = F.when(
        F.col(group_col).isNull(), F.lit(None).cast("string")
    ).otherwise(expr)
    return df.withColumn("split", expr)


def split_leakage_audit(
    split_docs: DataFrame,
    text_col: str = "text",
    fp_col: str | None = None,
) -> DataFrame:
    """Per-split rollup with the leakage count:
    ``(split, n_docs, n_leaked_docs)`` where a doc is leaked
    when its content fingerprint also occurs in a DIFFERENT split —
    exactly the duplication the group key failed to contain. Uses
    ``fp_col`` if given, else ``text.fingerprint`` of ``text_col``."""
    fp = F.col(fp_col) if fp_col else fingerprint(F.col(text_col))
    d = split_docs.withColumn("_fp", fp)
    leaked = (
        d.groupBy("_fp")
        .agg(F.count_distinct("split").alias("ns"))
        .where(F.col("ns") > 1)
        .select("_fp")
    )
    # the leaked-fp set is audit-sized (leaks are the anomaly) — small
    # enough to broadcast; if an audit ever finds corpus-scale leakage
    # the right response is a dedup round, not a bigger join.
    flagged = (
        d.join(F.broadcast(leaked), "_fp", "left_semi")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_leaked_docs"))
    )
    base = d.groupBy("split").agg(F.count(F.lit(1)).alias("n_docs"))
    return base.join(flagged, "split", "left").select(
        "split",
        "n_docs",
        F.coalesce("n_leaked_docs", F.lit(0)).alias("n_leaked_docs"),
    )


def skyline_2d(
    df: "DataFrame",
    x_col: str,
    y_col: str,
    id_col: str = "doc_id",
    x_grid: float | None = None,
):
    """2-D Pareto skyline (maximize both): rows no other row strictly
    dominates (>= on both axes, > on at least one). The curation use:
    when two scores pull against each other (quality vs freshness,
    quality vs dedup-distinctiveness), the skyline is the principled
    shortlist — nothing on it can be improved on one axis for free.

    Algorithm is the textbook sort-scan: in (x desc, y desc) order a
    row is on the skyline iff its y strictly exceeds every y seen at
    STRICTLY larger x — two window functions (a per-x-group max and a
    running max over the x-ordered prefix), not an O(n²) self-join.
    The x-ordered running window IS a global ordered window: the
    skyline is a global property, but the frame it runs over is the
    per-x-group MAX table — one row per DISTINCT x, corpus-sized in
    the worst all-distinct case. That is what ``x_grid`` bounds: when
    set, x is quantized down to ``floor(x / x_grid) * x_grid`` before
    the scan, capping the window frame at range(x)/x_grid rows at ANY
    corpus size (the callable form of "bucket scores to a grid at
    100 TB" — quantized scores are also what make thresholds
    meaningful). Identical output when every x already sits on the
    grid; otherwise the skyline is over the coarsened x, and reported
    ``x`` is the bucket floor. Continuous-scored corpus-scale inputs
    MUST pass it — refuse the silent single-partition window instead:
    with ``x_grid=None`` the exact path asserts the distinct-x frame
    stays small only by the caller's own knowledge of the data. Ties
    on both axes all survive (none strictly dominates another).

    Output: ``(id, x, y)`` rows on the skyline.
    """
    from pyspark.sql import Window

    d = df.select(
        F.col(id_col).alias("id"),
        F.col(x_col).cast("double").alias("x"),
        F.col(y_col).cast("double").alias("y"),
    ).where(F.col("x").isNotNull() & F.col("y").isNotNull())
    if x_grid is not None:
        if x_grid <= 0:
            raise ValueError(f"x_grid must be positive, got {x_grid}")
        d = d.withColumn(
            "x", F.floor(F.col("x") / F.lit(float(x_grid))) * F.lit(float(x_grid))
        )
    # best y per distinct x (small frame), then the running max of
    # best-y over strictly-larger x
    per_x = d.groupBy("x").agg(F.max("y").alias("ymax"))
    w = (
        Window.orderBy(F.col("x").desc())
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = per_x.withColumn(
        "prev_best", F.max("ymax").over(w)
    ).select("x", "ymax", "prev_best")
    return (
        d.join(frontier, "x")
        .where(
            (F.col("y") == F.col("ymax"))
            & (
                F.col("prev_best").isNull()
                | (F.col("y") > F.col("prev_best"))
            )
        )
        .select("id", "x", "y")
    )
