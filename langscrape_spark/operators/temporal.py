"""Point-in-time (as-of) join: each probe row matched to the latest
capture at-or-before its timestamp.

The crawl-native use: the versioned catalog (``sources/catalog.py``)
keeps every crawl round's capture of a url; an analysis row stamped
``ts`` ("what did we believe about this url when the classifier ran?",
"which snapshot fed this training shard?") must join the capture that
was CURRENT at ``ts`` — not the newest one, not an equi-match. The
reference has no temporal joins at all (its per-URL loop overwrites
one JSON per url, `/root/reference/scripts/run.py:63-77`); this is
one of the operators the build brief calls out as missing from both
the reference AND vanilla Spark's join menu.

Spark-first shape — the MERGE-UNION trick, ONE shuffle, NO range
explosion: tag captures side=0 and probes side=1, union, and run a
single ``last(value, ignorenulls=True)`` window per key ordered by
``(ts, side)``. Each probe row then carries the most recent capture
struct at-or-before it (side 0 sorts first, so an equal-timestamp
capture IS visible to the probe — inclusive ``>=`` semantics, the
same convention as DuckDB's native ``ASOF JOIN``). The window is
``rowsBetween(unboundedPreceding, currentRow)`` over one url's
history — bounded by that url's revisit count, never corpus-global —
so the plan is: one hash exchange on the key, one in-partition sort,
zero joins. At 10^10 urls the exchange partitions by url-hash exactly
like the seen-set membership joins; a per-key history is at most a
few hundred rows, so there is no skew beyond what AQE already
handles.

The naive alternatives both die at scale: a range join
(``p.ts >= c.ts``) is O(|P|·|C|) per key worst-case and plans as a
broadcast-nested-loop unless one side is tiny; a windowed
``max(capture_ts) <= ts`` subquery needs a join back. The union-window
form is linear in |P| + |C|.

Determinism: captures are collapsed to ONE row per (key, ts) first —
``max(struct(value_cols))`` — so ties inside a capture snapshot
cannot make the match order-dependent. NULL keys / NULL timestamps on
the capture side are dropped (they can never be "current"); NULL-ts
probes keep a NULL match.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["asof_join"]


def asof_join(
    probes: DataFrame,
    captures: DataFrame,
    key_col: str = "url",
    ts_col: str = "ts",
    value_cols: Sequence[str] = ("value",),
    capture_ts_name: str = "capture_ts",
    tolerance_sec: Optional[float] = None,
) -> DataFrame:
    """Backward as-of join (latest capture with ``capture.ts <=
    probe.ts``, inclusive).

    ``probes``: any columns + ``key_col`` + ``ts_col``; every probe
    column is passed through. ``captures``: ``key_col`` + ``ts_col``
    + ``value_cols``. Output = probes' columns + ``capture_ts_name``
    (the matched capture's timestamp, NULL when no capture precedes)
    + ``value_cols`` (NULL on no match).

    ``tolerance_sec``: optional max staleness — a match older than
    ``probe.ts - tolerance_sec`` is nulled out (seconds; ``ts_col``
    may be timestamp or numeric, compared via a double cast). DuckDB's
    ASOF JOIN has no tolerance clause, so oracled callers leave it
    None; the crawl scheduler uses it to refuse stale robots.txt
    snapshots.
    """
    pcols = [c for c in probes.columns]
    for c in (capture_ts_name, "__side", "__cap", "__k", "__ts", "__m"):
        if c in pcols:
            raise ValueError(f"probe column {c!r} collides with asof_join internals")
    missing = [c for c in (key_col, ts_col, *value_cols) if c not in captures.columns]
    if missing:
        raise ValueError(f"captures missing columns: {missing}")

    # One capture row per (key, ts): deterministic max-struct election.
    cap = (
        captures.where(F.col(key_col).isNotNull() & F.col(ts_col).isNotNull())
        .groupBy(key_col, ts_col)
        .agg(F.max(F.struct(*[F.col(c) for c in value_cols])).alias("__v"))
        .select(
            F.col(key_col).alias("__k"),
            F.col(ts_col).alias("__ts"),
            F.lit(0).alias("__side"),
            F.struct(
                F.col(ts_col).alias(capture_ts_name),
                *[F.col(f"__v.{c}").alias(c) for c in value_cols],
            ).alias("__cap"),
            *[F.lit(None).cast(probes.schema[c].dataType).alias(c) for c in pcols],
        )
    )
    prb = probes.select(
        F.col(key_col).alias("__k"),
        F.col(ts_col).alias("__ts"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(cap.schema["__cap"].dataType).alias("__cap"),
        *pcols,
    )

    w = (
        Window.partitionBy("__k")
        .orderBy(F.col("__ts").asc_nulls_first(), F.col("__side").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = F.last("__cap", ignorenulls=True).over(w)
    out = (
        cap.unionByName(prb)
        .withColumn("__m", matched)
        .where(F.col("__side") == 1)
    )
    if tolerance_sec is not None:
        fresh = (
            F.col("__ts").cast("double")
            - F.col(f"__m.{capture_ts_name}").cast("double")
        ) <= F.lit(float(tolerance_sec))
        out = out.withColumn(
            "__m", F.when(F.col("__m").isNotNull() & fresh, F.col("__m"))
        )
    return out.select(
        *pcols,
        F.col(f"__m.{capture_ts_name}").alias(capture_ts_name),
        *[F.col(f"__m.{c}").alias(c) for c in value_cols],
    )
