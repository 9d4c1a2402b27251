"""Event sessionization — gaps-and-islands with an inactivity timeout.

The classic event-analytics operator (and the crawl-side shape for
burst detection / politeness-window accounting: a "session" of fetch
events against one host is exactly this grouping). The reference has
no event stream at all; this generalizes the gaps-and-islands pattern
the robots parser already uses for User-agent runs (q45) to timestamped
activity.

Scale shape (10^12 events): ONE window pass partitioned by the entity
(every entity its own group — parallel by construction, never a global
sort) computes the new-session flags and the running session sequence;
the per-session rollup is an equi-key groupBy with map-side partial
aggregation. Timestamps compare in integer MICROSECONDS (`unix_micros`
/ `epoch_us`) so the timeout boundary is exact in both engines — no
float time arithmetic anywhere until the reported duration.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def sessionize(
    events: DataFrame,
    timeout_sec: int = 1800,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Group each entity's events into sessions separated by gaps
    > ``timeout_sec``. Returns one row per session: ``(user_id,
    session_seq, n_events, start_us, end_us, duration_sec,
    value_sum)`` with ``session_seq`` numbered from 1 in time order.
    Ordering ties break on ``id_col`` so re-runs are byte-stable.
    NULL timestamps are dropped: they are unsessionizable, and the
    engines' NULLS FIRST/LAST ordering defaults differ, so keeping
    them would silently diverge the oracle."""
    base = events.where(F.col(ts_col).isNotNull()).select(
        F.col(user_col),
        # NTZ columns cast through TIMESTAMP (session TZ is UTC per
        # session.py, so the wall clock IS the epoch — same integer
        # DuckDB's epoch_us reads off the naive value)
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"),
    )
    w = Window.partitionBy(user_col).orderBy("_us", "_id")
    # flag first, running sum second — nested window expressions are
    # illegal, and both windows share one partitioning so Catalyst
    # plans a single exchange + sort
    flagged = base.withColumn(
        "_gap", F.col("_us") - F.lag("_us").over(w)
    ).withColumn(
        "_new",
        F.when(
            F.col("_gap").isNull()
            | (F.col("_gap") > timeout_sec * 1_000_000),
            1,
        ).otherwise(0),
    )
    sessions = flagged.withColumn(
        "session_seq",
        F.sum("_new").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    return (
        sessions.groupBy(user_col, "session_seq")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.min("_us").alias("start_us"),
            F.max("_us").alias("end_us"),
            F.round(
                (F.max("_us") - F.min("_us")) / F.lit(1_000_000.0), 6
            ).alias("duration_sec"),
            F.round(F.sum("_v"), 6).alias("value_sum"),
        )
        .select(
            F.col(user_col),
            F.col("session_seq").cast("long").alias("session_seq"),
            "n_events",
            "start_us",
            "end_us",
            "duration_sec",
            "value_sum",
        )
    )


def politeness_audit(
    fetches: DataFrame,
    delays: DataFrame,
    host_col: str = "host",
    ts_col: str = "ts",
    id_col: str = "event_id",
    delay_col: str = "crawl_delay_s",
) -> DataFrame:
    """Crawl-delay COMPLIANCE audit: did the fetcher actually honor
    each host's robots crawl-delay? The inverse of the scheduler's
    politeness windows — run over the fetch LOG after the fact, the
    report crawl-ops reads when a host complains.

    Per host, consecutive-fetch gaps come from one lag window ordered
    by (ts, id) — same exchange+sort shape as :func:`sessionize`, and
    the same integer-MICROSECOND convention so the boundary
    ``gap < delay`` is exact cross-engine (a violation is a gap
    STRICTLY below the delay; equality is compliant). The delay is
    compared in micro-units too — ``round(delay * 1e6)`` as a long —
    so fractional Crawl-delays (``0.9``, ``2.5``: both appear in real
    robots files) gate exactly instead of truncating to whole seconds
    and under-reporting violations. Hosts with no robots rule audit
    against delay 0 (never violated). NULL timestamps are dropped
    (unorderable; engine NULL-order defaults differ).

    Output per host: ``(host, crawl_delay_s, n_fetches, n_gaps,
    n_violations, min_gap_us, violation_rate)`` — rate over gaps, not
    fetches (first fetch has no gap), NULL when a host has a single
    fetch.
    """
    base = fetches.where(F.col(ts_col).isNotNull()).select(
        F.col(host_col).alias("host"),
        F.unix_micros(F.col(ts_col).cast("timestamp")).alias("_us"),
        F.col(id_col).alias("_id"),
    )
    w = Window.partitionBy("host").orderBy("_us", "_id")
    gaps = base.withColumn("_gap", F.col("_us") - F.lag("_us").over(w))
    # one row per host, or the left join fans every gap out per
    # duplicate delay row; conflicting robots rules audit against the
    # STRICTEST (max) delay
    d = (
        delays.select(
            F.col(host_col).alias("host"),
            F.col(delay_col).cast("double").alias("crawl_delay_s"),
        )
        .groupBy("host")
        .agg(F.max("crawl_delay_s").alias("crawl_delay_s"))
    )
    joined = gaps.join(F.broadcast(d), "host", "left").withColumn(
        "crawl_delay_s", F.coalesce("crawl_delay_s", F.lit(0.0))
    )
    return (
        joined.groupBy("host", "crawl_delay_s")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fetches"),
            F.count("_gap").cast("long").alias("n_gaps"),
            F.sum(
                F.when(
                    F.col("_gap")
                    < F.round(
                        F.col("crawl_delay_s") * F.lit(1_000_000.0)
                    ).cast("long"),
                    1,
                ).otherwise(0)
            )
            .cast("long")
            .alias("n_violations"),
            F.min("_gap").cast("long").alias("min_gap_us"),
        )
        .withColumn(
            "violation_rate",
            F.round(
                F.try_divide(
                    F.col("n_violations").cast("double"),
                    F.col("n_gaps").cast("double"),
                ),
                6,
            ),
        )
    )


def aimd_rate_trajectory(
    events: DataFrame,
    host_col: str,
    round_col: str,
    err_col: str,
    n_rounds: int,
    r0_micro: int = 1_000_000,
    add_micro: int = 250_000,
    mult_num: int = 1,
    mult_den: int = 2,
    floor_micro: int = 125_000,
) -> DataFrame:
    """AIMD (additive-increase / multiplicative-decrease) adaptive
    per-host fetch-rate controller — TCP congestion control applied
    to crawl politeness (what production crawlers do with 429/503
    responses, RFC 6585's Retry-After spirit): each round without
    overload raises the host's request rate additively; an overload
    round cuts it multiplicatively (never below the floor).

    Exact integer micro-unit recurrence per host over rounds
    0..n_rounds-1, missing (host, round) observations counting as
    no-error:

        rate_0   = r0
        rate_t+1 = max(floor, rate_t * mult_num // mult_den)  if err_t
                   rate_t + add                               else

    Scale shape: the per-host error history densifies into ONE
    array<boolean> of length n_rounds (a bounded per-host groupBy —
    rounds are dozens, not data-sized) and the whole trajectory is a
    single JVM ``aggregate`` lambda over that array — no per-round
    joins, no window, no Python. The oracle unrolls the same
    recurrence as one CTE per round.

    Output: ``(host, round, err int, rate_micro)`` for every round —
    rate_micro is the rate AFTER the round's update.
    """
    base = events.select(
        F.col(host_col).alias("host"),
        F.col(round_col).cast("int").alias("r"),
        F.col(err_col).cast("boolean").alias("e"),
    )
    # The host UNIVERSE comes from ALL observations — a host whose
    # every event falls outside [0, n_rounds) still gets its
    # documented all-clean additive trajectory (the window filter
    # below only scopes which rounds can carry errors).
    hosts = base.select("host").distinct()
    errs = (
        base.where((F.col("r") >= 0) & (F.col("r") < n_rounds))
        .groupBy("host", "r")
        .agg(F.max(F.col("e").cast("int")).alias("e"))
    )
    emap = errs.groupBy("host").agg(
        F.map_from_arrays(
            F.collect_list("r"), F.collect_list("e")
        ).alias("_m")
    )
    dense = hosts.join(emap, "host", "left").select(
        "host",
        F.transform(
            F.sequence(F.lit(0), F.lit(n_rounds - 1)),
            # try_element_at: a missing round (or a host with NO
            # in-window rounds, _m NULL) is clean — ANSI element_at
            # would THROW on the missing key instead.
            lambda r: F.coalesce(
                F.try_element_at(F.col("_m"), r), F.lit(0)
            ),
        ).alias("_errs"),
    )
    # fold: accumulator is the rate trajectory array (element 1 = r0)
    traj = dense.select(
        "host",
        "_errs",
        F.aggregate(
            F.col("_errs"),
            F.array(F.lit(r0_micro).cast("long")),
            lambda acc, e: F.concat(
                acc,
                F.array(
                    F.when(
                        e == 1,
                        F.greatest(
                            F.lit(floor_micro).cast("long"),
                            F.floor(
                                F.element_at(acc, -1)
                                * F.lit(mult_num)
                                / F.lit(mult_den)
                            ).cast("long"),
                        ),
                    ).otherwise(
                        F.element_at(acc, -1) + F.lit(add_micro)
                    )
                ),
            ),
        ).alias("_traj"),
    )
    return (
        traj.withColumn(
            "_rates", F.slice(F.col("_traj"), 2, n_rounds)
        )
        .select(
            "host",
            F.posexplode(
                F.arrays_zip(F.col("_errs"), F.col("_rates"))
            ).alias("round", "_z"),
        )
        .select(
            "host",
            F.col("round").cast("int"),
            F.col("_z._errs").cast("int").alias("err"),
            F.col("_z._rates").alias("rate_micro"),
        )
    )
