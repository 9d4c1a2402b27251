"""robots.txt parsing as a relational plan — raw fetched robots bodies
→ the per-host policy table the scheduler joins
(``host, disallow_prefixes, crawl_delay, allowed`` — the exact shape
``synth.robots_df`` / ``frontier._with_policy_columns`` consume).

The reference never parses robots (its per-URL LLM loop has no
politeness layer; SURVEY §2.1 notes the gap), but a 10^10-URL frontier
fetches robots bodies like any other page and must turn them into
join-able rules. Grammar: the REP (RFC 9309) subset that drives this
scheduler — ``User-agent`` groups (consecutive UA lines share one
group), ``Disallow`` path prefixes, ``Crawl-delay`` seconds, ``#``
comments, case-insensitive directives; rules are taken from every
group whose agents include ``*``. Unsupported REP extras (Allow
precedence, wildcards inside paths) are documented non-goals — the
scheduler's prefix gate (`policy.py`) has no use for them yet.

Plan shape: explode lines → per-host window (gaps-and-islands for UA
group ids: a group id increments at each UA-run START, so rule lines
inherit the id of the UA block above them) → semi-join on the ``*``
groups → one per-host aggregation. Robots files are tiny (the window
partition is one file's lines); hosts scale horizontally. Everything
is split/regexp/window built-ins — no UDFs — and reproducible in ANSI
SQL (oracle q45).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_UA_RE = r"(?i)^user-agent\s*:\s*(.*?)\s*$"
_DIS_RE = r"(?i)^disallow\s*:\s*(\S*)"
_DELAY_RE = r"(?i)^crawl-delay\s*:\s*([0-9.]+)"


def parse_robots_txt(
    df: DataFrame, host_col: str = "host", text_col: str = "robots_txt"
) -> DataFrame:
    """One row per input host: ``(host, disallow_prefixes, crawl_delay,
    allowed)``. ``disallow_prefixes`` keeps file order (minus empty
    ``Disallow:`` lines, which mean allow-all); ``crawl_delay`` is the
    first PARSEABLE delay in a ``*`` group (NULL when absent — the
    policy layer defaults it; malformed values like ``Crawl-delay:
    abc`` or ``1.2.3`` are skipped via ``try_cast``, never thrown on —
    one bad robots body among millions must not kill the policy job
    under Spark 4 ANSI mode); ``allowed`` is False iff ``/`` is
    disallowed.
    Hosts without a ``*`` group (or with empty/absent files) come back
    fully allowed with no prefixes."""
    lines = df.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.coalesce(F.col(text_col), F.lit("")), "\n")).alias(
            "idx", "raw"
        ),
    ).select(
        "host",
        "idx",
        F.regexp_replace(F.regexp_replace("raw", "#.*$", ""), r"^\s+|\s+$", "").alias(
            "line"
        ),
    )
    is_ua = F.col("line").rlike(r"(?i)^user-agent\s*:")
    w = Window.partitionBy("host").orderBy("idx")
    # gaps-and-islands: +1 at the START of each consecutive UA run, so
    # a group's UA lines AND the rule lines below them share one id
    lines = lines.withColumn(
        "block",
        F.sum(
            F.when(
                is_ua & ~F.coalesce(F.lag(is_ua).over(w), F.lit(False)), 1
            ).otherwise(0)
        ).over(w),
    ).withColumn("is_ua", is_ua)
    star_blocks = (
        lines.where(
            F.col("is_ua")
            & (F.regexp_extract("line", _UA_RE, 1) == "*")
        )
        .select("host", "block")
        .distinct()
    )
    rules = lines.where(~F.col("is_ua")).join(star_blocks, ["host", "block"])
    dis = F.regexp_extract("line", _DIS_RE, 1)
    delay = F.regexp_extract("line", _DELAY_RE, 1)
    agg = rules.groupBy("host").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        F.col("line").rlike(r"(?i)^disallow\s*:") & (dis != ""),
                        F.struct(F.col("idx").alias("idx"), dis.alias("p")),
                    )
                )
            ),
            lambda s: s["p"],
        ).alias("disallow_prefixes"),
        F.min(
            F.when(
                F.col("line").rlike(r"(?i)^crawl-delay\s*:")
                & delay.try_cast("double").isNotNull(),
                F.struct(F.col("idx").alias("idx"), delay.alias("d")),
            )
        )["d"]
        .try_cast("double")
        .alias("crawl_delay"),
    )
    return (
        df.select(F.col(host_col).alias("host"))
        .distinct()
        .join(agg, "host", "left")
        .select(
            "host",
            F.coalesce(
                "disallow_prefixes", F.array().cast("array<string>")
            ).alias("disallow_prefixes"),
            F.col("crawl_delay"),
            (
                ~F.coalesce(
                    F.array_contains("disallow_prefixes", "/"), F.lit(False)
                )
            ).alias("allowed"),
        )
    )
