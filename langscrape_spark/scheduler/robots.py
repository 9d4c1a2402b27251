"""robots.txt parsing as a relational plan — raw fetched robots bodies
→ the per-host policy table the scheduler joins
(``host, disallow_prefixes, rules, sitemaps, crawl_delay, allowed`` —
the shape ``frontier._with_policy_columns`` consumes; legacy tables
without ``rules`` keep the prefix gate).

The reference never parses robots (its per-URL LLM loop has no
politeness layer; SURVEY §2.1 notes the gap), but a 10^10-URL frontier
fetches robots bodies like any other page and must turn them into
join-able rules. Grammar: the REP (RFC 9309) subset that drives this
scheduler — ``User-agent`` groups (consecutive UA lines share one
group), ``Disallow``/``Allow`` path rules with REP wildcards (``*``
matches any character run, a trailing ``$`` anchors the path end),
``Crawl-delay`` seconds, ``#`` comments, case-insensitive directives;
rules are taken from every group whose agents include ``*``. Matching
follows RFC 9309 §2.2.2: the rule whose pattern has the most octets
wins; an Allow/Disallow tie goes to Allow; no match = allowed
(:func:`robots_decision`).

Plan shape: explode lines → per-host window (gaps-and-islands for UA
group ids: a group id increments at each UA-run START, so rule lines
inherit the id of the UA block above them) → semi-join on the ``*``
groups → one per-host aggregation. Robots files are tiny (the window
partition is one file's lines); hosts scale horizontally. Everything
is split/regexp/window built-ins — no UDFs — and reproducible in ANSI
SQL (oracles q45/q46).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_UA_RE = r"(?i)^user-agent\s*:\s*(.*?)\s*$"
_DIS_RE = r"(?i)^disallow\s*:\s*(\S*)"
_ALLOW_RE = r"(?i)^allow\s*:\s*(\S*)"
_DELAY_RE = r"(?i)^crawl-delay\s*:\s*([0-9.]+)"
_SITEMAP_RE = r"(?i)^sitemap\s*:\s*(\S+)"

RULES_TYPE = (
    "array<struct<pattern:string,regex:string,allow:boolean,"
    "rlen:int,wild:boolean>>"
)


def _rule_regex(p: Column) -> Column:
    """robots path pattern → anchored Java regex: ``*`` matches any
    character run, a TRAILING ``$`` anchors the path end, every other
    character is literal (non-trailing ``$`` included)."""
    anchored = F.endswith(p, F.lit("$"))
    body = F.when(anchored, F.substr(p, F.lit(1), F.length(p) - 1)).otherwise(p)
    esc = F.regexp_replace(body, r"([.^+?(){}\[\]|\\$])", r"\\$1")
    stars = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(
        F.lit("^"), stars, F.when(anchored, F.lit("$")).otherwise(F.lit(""))
    )


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
    # RFC 9309 grammar: only DIRECTIVE lines participate in grouping —
    # blank lines, comments-only lines and unknown directives (Host:,
    # Clean-param:, …) are "lines not part of the grammar" and MUST NOT
    # end a User-agent run (the RFC ABNF allows emptyline between
    # startgrouplines; real files stack UA lines around junk). The
    # pandas parser (sources/robots.py) ignores those lines the same
    # way, so the two parsers group identically.
    lines = lines.where(
        F.col("line").rlike(
            r"(?i)^(user-agent|disallow|allow|crawl-delay|sitemap)\s*:"
        )
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
    alw = F.regexp_extract("line", _ALLOW_RE, 1)
    delay = F.regexp_extract("line", _DELAY_RE, 1)
    is_dis = F.col("line").rlike(r"(?i)^disallow\s*:")
    is_alw = F.col("line").rlike(r"(?i)^allow\s*:") & ~is_dis
    pat = F.when(is_dis, dis).otherwise(alw)
    agg = rules.groupBy("host").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        is_dis & (dis != ""),
                        F.struct(F.col("idx").alias("idx"), dis.alias("p")),
                    )
                )
            ),
            lambda s: s["p"],
        ).alias("disallow_prefixes"),
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.when(
                        (is_dis & (dis != "")) | (is_alw & (alw != "")),
                        F.struct(
                            F.col("idx").alias("idx"),
                            pat.alias("pattern"),
                            is_alw.alias("a"),
                        ),
                    )
                )
            ),
            lambda s: F.struct(
                s["pattern"].alias("pattern"),
                _rule_regex(s["pattern"]).alias("regex"),
                s["a"].alias("allow"),
                F.length(s["pattern"]).cast("int").alias("rlen"),
                (
                    s["pattern"].contains("*")
                    | F.endswith(s["pattern"], F.lit("$"))
                ).alias("wild"),
            ),
        ).alias("rules"),
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
    # Sitemap lines are group-INDEPENDENT (RFC 9309 §2.4): collected
    # from every line of the file, not just the * groups — a separate
    # host-keyed aggregation joined back in (robots tables are tiny).
    smaps = (
        lines.where(F.col("line").rlike(_SITEMAP_RE))
        .groupBy("host")
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            F.col("idx").alias("idx"),
                            F.regexp_extract("line", _SITEMAP_RE, 1).alias("u"),
                        )
                    )
                ),
                lambda s: s["u"],
            ).alias("sitemaps")
        )
    )
    return (
        df.select(F.col(host_col).alias("host"))
        .distinct()
        .join(agg, "host", "left")
        .join(smaps, "host", "left")
        .select(
            "host",
            F.coalesce(
                "disallow_prefixes", F.array().cast("array<string>")
            ).alias("disallow_prefixes"),
            F.coalesce("rules", F.array().cast(RULES_TYPE)).alias("rules"),
            F.coalesce("sitemaps", F.array().cast("array<string>")).alias(
                "sitemaps"
            ),
            F.col("crawl_delay"),
            (
                ~F.coalesce(
                    F.array_contains("disallow_prefixes", "/"), F.lit(False)
                )
            ).alias("allowed"),
        )
    )


def robots_decision_detail(path: Column, rules: Column) -> Column:
    """RFC 9309 §2.2.2 longest-match decision as one codegen fold,
    returning ``struct<rlen:int, allow:boolean>`` — the winning rule's
    pattern length (−1 when no rule matches) and the verdict: among the
    rules whose pattern matches ``path``, the one with the most pattern
    octets wins; an Allow/Disallow tie goes to Allow; no matching rule
    (or no rules at all) = allowed.

    Plain prefix rules (``wild`` false — the overwhelming majority in
    real robots files) match via ``startswith`` and stay inside
    whole-stage codegen; only wildcard/anchored patterns pay the
    per-row ``regexp_like``. The fold scans each host's rule array once
    per URL — rule arrays are tens of entries, so this is arithmetic,
    not a join. Python mirror: ``policy.robots_decision_py``."""
    init = F.struct(
        F.lit(-1).alias("rlen"), F.lit(True).alias("allow")
    )

    def step(acc: Column, r: Column) -> Column:
        # empty patterns never match (both parsers filter them out, but
        # a hand-built rules array must not turn '' into a
        # match-everything rlen-0 rule — the Python mirror skips them)
        m = (F.coalesce(r["rlen"], F.lit(0)) > 0) & F.when(
            r["wild"], F.regexp_like(path, r["regex"])
        ).otherwise(path.startswith(r["pattern"]))
        better = (r["rlen"] > acc["rlen"]) | (
            (r["rlen"] == acc["rlen"]) & r["allow"]
        )
        return F.when(
            m & better,
            F.struct(r["rlen"].alias("rlen"), r["allow"].alias("allow")),
        ).otherwise(acc)

    return F.aggregate(F.coalesce(rules, F.array().cast(RULES_TYPE)), init, step)


def robots_decision(path: Column, rules: Column) -> Column:
    """The boolean verdict of :func:`robots_decision_detail`."""
    return robots_decision_detail(path, rules)["allow"]
