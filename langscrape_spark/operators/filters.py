"""Domain-blocklist and badword page filtering.

Two standard web-corpus curation gates the reference applies implicitly
through its curated seed lists (``langscrape``'s Excel frontier is
hand-vetted; at crawl scale the vetting becomes data):

- **Domain blocklists** (UT1/Toulouse-style): a list of blocked
  registrable domains where a host is blocked when it *equals* an entry
  or is a *subdomain* of one (``ads.example.com`` matches entry
  ``example.com``). C4, RefinedWeb and FineWeb all apply such a list.
- **Badword filtering** (C4 §2.2's "List of Dirty, Naughty …" gate):
  token hits against a wordlist; C4 hard-drops any page with a hit,
  softer pipelines gate on the hit *ratio*.

Scale shape (100 TB): suffix matching is an equi-join, never a
``LIKE``/regex cross-join — each host explodes into its ~3-6 label
suffixes and hash-joins the broadcast blocklist (UT1 lists are ~10^6
rows ≈ tens of MB). Longest-suffix (most-specific) wins via a
``max_by`` agg. Badword counting is one token explode + broadcast
join + per-doc count — both paths reduce with map-side partial
aggregation, so the only shuffle is docs-sized (~1 row/doc/partition).
Pure built-ins; no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .text import words_col


def host_suffix_chain(host: Column) -> Column:
    """``a.b.c`` -> ``['a.b.c', 'b.c', 'c']`` — every suffix a
    blocklist entry could match. Userinfo and an explicit port are
    stripped first (``url_host``/netloc producers keep them; a
    blocklist entry must still match ``ads.example.com:8080``).
    Empty/NULL hosts yield their literal single-element chain (no
    match unless the blocklist contains it)."""
    bare = F.regexp_replace(
        F.regexp_replace(host, r"^[^/@]*@", ""), r":\d+$", ""
    )
    parts = F.split(bare, r"\.")
    n = F.size(parts)
    return F.transform(
        F.sequence(F.lit(1), n), lambda i: F.array_join(F.slice(parts, i, n), ".")
    )


def blocklist_match(
    docs: DataFrame,
    blocklist: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
) -> DataFrame:
    """Per-doc blocklist verdict: ``(id, blocked_domain)`` where
    ``blocked_domain`` is the MOST SPECIFIC (longest; ties impossible —
    equal-length suffixes of one host are equal) matching entry of
    ``blocklist`` (column ``domain``), NULL when the host is clean.

    Every input row comes back exactly once (left join on the match
    table), so composing with the source frame is a plain equi-join.
    """
    sfx = docs.select(
        F.col(id_col),
        F.explode(host_suffix_chain(F.col(host_col))).alias("sfx"),
    )
    hits = (
        sfx.join(
            F.broadcast(blocklist.select(F.col("domain").alias("sfx"))),
            "sfx",
        )
        .groupBy(id_col)
        .agg(F.max_by("sfx", F.length("sfx")).alias("blocked_domain"))
    )
    return docs.select(id_col).join(hits, id_col, "left")


def badword_stats(
    docs: DataFrame,
    badwords: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per-doc ``(id, n_tokens, n_badwords, badword_ratio)`` — token
    hits against the broadcast wordlist (column ``word``, matched on
    the lowercased whitespace tokens, occurrence multiplicity).
    Token-less docs get ratio NULL (``try_divide``), not a throw."""
    toks = docs.select(
        F.col(id_col),
        F.explode_outer(words_col(F.col(text_col))).alias("tok"),
    )
    # real wordlists carry duplicates after lowercasing/merging — a
    # duplicate entry must not fan the left join out (it would inflate
    # n_tokens AND n_badwords).
    marked = toks.join(
        F.broadcast(
            badwords.select(F.col("word").alias("tok"))
            .distinct()
            .withColumn("hit", F.lit(1))
        ),
        "tok",
        "left",
    )
    return marked.groupBy(id_col).agg(
        F.count("tok").alias("n_tokens"),
        F.count("hit").alias("n_badwords"),
        F.try_divide(F.count("hit"), F.count("tok")).alias("badword_ratio"),
    )


def page_filter(
    docs: DataFrame,
    blocklist: DataFrame,
    badwords: DataFrame,
    id_col: str = "doc_id",
    host_col: str = "host",
    text_col: str = "text",
    max_badword_ratio: float = 0.0,
) -> DataFrame:
    """The composed curation gate: one row per input doc with
    ``blocked_domain``, badword stats, and
    ``keep = (not blocked) and badword_ratio <= max_badword_ratio``
    (token-less docs have no ratio and pass the badword gate —
    the length gates elsewhere own them). ``max_badword_ratio=0.0``
    is C4's hard drop-on-any-hit."""
    b = blocklist_match(docs, blocklist, id_col, host_col)
    w = badword_stats(docs, badwords, id_col, text_col)
    out = docs.select(id_col, host_col).join(b, id_col).join(w, id_col)
    return out.withColumn(
        "keep",
        F.col("blocked_domain").isNull()
        & (
            F.coalesce(F.col("badword_ratio"), F.lit(0.0))
            <= F.lit(max_badword_ratio)
        ),
    )


def curation_funnel(docs: DataFrame, gates) -> DataFrame:
    """Sequential-gate attrition report — the dashboard every curation
    pipeline publishes (C4/RefinedWeb/FineWeb all report per-filter
    document kill rates): ``gates`` is an ordered list of ``(name,
    boolean Column)`` keep-predicates; a document is killed by the
    FIRST gate it fails (NULL predicate = fail, conservatively), so
    the report reads as a funnel: ``(stage, gate, n_in, n_killed,
    n_out, kill_rate)``.

    Scale shape: ONE corpus pass — every predicate is evaluated as a
    column and collapsed to a first-failing-gate index, so adding
    gates never adds passes; the funnel arithmetic (cumulative kills,
    per-stage inflow) runs on the gates-sized frame with a window,
    and the corpus total rides a 1-row broadcast crossJoin. No
    driver collects. Gates may contain window expressions (e.g. a
    duplicate-winner rank) — they fold into the same pass.
    """
    from pyspark.sql import Window

    from .text import first_fail_index

    spark = docs.sparkSession
    n = len(gates)
    ff = first_fail_index([g for _, g in gates]).alias("ff")
    counts = docs.select(ff).groupBy("ff").agg(
        F.count(F.lit(1)).alias("killed")
    )
    total = counts.agg(F.sum("killed").alias("_total"))
    gates_dim = spark.createDataFrame(
        [(i, name) for i, (name, _) in enumerate(gates)],
        "stage int, gate string",
    )
    w_before = (
        Window.orderBy("stage")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    per_gate = (
        gates_dim.join(
            counts.withColumnRenamed("ff", "stage"), "stage", "left"
        )
        .select(
            "stage",
            "gate",
            F.coalesce("killed", F.lit(0)).cast("long").alias("n_killed"),
        )
        .crossJoin(F.broadcast(total))
        .withColumn(
            "n_in",
            (
                F.col("_total")
                - F.coalesce(
                    F.sum("n_killed").over(w_before), F.lit(0)
                )
            ).cast("long"),
        )
    )
    return per_gate.select(
        "stage",
        "gate",
        "n_in",
        "n_killed",
        (F.col("n_in") - F.col("n_killed")).cast("long").alias("n_out"),
        F.round(
            F.try_divide(F.col("n_killed"), F.col("n_in")), 6
        ).alias("kill_rate"),
    ).orderBy("stage")
