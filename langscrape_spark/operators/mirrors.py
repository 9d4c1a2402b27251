"""Duplicate-URL-structure mining for the crawl frontier: mirror-host
detection, DUST-style rewrite-rule mining and query-parameter
content-significance.

A web-scale crawl wastes its fetch budget twice — once on mirrored
hosts serving byte-identical trees (ftp/www mirrors, CDN vanity
domains) and once on URL *spellings* of pages it already has (session
ids, tracking params, print views). The reference scrapes a curated
seed list so it never meets either problem
(`/root/reference/scripts/run.py:53-55` reads the list verbatim); at a
10^10-URL frontier both are first-order budget sinks, so this module
adds the three classic batch miners whose outputs feed
:func:`langscrape_spark.operators.urls.trap_filter`-style admission
gates:

- :func:`mirror_hosts` — Bharat & Broder, "Mirror, mirror on the Web"
  (WWW 1999): host pairs sharing many identical (path, content
  fingerprint) cells.
- :func:`dust_rules` — Bar-Yossef, Keidar & Schonfeld, "Do Not Crawl
  in the DUST: Different URLs with Similar Text" (WWW 2007): URL
  rewrite rules mined from same-content URL pairs, templated at the
  token level so one rule covers every spelling.
- :func:`param_significance` — the DustBuster parameter-substitution
  special case: per query-parameter, does the value ever change
  content when everything else about the URL is held fixed?

All three are pure DataFrame compositions — hash aggregations and
equi-key self-joins with explicit hot-key caps, no UDFs, no global
windows, no driver collects — so they hold their shape at 100 TB.
Every float-free output column is integer (micro-units for ratios),
making the results bit-reproducible against an independent ANSI-SQL
derivation (oracles q165/q166/q167).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["mirror_hosts", "dust_rules", "param_significance", "url_tokens"]


def _tmpl(c: Column) -> Column:
    """Token templating shared with urls.url_template: lowercase, long
    hex runs (>=8: ids, session tokens) -> ``<H>`` FIRST, then digit
    runs -> ``<N>`` (hex-before-digit or ``deadbeef123`` tears)."""
    return F.regexp_replace(
        F.regexp_replace(F.lower(c), r"[0-9a-f]{8,}", "<H>"),
        r"[0-9]+",
        "<N>",
    )


def url_tokens(url: Column) -> Column:
    """A url's sorted DISTINCT token set: path segments as
    ``p:<templated segment>`` plus query parameters as
    ``q:<templated param>``. Two spellings of the same page generator
    differ only in the tokens their rewrite rule touches, so
    ``array_except`` of two token sets IS the rule candidate —
    the representation :func:`dust_rules` pairs on.

    Pure codegen: try_parse_url + split + higher-order transform/filter
    (JVM-side lambdas, not Python UDFs)."""
    path = F.coalesce(F.try_parse_url(url, F.lit("PATH")), F.lit(""))
    query = F.coalesce(F.try_parse_url(url, F.lit("QUERY")), F.lit(""))
    p_toks = F.transform(
        F.filter(F.split(path, "/"), lambda x: x != F.lit("")),
        lambda x: F.concat(F.lit("p:"), _tmpl(x)),
    )
    q_toks = F.transform(
        F.filter(F.split(query, "&"), lambda x: x != F.lit("")),
        lambda x: F.concat(F.lit("q:"), _tmpl(x)),
    )
    return F.array_sort(F.array_distinct(F.concat(p_toks, q_toks)))


def mirror_hosts(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    max_key_df: int = 32,
    min_shared: int = 5,
    min_score_micro: int = 500_000,
) -> DataFrame:
    """Bharat-Broder mirror-host detection: two hosts are mirror
    candidates when they share many identical ``(path, content
    fingerprint)`` cells. Input is one row per fetched page —
    ``(url, fp)`` where ``fp`` is any content fingerprint (md5 of the
    extracted text, a simhash, ...).

    Pipeline (every stage an equi-key shuffle, skew-guarded):

    1. distinct ``(host, path, fp)`` triples — a host refetched 50x
       counts once.
    2. hot-key cap: a ``(path, fp)`` cell served by more than
       ``max_key_df`` hosts (the empty 404 body, a shared ``/robots
       .txt``, boilerplate parking pages) is DROPPED before pairing —
       the same df-cap that keeps the n-gram Jaccard join linear
       (operators/dedup.py): without it one universal cell emits
       |hosts|^2 pairs.
    3. pair generation: self-join WITHIN the surviving cells on
       ``host_a < host_b`` — pairs only materialize for hosts that
       actually share content, never all-pairs.
    4. per-host sizes count POST-cap triples, so the score's
       denominator and numerator see the same universe.

    ``score_micro = (shared * 1_000_000) div min(n_a, n_b)`` — the
    Bharat-Broder containment ratio in exact integer micro-units
    (``is_mirror`` when ``shared >= min_shared`` and ``score_micro >=
    min_score_micro``). Integer throughout: bit-reproducible in ANSI
    SQL (oracle q165).

    Returns ``(host_a, host_b, shared, n_a, n_b, score_micro,
    is_mirror)``.
    """
    u = F.col(url_col)
    triples = (
        df.select(
            F.lower(F.try_parse_url(u, F.lit("HOST"))).alias("host"),
            F.coalesce(
                F.nullif(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
                F.lit("/"),
            ).alias("path"),
            F.col(fp_col).alias("fp"),
        )
        .where(F.col("host").isNotNull())
        .distinct()
    )
    cell_df = triples.groupBy("path", "fp").agg(
        F.count(F.lit(1)).alias("_df")
    )
    kept = triples.join(
        cell_df.where(F.col("_df") <= F.lit(max_key_df)).select(
            "path", "fp"
        ),
        ["path", "fp"],
    )
    sizes = kept.groupBy("host").agg(F.count(F.lit(1)).alias("n"))
    a = kept.select("path", "fp", F.col("host").alias("host_a"))
    b = kept.select("path", "fp", F.col("host").alias("host_b"))
    pairs = (
        a.join(b, ["path", "fp"])
        .where(F.col("host_a") < F.col("host_b"))
        .groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    out = (
        pairs.join(
            sizes.select(
                F.col("host").alias("host_a"), F.col("n").alias("n_a")
            ),
            "host_a",
        )
        .join(
            sizes.select(
                F.col("host").alias("host_b"), F.col("n").alias("n_b")
            ),
            "host_b",
        )
    )
    score = F.expr("(shared * 1000000) div least(n_a, n_b)")
    return out.select(
        "host_a",
        "host_b",
        "shared",
        "n_a",
        "n_b",
        score.alias("score_micro"),
        (
            (F.col("shared") >= F.lit(min_shared))
            & (score >= F.lit(min_score_micro))
        )
        .cast("int")
        .alias("is_mirror"),
    )


def dust_rules(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
    max_group: int = 64,
    min_support: int = 3,
    min_contents: int = 2,
) -> DataFrame:
    """DUST rewrite-rule mining (Bar-Yossef et al., WWW 2007): from
    pairs of URLs on the SAME host with the SAME content fingerprint,
    derive the templated token substitution that maps one spelling to
    the other, then keep rules supported by many pairs across many
    DISTINCT contents — the generalization gate that separates a real
    rewrite rule ("drop ``sid=<N>``") from a coincidence on one page.

    Rule candidate for a pair ``u1 < u2`` (lexicographic, so each
    unordered pair is counted once and the direction is
    deterministic): ``lhs = tokens(u1) \\ tokens(u2)``,
    ``rhs = tokens(u2) \\ tokens(u1)`` with :func:`url_tokens`
    templating — two session-id spellings collapse to the SAME
    ``q:sid=<N>`` token, so their pair yields the empty rule and is
    dropped, while ``...?sid=123`` vs the clean URL yields
    ``q:sid=<N> => ``.

    Scale shape: pairing joins WITHIN ``(host, fp)`` groups only, and
    any group with more than ``max_group`` distinct spellings is
    dropped whole (deterministic df-cap, same policy as the n-gram
    shingle cap) — a pathological page with 10^6 spellings would emit
    10^12 pairs and teaches nothing a 64-spelling group doesn't. Token
    sets are computed ONCE per distinct URL, before pairing. At
    100 TB the (host, fp) key is the natural bucket: no global
    window, no driver collect.

    Returns ``(lhs, rhs, support, n_contents, valid)`` with the token
    arrays rendered ``'|'``-joined for cross-engine comparison.
    """
    u = F.col(url_col)
    urls = (
        df.select(
            F.lower(F.try_parse_url(u, F.lit("HOST"))).alias("host"),
            F.col(fp_col).alias("fp"),
            u.alias("url"),
        )
        .where(F.col("host").isNotNull())
        .distinct()
    )
    gsz = urls.groupBy("host", "fp").agg(F.count(F.lit(1)).alias("_n"))
    kept = urls.join(
        gsz.where(F.col("_n") <= F.lit(max_group)).select("host", "fp"),
        ["host", "fp"],
    ).select("host", "fp", "url", url_tokens(F.col("url")).alias("toks"))
    a = kept.select(
        "host", "fp", F.col("url").alias("u1"), F.col("toks").alias("t1")
    )
    b = kept.select(
        "host", "fp", F.col("url").alias("u2"), F.col("toks").alias("t2")
    )
    pairs = a.join(b, ["host", "fp"]).where(F.col("u1") < F.col("u2"))
    lhs = F.concat_ws(
        "|", F.array_sort(F.array_except(F.col("t1"), F.col("t2")))
    )
    rhs = F.concat_ws(
        "|", F.array_sort(F.array_except(F.col("t2"), F.col("t1")))
    )
    ruled = pairs.select(
        lhs.alias("lhs"), rhs.alias("rhs"), "fp"
    ).where((F.col("lhs") != F.lit("")) | (F.col("rhs") != F.lit("")))
    agg = ruled.groupBy("lhs", "rhs").agg(
        F.count(F.lit(1)).alias("support"),
        F.countDistinct("fp").alias("n_contents"),
    )
    return agg.select(
        "lhs",
        "rhs",
        "support",
        "n_contents",
        (
            (F.col("support") >= F.lit(min_support))
            & (F.col("n_contents") >= F.lit(min_contents))
        )
        .cast("int")
        .alias("valid"),
    )


def param_significance(
    df: DataFrame,
    url_col: str = "url",
    fp_col: str = "fp",
) -> DataFrame:
    """Per-query-parameter content significance: holding the rest of
    the URL fixed (host, path, every OTHER parameter), does varying
    this parameter's value ever change the fetched content? A
    parameter whose value never matters (``jsessionid``, ``utm_*``,
    affiliate tags) can be stripped at admission time — the highest-
    yield DUST special case, and the one DustBuster validates first.

    For each parameter occurrence the context key is ``(host, path,
    sorted other-params)``; per ``(context, param key)`` group we
    count distinct values and distinct fingerprints, then roll up per
    ``(host, key)``:

    - ``n_groups``   — contexts where the key appears,
    - ``n_multi``    — contexts with >= 2 distinct values (the only
      ones carrying evidence),
    - ``n_varying``  — evidence contexts where content also varied.

    ``verdict``: ``no_evidence`` (no multi-value context),
    ``content_irrelevant`` (evidence never varies content — strip
    it), ``content_significant`` (always varies), ``mixed``.

    Scale shape: one explode (x avg params/url, bounded small), two
    hash aggregations keyed by URL structure — no windows, no pair
    joins, no caps needed: group cardinality is bounded by distinct
    URL contexts, not by corpus size. All counts integer-exact
    (oracle q167).

    Returns ``(host, key, n_groups, n_multi, n_varying, verdict)``.
    """
    u = F.col(url_col)
    parsed = df.select(
        F.lower(F.try_parse_url(u, F.lit("HOST"))).alias("host"),
        F.coalesce(
            F.nullif(F.try_parse_url(u, F.lit("PATH")), F.lit("")),
            F.lit("/"),
        ).alias("path"),
        F.filter(
            F.split(
                F.coalesce(F.try_parse_url(u, F.lit("QUERY")), F.lit("")),
                "&",
            ),
            lambda x: x != F.lit(""),
        ).alias("params"),
        F.col(fp_col).alias("fp"),
    ).where(F.col("host").isNotNull())
    ex = parsed.select(
        "host",
        "path",
        "params",
        "fp",
        F.explode("params").alias("param"),
    ).select(
        "host",
        "path",
        "fp",
        F.regexp_extract("param", r"^([^=]*)", 1).alias("key"),
        F.regexp_extract("param", r"^[^=]*=(.*)$", 1).alias("value"),
        F.concat_ws(
            "&",
            F.array_sort(
                F.filter(
                    F.col("params"),
                    lambda x: F.regexp_extract(x, r"^([^=]*)", 1)
                    != F.regexp_extract(F.col("param"), r"^([^=]*)", 1),
                )
            ),
        ).alias("others"),
    )
    per_ctx = ex.groupBy("host", "path", "others", "key").agg(
        F.countDistinct("value").alias("n_vals"),
        F.countDistinct("fp").alias("n_fps"),
    )
    rolled = per_ctx.groupBy("host", "key").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum((F.col("n_vals") > 1).cast("long")).alias("n_multi"),
        F.sum(
            ((F.col("n_vals") > 1) & (F.col("n_fps") > 1)).cast("long")
        ).alias("n_varying"),
    )
    verdict = (
        F.when(F.col("n_multi") == 0, F.lit("no_evidence"))
        .when(F.col("n_varying") == 0, F.lit("content_irrelevant"))
        .when(
            F.col("n_varying") == F.col("n_multi"),
            F.lit("content_significant"),
        )
        .otherwise(F.lit("mixed"))
    )
    return rolled.select(
        "host",
        "key",
        "n_groups",
        "n_multi",
        "n_varying",
        verdict.alias("verdict"),
    )


def apply_dust_rules(
    df: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    max_rules: int = 256,
) -> DataFrame:
    """Apply mined :func:`dust_rules` to canonicalize a URL corpus —
    the second half of the Bar-Yossef pipeline: mining finds "these
    spellings are the same page", application COLLAPSES the frontier
    so the crawler stops re-fetching sid= clones.

    Only DELETION rules are applied (``rhs = ''``, or the mirrored
    ``lhs = ''`` whose extra tokens sit on the u2 side): strip the
    rule's templated tokens from any URL whose token set contains
    them. Substitution rules are reported by the miner but not
    applied — a token-set rewrite cannot faithfully reconstruct the
    substituted URL string, and deletions are the overwhelming DUST
    class (session ids, tracking params). All matching deletions
    apply (set subtraction is order-free, so the result is
    deterministic without a rule-priority contract).

    Scale shape: the VALID rule table is bounded (it came out of the
    miner's support gates — ``max_rules`` guards the broadcast);
    application is one broadcast nested join of distinct urls ×
    rules with a subset filter, then a per-url union of matched strip
    sets (collect bounded by rule count) and one array_except. The
    url side never shuffles on anything but its own distinct.

    Returns one row per DISTINCT input url:
    ``(url, host, n_rules, canon)``. ``canon`` is rebuilt from the
    RAW url — host + path segments whose templated token survived
    (original order) + '?' + the sorted surviving raw query params —
    because rules live in TEMPLATED token space (``q:sid=<N>``) while
    identity lives in the raw spelling: stripping must remove ``?sid=
    1007`` from THIS url without collapsing ``/item/7`` and
    ``/item/8`` (both ``p:<N>``) into one key. Urls sharing a
    ``canon`` are the same page under the mined rules.
    """
    strip_arr = F.when(
        F.col("rhs") == "", F.split(F.col("lhs"), "\\|")
    ).otherwise(F.split(F.col("rhs"), "\\|"))
    dels = (
        rules.where(F.col("valid") == 1)
        .where((F.col("rhs") == "") | (F.col("lhs") == ""))
        .select(strip_arr.alias("strip"))
        .distinct()
    )
    n_rules = dels.count()
    if n_rules > max_rules:
        raise ValueError(
            f"apply_dust_rules: {n_rules} deletion rules exceed "
            f"max_rules={max_rules} — raise the miner's support gates"
        )
    u = F.col(url_col)
    path = F.coalesce(F.try_parse_url(F.col("url"), F.lit("PATH")), F.lit(""))
    query = F.coalesce(
        F.try_parse_url(F.col("url"), F.lit("QUERY")), F.lit("")
    )
    urls = (
        df.select(u.alias("url"))
        .distinct()
        .select(
            "url",
            F.lower(F.try_parse_url(F.col("url"), F.lit("HOST"))).alias(
                "host"
            ),
            url_tokens(F.col("url")).alias("toks"),
            F.filter(F.split(path, "/"), lambda x: x != F.lit("")).alias(
                "p_raw"
            ),
            F.filter(F.split(query, "&"), lambda x: x != F.lit("")).alias(
                "q_raw"
            ),
        )
    )
    matched = (
        urls.select("url", "toks")
        .crossJoin(F.broadcast(dels))
        .where(F.size(F.array_except(F.col("strip"), F.col("toks"))) == 0)
        .groupBy("url")
        .agg(
            F.count(F.lit(1)).alias("n_rules"),
            F.array_distinct(
                F.flatten(F.collect_list("strip"))
            ).alias("all_strip"),
        )
    )
    joined = urls.join(matched, "url", "left").withColumn(
        "all_strip",
        F.coalesce(F.col("all_strip"), F.array().cast("array<string>")),
    )
    surv_p = F.filter(
        F.col("p_raw"),
        lambda x: ~F.array_contains(
            F.col("all_strip"), F.concat(F.lit("p:"), _tmpl(x))
        ),
    )
    surv_q = F.array_sort(
        F.filter(
            F.col("q_raw"),
            lambda x: ~F.array_contains(
                F.col("all_strip"), F.concat(F.lit("q:"), _tmpl(x))
            ),
        )
    )
    canon = F.concat(
        F.coalesce(F.col("host"), F.lit("")),
        F.lit("/"),
        F.concat_ws("/", surv_p),
        F.when(
            F.size(surv_q) > 0,
            F.concat(F.lit("?"), F.concat_ws("&", surv_q)),
        ).otherwise(F.lit("")),
    )
    return joined.select(
        "url",
        "host",
        F.coalesce("n_rules", F.lit(0)).cast("long").alias("n_rules"),
        canon.alias("canon"),
    )
