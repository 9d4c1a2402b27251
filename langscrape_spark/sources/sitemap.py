"""Sitemap ingestion: XML sitemap bodies → frontier seed URLs.

The reference crawls a hand-curated URL list and never discovers work
(`/root/reference/scripts/run.py:63` drains a static spreadsheet); a
10^10-URL frontier bootstraps from the sitemaps robots.txt advertises
(RFC 9309 §2.4 ``Sitemap:`` lines → ``parse_robots_txt``'s
``sitemaps`` column) and from per-host conventions. This module turns
fetched sitemap bodies into rows the scheduler can seed from.

Grammar: the sitemaps.org 0.9 subset that matters for seeding —
``<urlset>`` files with ``<url>`` entries (``<loc>``, optional
``<lastmod>``/``<changefreq>``/``<priority>``) and ``<sitemapindex>``
files with ``<sitemap>`` entries (``<loc>``, optional ``<lastmod>``)
— one level of index indirection resolved by re-joining the fetched
bodies (:func:`expand_sitemap_index`). Namespaces/attributes on the
entry tags are tolerated; ``<loc>`` values get the five XML entity
escapes decoded (the spec REQUIRES entity-escaped URLs).

Plan shape: pure codegen — ``regexp_extract_all`` per entry kind →
``posexplode`` → per-entry field extraction; no UDFs, no shuffle
(downstream seeding dedups/gates). Entry regexes avoid backreferences
so the same patterns run on Java regex and RE2 (the q47 DuckDB oracle
re-derives every row). At 10^10 URLs the body table is just another
pages scan: sitemap files cap at 50k URLs / 50 MB uncompressed, so one
body is one task-sized unit of work and hosts scale horizontally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType

# (?s): sitemap files are pretty-printed; entries span lines. Entry
# tags may carry attributes (rare but legal). Non-greedy bodies keep
# entries separate; no backreferences (RE2-safe for the oracle).
_URL_ENTRY_RE = r"(?s)<url[\s>].*?</url>|<url/>"
_SMAP_ENTRY_RE = r"(?s)<sitemap[\s>].*?</sitemap>"
_LOC_RE = r"(?s)<loc[^>]*>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?s)<lastmod[^>]*>\s*(.*?)\s*</lastmod>"
_CHANGEFREQ_RE = r"(?s)<changefreq[^>]*>\s*(.*?)\s*</changefreq>"
_PRIORITY_RE = r"(?s)<priority[^>]*>\s*(.*?)\s*</priority>"

# The enforced output contract of parse_sitemaps (applied via .to()).
SITEMAP_ENTRY_DDL = (
    "src string, kind string, pos int, loc string, lastmod string, "
    "changefreq string, priority double"
)


def _xml_unescape(c: Column) -> Column:
    """The five XML 1.0 predefined entities, innermost-first so
    ``&amp;lt;`` decodes to the literal ``&lt;`` (amp LAST)."""
    c = F.regexp_replace(c, "&lt;", "<")
    c = F.regexp_replace(c, "&gt;", ">")
    c = F.regexp_replace(c, "&quot;", '"')
    c = F.regexp_replace(c, "&apos;", "'")
    c = F.regexp_replace(c, "&#39;", "'")
    return F.regexp_replace(c, "&amp;", "&")


def parse_sitemaps(
    df: DataFrame, url_col: str = "sitemap_url", body_col: str = "body"
) -> DataFrame:
    """(sitemap_url, body:string) → one row per sitemap entry:
    ``(src, kind, pos, loc, lastmod, changefreq, priority)``.

    ``kind`` is ``urlset`` for page entries and ``index`` for nested
    sitemap references; ``pos`` is the entry's document order within
    its file. Entries without a ``<loc>`` are dropped (nothing to
    fetch); ``priority`` is NULL when absent or unparseable
    (``try_cast`` — one malformed file among millions must not kill
    the seed job under ANSI mode)."""
    body = F.coalesce(F.col(body_col), F.lit(""))
    entries = df.select(
        F.col(url_col).alias("src"),
        F.posexplode_outer(
            F.concat(
                F.transform(
                    F.regexp_extract_all(body, F.lit(_URL_ENTRY_RE), F.lit(0)),
                    lambda e: F.struct(
                        F.lit("urlset").alias("kind"), e.alias("entry")
                    ),
                ),
                F.transform(
                    F.regexp_extract_all(body, F.lit(_SMAP_ENTRY_RE), F.lit(0)),
                    lambda e: F.struct(
                        F.lit("index").alias("kind"), e.alias("entry")
                    ),
                ),
            )
        ).alias("pos", "e"),
    ).where(F.col("e").isNotNull())
    entry = F.col("e")["entry"]
    loc = _xml_unescape(F.regexp_extract(entry, _LOC_RE, 1))
    return entries.select(
        "src",
        F.col("e")["kind"].alias("kind"),
        F.col("pos").cast("int").alias("pos"),
        loc.alias("loc"),
        F.regexp_extract(entry, _LASTMOD_RE, 1).alias("lastmod"),
        F.regexp_extract(entry, _CHANGEFREQ_RE, 1).alias("changefreq"),
        F.regexp_extract(entry, _PRIORITY_RE, 1)
        .try_cast("double")
        .alias("priority"),
    ).where(F.col("loc") != "").to(StructType.fromDDL(SITEMAP_ENTRY_DDL))


def expand_sitemap_index(
    parsed: DataFrame, bodies: DataFrame, url_col: str = "sitemap_url",
    body_col: str = "body", levels: int = 1,
) -> DataFrame:
    """Resolve ``<sitemapindex>`` indirection: join the ``index``
    entries' ``loc`` back onto the fetched bodies table, parse those,
    and union their ``urlset`` entries with the direct ones. Real
    indexes are one level deep by spec (an index must not list another
    index); pass ``levels=2`` (or more) to tolerate spec-violating
    nesting — each extra level re-joins the index entries the previous
    parse surfaced, so a two-deep chain A→B→C seeds C's URLs. Bounded
    iteration also makes index CYCLES harmless (a self-listing index
    just re-parses ``levels`` times and contributes nothing new)."""
    out = parsed.where(F.col("kind") == "urlset")
    refs = parsed.where(F.col("kind") == "index")
    for _ in range(levels):
        nested_bodies = bodies.join(
            refs.select(F.col("loc").alias(url_col)), url_col, "left_semi"
        )
        nested = parse_sitemaps(nested_bodies, url_col, body_col)
        out = out.unionByName(nested.where(F.col("kind") == "urlset"))
        refs = nested.where(F.col("kind") == "index")
    return out


# sitemaps.org <changefreq> → revisit interval in days. "always" and
# "hourly" are sub-daily → 0 (due the day after lastmod at the latest);
# "never" → no time-based revisit (archive URLs).
_FREQ_DAYS = {
    "always": 0,
    "hourly": 0,
    "daily": 1,
    "weekly": 7,
    "monthly": 30,
    "yearly": 365,
}
DEFAULT_REVISIT_DAYS = 7
DEFAULT_PRIORITY = 0.5  # the sitemaps.org default when <priority> absent


def revisit_schedule(entries: DataFrame, as_of: str) -> DataFrame:
    """urlset entries → when each URL is next due for a re-fetch:
    ``(url, lastmod_date, interval_days, next_due, overdue,
    refresh_priority)``.

    Deliberately date-granular (``as_of`` is ``YYYY-MM-DD``): sitemap
    ``lastmod`` values mix bare dates and full W3C timestamps across
    timezones, and a 10^10-URL refresh queue is drained in daily
    politeness rounds anyway — day resolution sidesteps cross-engine
    timezone semantics entirely (every comparison here is pure DATE
    arithmetic, reproducible in ANSI SQL). Semantics:

    - ``lastmod`` parses by its first 10 chars (``try_cast`` — garbage
      never throws); unparseable/absent lastmod → due immediately at
      ``as_of`` (we know nothing about freshness);
    - interval = ``changefreq`` per :data:`_FREQ_DAYS` (case-
      insensitive), absent/unknown → ``DEFAULT_REVISIT_DAYS``,
      ``never`` → NULL next_due, never overdue;
    - ``refresh_priority`` = the advertised priority (default 0.5)
      scaled by staleness, ``p · (1 + min(days_overdue, 30)/30)`` — an
      overdue high-priority page outranks a fresh one, capped so an
      abandoned sitemap cannot monopolize the refresh budget. Feed it
      to the frontier as the ``host_rank`` analog for re-crawl rounds.
    """
    as_of_d = F.to_date(F.lit(as_of))
    e = entries.where(F.col("kind") == "urlset")
    lastmod_d = F.substring("lastmod", 1, 10).try_cast("date")
    freq = F.lower(F.col("changefreq"))
    interval = F.when(freq == "never", F.lit(None).cast("int"))
    for name, days in _FREQ_DAYS.items():
        interval = interval.when(freq == name, F.lit(days))
    interval = interval.otherwise(F.lit(DEFAULT_REVISIT_DAYS))
    # "never" wins even over an unknown lastmod; otherwise unknown
    # lastmod = due immediately.
    next_due = (
        F.when(freq == "never", F.lit(None).cast("date"))
        .when(lastmod_d.isNull(), as_of_d)
        .otherwise(F.date_add(lastmod_d, interval))
    )
    # coalesce inside greatest: Spark's greatest SKIPS NULLs but other
    # engines return NULL — pin the "never due" case to 0 explicitly
    days_overdue = F.greatest(
        F.lit(0), F.coalesce(F.datediff(as_of_d, next_due), F.lit(0))
    )
    pr = F.coalesce(F.col("priority"), F.lit(DEFAULT_PRIORITY))
    return e.select(
        F.col("loc").alias("url"),
        lastmod_d.alias("lastmod_date"),
        interval.alias("interval_days"),
        next_due.alias("next_due"),
        F.coalesce(next_due <= as_of_d, F.lit(False)).alias("overdue"),
        F.round(
            pr
            * (
                F.lit(1.0)
                + F.least(days_overdue, F.lit(30)).cast("double") / F.lit(30.0)
            ),
            6,
        ).alias("refresh_priority"),
    )


def sitemap_seeds(entries: DataFrame) -> DataFrame:
    """urlset entries → the (url, depth) frame `run_crawl` seeds from.
    Distinct per url (the same page may appear in many sitemaps); the
    frontier's insert-time policy re-applies robots/validity gates, so
    this needs no filtering beyond the shape."""
    return (
        entries.where(F.col("kind") == "urlset")
        .select(F.col("loc").alias("url"))
        .distinct()
        .withColumn("depth", F.lit(0))
    )
