"""Host-scoped boilerplate line removal.

Web pages repeat navigation, cookie banners, and footer lines across
every page of a host; a training corpus wants them gone exactly once
per host, not burned into every document. CCNet removes lines
duplicated corpus-wide; MassiveWeb/Gopher-style pipelines scope the
detection per host so a sentence that is legitimate body text on one
site isn't deleted because it is another site's footer. This operator
is the per-host variant: a line is boilerplate on host H when it
appears on >= ``min_pages`` of H's pages AND on >= ``share_threshold``
of them.

Scale shape (100 TB): three corpus passes, each a narrow posexplode
feeding an equi-key hash agg — per-(host, line) distinct-page counts
and per-host page counts for detection (different grouping keys, so
the two cannot fuse), then one rewrite pass. The boilerplate set is
(hosts x distinct boilerplate lines)-sized, orders of magnitude
smaller than the corpus, and joins back as a broadcast flag join
against the exploded lines. Reassembly, kept-counts and line totals
come out of ONE groupBy(url) — a url's lines never left the partition
that exploded them, so the map-side partial delivers one row per url
per partition and the shuffle is documents-sized, not lines-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def page_lines(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
    sep: str = "\n",
) -> DataFrame:
    """Explode page text into ``(url, host, pos, line)`` rows.

    Lines are used verbatim (no normalization) so removal is exact;
    whitespace-only lines are dropped here — they carry no signal and
    an all-blank "boilerplate" line would make reassembly semantics
    silly. ``pos`` preserves original order for reassembly. ``sep`` is
    a LITERAL separator (quoted with ``\\Q…\\E`` before it reaches the
    regex-based split, so ``'|'`` or ``'.'`` split where intended).
    """
    return (
        pages.select(
            F.col(url_col).alias("url"),
            F.col(host_col).alias("host"),
            F.posexplode(
                F.split(F.col(text_col), "\\Q" + sep + "\\E")
            ).alias("pos", "line"),
        )
        .where(F.regexp_replace(F.col("line"), r"\s+", "") != "")
    )


def detect_boilerplate_lines(
    lines: DataFrame,
    min_pages: int = 5,
    share_threshold: float = 0.5,
) -> DataFrame:
    """Per-host boilerplate lines from a ``page_lines`` frame.

    Returns ``(host, line, n_pages, host_pages, share)`` for flagged
    lines only. A page repeating its own line (a list of identical
    bullet rows) does not inflate the count — pages are counted
    distinct. ``share = n_pages / host_pages`` where ``host_pages``
    counts the host's pages that have at least one non-blank line
    (the same universe the numerator draws from).
    """
    per_line = lines.groupBy("host", "line").agg(
        F.countDistinct("url").alias("n_pages")
    )
    per_host = lines.groupBy("host").agg(
        F.countDistinct("url").alias("host_pages")
    )
    return (
        per_line.join(F.broadcast(per_host), "host")
        .withColumn(
            "share",
            F.round(F.try_divide(F.col("n_pages"), F.col("host_pages")), 6),
        )
        .where(
            (F.col("n_pages") >= F.lit(min_pages))
            & (F.col("share") >= F.lit(share_threshold))
        )
    )


def remove_boilerplate(
    pages: DataFrame,
    url_col: str = "url",
    host_col: str = "host",
    text_col: str = "text",
    sep: str = "\n",
    min_pages: int = 5,
    share_threshold: float = 0.5,
) -> DataFrame:
    """Strip per-host boilerplate lines from every page.

    Returns ``(url, host, clean_text, n_kept, n_removed)`` — body
    lines rejoined with ``sep`` in original order. A page whose every
    line was boilerplate keeps an empty ``clean_text`` with
    ``n_kept = 0`` (callers typically drop those). Pages whose text
    had no non-blank lines at all are preserved the same way (they
    still appear, empty) so the output stays one row per input page.
    Duplicate url rows in the input collapse to one deterministic row
    first (min (host, text) struct) — the same guard
    ``snapshots.crawl_delta`` applies, so unioned crawl rounds cannot
    double every line through the explode.

    Pass accounting (a corpus pass = one split+posexplode of every
    page): detection needs two (per-(host,line) distinct-page counts
    and per-host page counts — different grouping keys, so exchange
    reuse cannot fuse them), the rewrite one more, joined against the
    broadcast boilerplate set and reduced in a SINGLE groupBy that
    yields clean_text, n_kept, and n_lines together. Callers looping
    many thresholds over one corpus should persist ``pages`` (or
    ``page_lines(...)``) upstream — this function deliberately does
    not pin corpus-sized state itself.
    """
    collapsed = (
        pages.groupBy(F.col(url_col).alias("url"))
        .agg(
            F.min(
                F.struct(
                    F.col(host_col).alias("host"),
                    F.col(text_col).alias("text"),
                )
            ).alias("_s")
        )
        .select("url", F.col("_s.host").alias("host"), F.col("_s.text").alias("text"))
    )
    lines = page_lines(collapsed, "url", "host", "text", sep)
    bp = detect_boilerplate_lines(lines, min_pages, share_threshold)
    flagged = lines.join(
        F.broadcast(
            bp.select("host", "line").withColumn("_bp", F.lit(True))
        ),
        ["host", "line"],
        "left",
    )
    kept_struct = F.when(
        F.col("_bp").isNull(), F.struct("pos", "line")
    )  # NULL structs vanish from collect_list -> only body lines remain
    reassembled = flagged.groupBy("url").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(kept_struct)),
                lambda s: s["line"],
            ),
            sep,
        ).alias("clean_text"),
        F.count(kept_struct).alias("n_kept"),
        F.count(F.lit(1)).alias("n_lines"),
    )
    return (
        collapsed.select("url", "host")
        .join(reassembled, "url", "left")
        .select(
            "url",
            "host",
            F.coalesce("clean_text", F.lit("")).alias("clean_text"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            (F.coalesce("n_lines", F.lit(0)) - F.coalesce("n_kept", F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )
