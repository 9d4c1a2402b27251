"""CDX(J) index ingestion: Common-Crawl capture indexes → typed rows.

The companion to :mod:`sources.warc`: Common Crawl publishes a CDXJ
index of every capture (``cdx-00000.gz`` shards) — one line per
capture: ``<SURT key> <14-digit timestamp> <JSON>`` where the JSON
carries ``url``, ``mime``, ``status``, ``digest``, ``length``,
``offset``, ``filename`` (all strings, per the CDXJ convention). A
selective 100 TB pipeline reads THIS first — filter by mime/status/
url-pattern over the tiny index, then fetch only the matching WARC
byte ranges — instead of scanning every archive.

Scale shape (deliberately opposite to WARC's):

- **Line-splittable.** CDXJ is newline-delimited text, so
  ``spark.read.text`` splits shards at block boundaries —
  ``maxPartitionBytes``-sized tasks regardless of file count. (The
  published shards are plain ``.gz`` — not splittable — so at real
  scale either let one shard = one task like cc-pyspark does, or
  re-shard once; the parser is the same either way.)
- **Pure codegen.** One ``split`` + ``from_json`` + casts; no UDFs,
  no shuffle. Filters on ``status``/``mime``/``url`` push into the
  scan's row-group pruning when the index is parquet-ized.
- **Dirty-line tolerance**: short lines and invalid JSON null out via
  ``from_json``'s NULL-on-malformed and are dropped by the ``url``
  guard — a corrupt index line must not kill the shard's task.

``fetch_plan`` turns filtered captures into the per-archive ordered
byte-range list a fetch stage consumes: grouped by WARC filename,
ranges sorted by offset (sequential reads within each archive), one
row per archive — archives scale horizontally, and the plan is
orders of magnitude smaller than the index.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

CDX_JSON_DDL = (
    "url string, mime string, status string, digest string, "
    "length string, offset string, filename string"
)


def parse_cdx(df: DataFrame, line_col: str = "value") -> DataFrame:
    """Lines → typed capture rows ``(surt, ts, url, mime, status,
    digest, length, offset, filename)``. Malformed lines (missing
    fields, broken JSON, non-numeric timestamp) drop out; numeric
    fields use ``try_cast`` so one dirty capture nulls a column
    instead of throwing under ANSI mode."""
    # F.get, not [i]: under ANSI mode array indexing THROWS on a short
    # line ("garbage" splits into 1 field); get() nulls instead and the
    # url guard below drops the row.
    parts = F.split(F.col(line_col), " ", 3)
    j = F.from_json(F.get(parts, 2), CDX_JSON_DDL)
    return (
        df.select(
            F.get(parts, 0).alias("surt"),
            F.try_to_timestamp(
                F.get(parts, 1), F.lit("yyyyMMddHHmmss")
            ).alias("ts"),
            j.alias("j"),
        )
        .where(F.col("j").isNotNull() & F.col("j")["url"].isNotNull())
        .select(
            "surt",
            "ts",
            F.col("j")["url"].alias("url"),
            F.col("j")["mime"].alias("mime"),
            F.col("j")["status"].try_cast("int").alias("status"),
            F.col("j")["digest"].alias("digest"),
            F.col("j")["length"].try_cast("long").alias("length"),
            F.col("j")["offset"].try_cast("long").alias("offset"),
            F.col("j")["filename"].alias("filename"),
        )
    )


def fetch_plan(captures: DataFrame) -> DataFrame:
    """Filtered captures → one row per WARC archive: ``(filename,
    n_records, total_bytes, ranges)`` with ``ranges`` the
    offset-sorted ``array<struct<offset:long,length:long>>`` a range
    fetcher streams sequentially. One equi-key shuffle on filename;
    a 1 GB archive holds ~10⁴ captures, so a group is kilobytes —
    no hot-key risk by construction."""
    return (
        captures.where(
            F.col("filename").isNotNull() & F.col("offset").isNotNull()
        )
        .groupBy("filename")
        .agg(
            F.count("*").alias("n_records"),
            F.sum("length").alias("total_bytes"),
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("offset").alias("offset"),
                        F.col("length").alias("length"),
                    )
                )
            ).alias("ranges"),
        )
    )
