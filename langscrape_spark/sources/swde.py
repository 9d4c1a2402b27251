"""SWDE-style corpus reader: page directories + tab-separated ground
truth → the eval tables the scoring layer consumes.

Spark-first restatement of the reference's pandas readers
(``/root/reference/feilian/datasets/dataset.py:92-254``,
``/root/reference/feilian/dataset_tools.py:66-95``). Layout on disk
(the SWDE benchmark's published structure):

    {root}/{category}/{category}-{site}({pages})/{page_id}.htm
    {root}/groundtruth/{category}/{category}-{site}-{attr}.txt

Ground-truth file format: two header lines, then
``page_id<TAB>count<TAB>value[<TAB>value...]`` rows; rows whose first
value is the literal ``<NULL>`` are dropped
(``dataset_tools.py:70-75``). Each value passes through the kernel's
``normalize_text`` (the reference applies feilian ``normalize_text``
per value, ``datasets/dataset.py:229-236``).

Scale shape: pages load via the ``binaryFile`` source (splittable file
listing, columnar content) with category/site/page parsed from the
path by JVM regexes; ground truth loads whole-file (these files are
KB-scale dimensions), splits to lines JVM-side, and the per-attribute
frames become one ``map<attr, array<value>>`` per page via
``map_from_entries(collect_list(...))`` — the reference's repeated
outer-merge pivot without N sequential joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

PAGE_PATH_RE = r"([^/]+)/\1-([A-Za-z0-9_]+)\((\d+)\)/([^/]+)\.htm$"
GT_PATH_RE = r"([^/]+)-([A-Za-z0-9_]+)-([A-Za-z0-9_]+)\.txt$"


def swde_pages(spark: SparkSession, root: str) -> DataFrame:
    """(category, site, pages, page_id, html:binary) from the page
    directory tree."""
    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.htm")
        .option("recursiveFileLookup", "true")
        .load(root)
    )
    path = F.col("path")
    return (
        raw.select(
            F.regexp_extract(path, PAGE_PATH_RE, 1).alias("category"),
            F.regexp_extract(path, PAGE_PATH_RE, 2).alias("site"),
            F.regexp_extract(path, PAGE_PATH_RE, 3).alias("pages"),
            F.regexp_extract(path, PAGE_PATH_RE, 4).alias("page_id"),
            F.col("content").alias("html"),
        )
        # groundtruth .txt files never match the glob; malformed paths
        # (regexp miss → '') are dropped rather than poisoning the join
        .where(F.col("page_id") != "")
        # hidden files skipped (reference dataset_tools.py:18-32) —
        # '.foo.htm' still matches the '*.htm' glob, so filter here
        .where(~F.col("page_id").startswith("."))
    )


def _normalize_values_udf():
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    from ..html.textify import normalize_text

    def _norm(series):
        return pd.Series(
            [
                None if vs is None else [normalize_text(v) for v in vs]
                for vs in series
            ]
        )

    return pandas_udf(_norm, ArrayType(StringType()))


def swde_ground_truth(spark: SparkSession, root: str) -> DataFrame:
    """(category, site, page_id, ground_truth: map<attr, array<str>>)
    from the tab-separated truth files."""
    raw = (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("pathGlobFilter", "*.txt")
        .option("recursiveFileLookup", "true")
        .load(root)
        .select(F.input_file_name().alias("path"), "value")
    )
    parsed = raw.select(
        F.regexp_extract("path", GT_PATH_RE, 1).alias("category"),
        F.regexp_extract("path", GT_PATH_RE, 2).alias("site"),
        F.regexp_extract("path", GT_PATH_RE, 3).alias("attr"),
        # drop the two header lines (reference dataset_tools.py:71-72)
        F.slice(
            F.split(F.col("value"), "\r?\n"),
            3,
            F.greatest(F.size(F.split(F.col("value"), "\r?\n")) - 2, F.lit(0)),
        ).alias("lines"),
    ).where(F.col("attr") != "")
    rows = (
        parsed.select(
            "category", "site", "attr", F.explode("lines").alias("line")
        )
        .withColumn("line", F.trim("line"))
        .where(F.col("line") != "")
        .withColumn("fields", F.split("line", "\t"))
        # row layout: page_id, count, value...; '<NULL>' rows dropped
        .where(F.col("fields")[2] != "<NULL>")
        .select(
            "category",
            "site",
            "attr",
            F.col("fields")[0].alias("page_id"),
            F.slice(
                F.col("fields"), 3, F.greatest(F.size("fields") - 2, F.lit(0))
            ).alias("values"),
        )
    )
    rows = rows.withColumn("values", _normalize_values_udf()(F.col("values")))
    return rows.groupBy("category", "site", "page_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("attr", "values")))
        ).alias("ground_truth")
    )


def swde_eval_table(
    pages: DataFrame, truth: DataFrame, queries: DataFrame | None = None
) -> DataFrame:
    """The reference's SeedDataset shape (``feilian/datasets/
    dataset.py:57-89``): (id, category, site, page_id, html, query,
    ground_truth). Pages without truth keep a NULL map (outer merge
    semantics); ``queries`` is an optional (category, site, query)
    dimension, broadcast-joined."""
    out = pages.join(truth, ["category", "site", "page_id"], "left").withColumn(
        "id", F.concat_ws("_", "category", "site", "page_id")
    )
    if queries is not None:
        out = out.join(F.broadcast(queries), ["category", "site"], "left")
    else:
        out = out.withColumn("query", F.lit(None).cast("string"))
    return out.select(
        "id", "category", "site", "page_id", "html", "query", "ground_truth"
    )


def truth_values_long(truth: DataFrame) -> DataFrame:
    """Explode the ground-truth maps to one row per (category, site,
    page_id, field_name, value) — the shape ``f1_by_group`` consumes."""
    return (
        truth.select(
            "category",
            "site",
            "page_id",
            F.explode("ground_truth").alias("field_name", "values"),
        )
        .select(
            "category",
            "site",
            "page_id",
            "field_name",
            F.explode("values").alias("value"),
        )
        .distinct()
    )
