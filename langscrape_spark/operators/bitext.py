"""Bitext candidate mining from URL structure — the CCAligned
mechanism (El-Kishky et al., EMNLP 2020): translated versions of a
page usually live at URLs differing ONLY in a language path segment
(`/en/` vs `/fr/`), so cross-lingual parallel-corpus candidates fall
out of a self-join on the language-stripped URL key — no content
comparison, no embeddings, web-scale cheap.

Reference scope: none (the reference is monolingual); this is the
training-data layer for multilingual corpus building (CCAligned /
CCMatrix pipelines start exactly here).

Scale shape: ONE self-equi-join on the language-stripped key. The
key is an eTLD-grouped URL (hot hosts spread across keys, not one
join key per host), group sizes are bounded by the number of
language versions a page can have (tens, not thousands), and the
length-ratio gate is pure integer arithmetic (len_a <= r*len_b and
len_b <= r*len_a — no float logs), so the whole plan is
codegen + one shuffle. A site serving thousands of "languages"
(crawler-trap calendars under /xx/) is exactly what
``bitext_key_profile`` surfaces before the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# Path segment that is a 2-letter ISO language, optionally with a
# region suffix ("/en/", "/pt-br/"). Anchored between slashes; the
# replacement keeps the slashes so the key stays a valid path shape.
LANG_SEG = "/([a-z]{2})(-[a-z]{2})?/"


def with_lang_key(
    pages: DataFrame, url_col: str = "url"
) -> DataFrame:
    """Adds ``lang`` (first language path segment, '' when none) and
    ``lang_key`` (url with every language segment replaced by '/*/')
    — the CCAligned pairing key."""
    return pages.withColumn(
        "lang", F.regexp_extract(F.col(url_col), LANG_SEG, 1)
    ).withColumn(
        "lang_key", F.regexp_replace(F.col(url_col), LANG_SEG, "/*/")
    )


def bitext_key_profile(pages: DataFrame, url_col: str = "url") -> DataFrame:
    """Versions-per-key audit BEFORE the self-join: keys with huge
    'language' fan-out are crawler traps (calendar/session segments
    that look like langs), not 4000-language websites."""
    return (
        with_lang_key(pages, url_col)
        .where(F.col("lang") != "")
        .groupBy("lang_key")
        .agg(F.count(F.lit(1)).alias("n_versions"))
        .orderBy(F.desc("n_versions"), "lang_key")
    )


def bitext_url_pairs(
    pages: DataFrame,
    url_col: str = "url",
    len_col: str = "n_chars",
    ratio_num: int = 2,
    ratio_den: int = 1,
) -> DataFrame:
    """Candidate translation pairs: same language-stripped key,
    different language, ordered lang_a < lang_b (each unordered pair
    once). ``ok_ratio`` applies the integer length-ratio sanity gate
    len_a*ratio_den <= len_b*ratio_num (both directions) — the
    standard "a translation is not 5x longer" filter, kept as a
    COLUMN rather than a row filter so recall audits can see what
    the gate would drop.

    Output: ``(lang_key, lang_a, lang_b, url_a, url_b, len_a, len_b,
    ok_ratio int)``.
    """
    keyed = (
        with_lang_key(pages, url_col)
        .where(F.col("lang") != "")
        .select(
            "lang_key",
            F.col("lang"),
            F.col(url_col).alias("u"),
            F.col(len_col).cast("long").alias("n"),
        )
    )
    a = keyed.select(
        "lang_key",
        F.col("lang").alias("lang_a"),
        F.col("u").alias("url_a"),
        F.col("n").alias("len_a"),
    )
    b = keyed.select(
        "lang_key",
        F.col("lang").alias("lang_b"),
        F.col("u").alias("url_b"),
        F.col("n").alias("len_b"),
    )
    return (
        a.join(b, "lang_key")
        .where(F.col("lang_a") < F.col("lang_b"))
        .select(
            "lang_key",
            "lang_a",
            "lang_b",
            "url_a",
            "url_b",
            "len_a",
            "len_b",
            (
                (F.col("len_a") * ratio_den <= F.col("len_b") * ratio_num)
                & (F.col("len_b") * ratio_den <= F.col("len_a") * ratio_num)
            )
            .cast("int")
            .alias("ok_ratio"),
        )
    )
