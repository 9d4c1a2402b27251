"""Benchmark decontamination — flag training documents that overlap an
evaluation/benchmark set by exact n-gram match (the GPT-3 appendix-C /
PaLM procedure: a document is contaminated if any of its 13-grams
appears in the eval set).

Scale shape: the doc side explodes to DISTINCT per-doc n-grams (one
narrow string column), the benchmark side is a set of n-grams that is
tiny next to the corpus (benchmarks are ~10^5-10^7 n-grams vs 10^8+
docs) — so the membership check is a **broadcast semi-join keyed on the
n-gram hash**: the exploded doc side never shuffles, and a boilerplate
n-gram shared by 10^8 docs matches one broadcast row (no hot key, no
blowup — the join never multiplies rows because the bench side is
de-duplicated first). Hits then reduce with one ``groupBy(doc)`` count
(map-side partial agg). If the bench set ever outgrows broadcast range,
drop the hint and the same plan runs as a shuffled semi-join
hash-partitioned on ``h`` — noted rather than auto-switched so the
plan stays predictable.

Everything is md5/array built-ins + one join; reproducible in ANSI SQL
(oracle q41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from langscrape_spark.operators.text import ngram_list


def decontaminate(
    docs: DataFrame,
    bench: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_ngram_col: str = "ngram",
    n: int = 13,
) -> DataFrame:
    """One row per input document: ``(id_col, n_hits, contaminated)``.

    ``n_hits`` counts the document's DISTINCT n-grams that appear in
    ``bench[bench_ngram_col]`` (distinct per doc, so a doc repeating a
    contaminated n-gram 50 times scores 1 — matching the published
    procedure's set semantics). ``contaminated`` is ``n_hits > 0``.
    Documents shorter than ``n`` tokens have no n-grams and come back
    clean."""
    doc_grams = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(ngram_list(F.col(text_col), n))).alias("g"),
    ).select("id", F.md5("g").alias("h"))
    bench_hashes = (
        bench.select(F.md5(F.col(bench_ngram_col)).alias("h")).distinct()
    )
    hits = (
        doc_grams.join(F.broadcast(bench_hashes), "h")
        .groupBy("id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) > 0).alias("contaminated"),
        )
    )
