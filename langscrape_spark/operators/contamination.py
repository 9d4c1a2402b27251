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


def fuzzy_decontaminate(
    train: DataFrame,
    evalset: DataFrame,
    text_col: str,
    id_col: str,
    threshold_num: int = 1,
    threshold_den: int = 2,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
) -> DataFrame:
    """Cross-corpus NEAR-duplicate decontamination — the fuzzy
    complement of :func:`decontaminate`'s exact 13-gram gate: exact
    n-gram matching misses paraphrased or truncated benchmark leakage
    (GPT-3 appendix C documents exactly this failure), so candidate
    (train, eval) pairs come from shared MinHash-LSH band buckets
    computed over BOTH corpora with the q10 signature kernel, and
    survivors verify with the EXACT shingle Jaccard under the integer
    cross-multiplied gate ``den·|I| >= num·|U|`` (no float threshold
    ties).

    Scale shape: each corpus pays one signature pass
    (``minhash_band_buckets`` — the shared banding front half, so
    batch dedup, the incremental state and this decontamination can
    never drift apart); the bucket join emits only cross-corpus
    candidates (the eval side is benchmark-sized, so its bucket table
    broadcast-joins against the train buckets), and the exact verify
    touches only candidate pairs, never train x eval.

    Output: flagged pairs ``(train_id, eval_id, n_common, n_train,
    n_eval, jaccard round-6)`` — every train doc that should be
    DROPPED before training, with the eval doc it leaks.
    """
    from .dedup import minhash_band_buckets, shingles

    tb = minhash_band_buckets(
        train, text_col, id_col, num_hashes, bands, k
    ).select(F.col("id").alias("train_id"), "bucket")
    eb = minhash_band_buckets(
        evalset, text_col, id_col, num_hashes, bands, k
    ).select(F.col("id").alias("eval_id"), "bucket")
    cand = (
        tb.join(F.broadcast(eb), "bucket")
        .select("train_id", "eval_id")
        .distinct()
    )
    tsh = train.select(
        F.col(id_col).alias("train_id"),
        shingles(F.col(text_col), k).alias("_sa"),
    )
    esh = evalset.select(
        F.col(id_col).alias("eval_id"),
        shingles(F.col(text_col), k).alias("_sb"),
    )
    v = (
        cand.join(tsh, "train_id")
        .join(esh, "eval_id")
        .select(
            "train_id",
            "eval_id",
            F.size(F.array_intersect("_sa", "_sb")).alias("n_common"),
            F.size("_sa").alias("n_train"),
            F.size("_sb").alias("n_eval"),
        )
        .withColumn(
            "_union",
            F.col("n_train") + F.col("n_eval") - F.col("n_common"),
        )
        .where(
            (F.col("_union") > 0)
            & (
                F.col("n_common") * threshold_den
                >= F.col("_union") * threshold_num
            )
        )
    )
    return v.select(
        "train_id",
        "eval_id",
        "n_common",
        "n_train",
        "n_eval",
        F.round(F.col("n_common") / F.col("_union"), 6).alias("jaccard"),
    )
