"""Distributed suffix array by prefix doubling — the exact-substring
dedup primitive (Lee et al. 2022 "Deduplicating Training Data Makes
Language Models Better" builds a corpus-wide suffix array; the
reference's chunk-level dedup plays the same role at
langscrape/nodes/data_collator.py-adjacent granularity, and
operators/dedup.py::exact_substring_dedup approximates it with
k-token window hashes). This module computes the REAL suffix array,
Spark-first:

* The corpus string is never materialized. Documents are laid out in
  deterministic md5 order with a ``chr(1)`` terminator after each
  (strictly below every alphabet char, so shorter suffixes sort
  first exactly as byte comparison does), and each position becomes a
  ``(gpos, code)`` row via the same exact two-level prefix-sum that
  shard packing uses (operators/sharding.py::distributed_cumsum) —
  so doc offsets are globally consistent without a single-partition
  window.

* Prefix doubling: after round j, ``rank`` orders positions by their
  first ``2^j`` characters. Each round pairs ``rank[i]`` with
  ``rank[i + 2^j]`` (one equi-join shuffle; positions past the corpus
  end take sentinel rank 0 < every dense rank, reproducing the
  shorter-suffix-first rule) and re-densifies.

* Densify WITHOUT a global window and WITHOUT repartitionByRange's
  sampling pass: the previous round's rank is dense in
  ``1..prev_max``, so ``bucket = (rank-1)*P div prev_max`` gives P
  ordered, non-overlapping ranges computed by pure arithmetic —
  rows with equal ``(rank, rank2)`` can never split across buckets
  (the cut is on ``rank`` alone), so the global dense rank is the
  in-bucket dense rank plus an exclusive prefix sum of per-bucket
  distinct counts (a P-row frame, broadcast back). One shuffle per
  round, loop control = the same P-row aggregate's total.

Scale shape at 100 TB: every round is two equi-key shuffles (the
+k join and the bucket window) over the positions frame — the
textbook distributed SA cost, O(log maxLCP) rounds. No collect ever
exceeds P rows; lineage is truncated with a localCheckpoint every
few rounds so the loop's plan stays bounded.
"""

from __future__ import annotations

from typing import Optional, Tuple

from pyspark.sql import Column, DataFrame, Window, functions as F

from langscrape_spark.operators.sharding import distributed_cumsum, order_key

# Terminator code: strictly below every normalized-alphabet char
# (space = 32 is the smallest), strictly above the past-corpus-end
# sentinel rank 0.
TERMINATOR_CODE = 1


def normalize_for_sa(text: Column, max_chars: int) -> Column:
    """Safe-alphabet normalization shared with the DuckDB oracle:
    lowercase, strip to ``[a-z0-9 ]``, cap length. All ASCII, so
    Spark's per-char ``ascii()`` codes order exactly like DuckDB's
    bytewise VARCHAR comparison."""
    return F.coalesce(
        F.substring(
            F.regexp_replace(F.lower(text), "[^a-z0-9 ]", ""), 1, max_chars
        ),
        F.lit(""),
    )


def corpus_positions(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 120,
) -> DataFrame:
    """Explode documents into the concatenated-corpus position table
    ``(doc_id, gpos, pos_in_doc, doc_len, code)`` — 1-based global
    positions in md5(doc_id) order, one terminator row per document —
    without ever building the corpus string. ``doc_len`` is the
    normalized text length (terminator excluded) so callers can test
    "gram lies fully inside the document"."""
    t = normalize_for_sa(F.col(text_col), max_chars)
    d = docs.select(
        F.col(id_col).alias("doc_id"),
        t.alias("_t"),
        order_key(F.col(id_col)).alias("_key"),
    ).withColumn("_len", F.coalesce(F.length("_t"), F.lit(0)))
    # Exact global start offset of each doc (terminator included in
    # the laid-out length).
    d = distributed_cumsum(
        d.withColumn("_sz", F.col("_len") + F.lit(1)), "_sz", "_key"
    ).withColumn("_start", F.col("cum") - F.col("_sz"))
    # F.sequence(1, 0) counts DOWN — guard the empty-document case.
    char_codes = F.when(
        F.col("_len") > 0,
        F.transform(
            F.sequence(F.lit(1), F.col("_len")),
            lambda i: F.ascii(F.col("_t").substr(i, F.lit(1))),
        ),
    ).otherwise(F.expr("CAST(array() AS ARRAY<INT>)"))
    codes = F.concat(char_codes, F.array(F.lit(TERMINATOR_CODE)))
    return d.select(
        "doc_id",
        F.col("_len").alias("doc_len"),
        F.col("_start"),
        F.posexplode(codes).alias("_pos0", "code"),
    ).select(
        "doc_id",
        "doc_len",
        (F.col("_start") + F.col("_pos0") + 1).cast("long").alias("gpos"),
        (F.col("_pos0") + 1).cast("long").alias("pos_in_doc"),
        F.col("code").cast("long").alias("code"),
    )


def _densify(
    pairs: DataFrame, prev_max: int, parts: int
) -> Tuple[DataFrame, int]:
    """Global dense rank of ``(r, r2)`` without a global window.
    ``r`` must be order-correct with values in ``1..prev_max``;
    returns ``(frame with new dense r, total distinct pairs)``. The
    bucket cut is on ``r`` alone, so equal pairs never straddle a
    bucket and the offsets need no boundary adjustment."""
    # Integer-exact ordered bucketing (no double rounding at scale).
    b = pairs.withColumn(
        "_b", F.expr(f"((r - 1L) * {parts}L) DIV {prev_max}L")
    )
    w = Window.partitionBy("_b").orderBy("r", "r2")
    ranked = b.withColumn("_dr", F.dense_rank().over(w)).persist()
    per_bucket = (
        ranked.groupBy("_b").agg(F.max("_dr").alias("_nd"))
    )
    w_off = (
        Window.orderBy("_b")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    offsets = per_bucket.select(
        "_b", (F.sum("_nd").over(w_off) - F.col("_nd")).alias("_off")
    )
    out = (
        ranked.join(F.broadcast(offsets), "_b")
        .withColumn("r", (F.col("_off") + F.col("_dr")).cast("long"))
        .drop("_b", "_dr", "_off", "r2")
    )
    n_distinct = per_bucket.agg(F.sum("_nd")).collect()[0][0] or 0
    return out, int(n_distinct), ranked


def _doubling_rounds(
    pos: DataFrame,
    stop_prefix: Optional[int] = None,
    parts: Optional[int] = None,
) -> Tuple[DataFrame, int, int]:
    """Run prefix-doubling rounds over a ``corpus_positions`` frame.

    Stops when all ranks are distinct (full suffix order) or, if
    ``stop_prefix`` is given, as soon as ``rank`` orders positions by
    at least their first ``stop_prefix`` characters. Returns
    ``(frame with columns of pos + r, reached_prefix, n_rows)``.
    """
    spark = pos.sparkSession
    if parts is None:
        parts = spark.sparkContext.defaultParallelism
    # Each round self-joins ``cur`` — without truncation the logical
    # plan doubles per round and the driver dies stringifying it.
    # localCheckpoint materializes the round AND replaces the lineage
    # with a leaf, keeping every round's plan constant-size.
    cur = pos.withColumn("r", F.col("code")).localCheckpoint(eager=True)
    n = cur.count()
    if n == 0:
        return cur, 1, 0
    prefix = 1
    prev_max = 127  # ascii codes are order-correct initial ranks
    k = 1
    rounds = 0
    while True:
        if stop_prefix is not None and prefix >= stop_prefix:
            break
        nxt_r = cur.select(
            (F.col("gpos") - F.lit(k)).alias("gpos"),
            F.col("r").alias("r2"),
        )
        pairs = cur.join(nxt_r, "gpos", "left").withColumn(
            "r2", F.coalesce(F.col("r2"), F.lit(0))
        )
        new, n_distinct, scratch = _densify(pairs, prev_max, parts)
        rounds += 1
        new = new.localCheckpoint(eager=True)
        scratch.unpersist()
        cur.unpersist()
        cur = new
        prefix, k, prev_max = prefix * 2, k * 2, n_distinct
        if n_distinct >= n:
            break
        if prefix > 2 * n + 2:  # safety: cannot happen (suffixes distinct)
            raise AssertionError("prefix doubling failed to converge")
    return cur, prefix, n


def suffix_array(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 120,
) -> DataFrame:
    """Full corpus suffix array: ``(doc_id, gpos, pos_in_doc,
    sa_rank)`` where ``sa_rank`` is the 1-based position of the
    suffix starting at ``gpos`` in the sorted order of ALL corpus
    suffixes (terminators included). Exactly ``ORDER BY
    substr(corpus, gpos)`` — the DuckDB oracle states it that way."""
    pos = corpus_positions(docs, text_col, id_col, max_chars)
    ranked, _, _ = _doubling_rounds(pos)
    return ranked.select(
        "doc_id", "gpos", "pos_in_doc", F.col("r").alias("sa_rank")
    )


def repeated_grams(
    docs: DataFrame,
    gram_chars: int = 16,
    min_occ: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_chars: int = 120,
) -> DataFrame:
    """Exact repeated substrings of length ``gram_chars`` (a power of
    two): stop the doubling once ranks order positions by their first
    ``gram_chars`` characters. Only positions whose gram lies fully
    inside a document are kept, so for every surviving row the first
    ``gram_chars`` characters are real text — rank equality is then
    plain character equality, and a rank group of size ≥2 is an
    exactly-repeated gram.

    Output per repeated gram: ``(min_gpos, n_occ, n_docs)`` — the
    Lee-et-al duplicate-span detector's exact core, at a fraction of
    the full SA's rounds (log2(gram_chars) instead of log2(maxLCP)).
    """
    if gram_chars & (gram_chars - 1):
        raise ValueError("gram_chars must be a power of two")
    pos = corpus_positions(docs, text_col, id_col, max_chars)
    ranked, _, _ = _doubling_rounds(pos, stop_prefix=gram_chars)
    eligible = ranked.where(
        F.col("pos_in_doc") + F.lit(gram_chars - 1) <= F.col("doc_len")
    )
    return (
        eligible.groupBy("r")
        .agg(
            F.min("gpos").alias("min_gpos"),
            F.count(F.lit(1)).cast("long").alias("n_occ"),
            F.count_distinct("doc_id").cast("long").alias("n_docs"),
        )
        .where(F.col("n_occ") >= min_occ)
        .drop("r")
        .select("min_gpos", "n_occ", "n_docs")
    )
