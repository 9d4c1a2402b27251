"""DSIR-style data selection via importance resampling.

DSIR (Xie et al. 2023, "Data Selection for Language Models via
Importance Resampling") selects pretraining documents that look like a
small high-quality *target* corpus: represent every document as a bag
of hashed n-gram features, fit unigram feature distributions p (target)
and q (raw pool), weight each raw document by
``log w(x) = sum_f count_f(x) * (ln p_f - ln q_f)``, and sample without
replacement via the Gumbel top-k trick. The public reference
implementation is a single-machine batch job; this is the
corpus-at-rest Spark formulation.

Scale shape (100 TB): feature distributions are two explode +
equi-key count aggs whose outputs are ``num_buckets``-sized (the whole
point of hashed features) and join into ONE broadcastable log-ratio
table. Scoring broadcasts that table against the exploded raw corpus
(map-side join; the per-doc reduce shuffles ~1 row/doc/partition after
partial aggregation). Selection is a ``TakeOrderedAndProject`` top-k —
partial top-k per partition, never a global sort.

Hash parity: features hash through the md5 lower half
(``operators/dedup._md5_lower64`` — DuckDB ``md5_number_lower``), so
bucketing, weights, and the Gumbel keys are reproducible bit-for-bit
in the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from .dedup import _md5_lower64
from .text import words_col

_TWO32 = 4294967296  # 2^32


def hashed_ngram_buckets(
    text: Column, n: int = 2, num_buckets: int = 1024
) -> Column:
    """Per-document hashed n-gram feature buckets (array<long>,
    one entry per n-gram occurrence — multiplicity matters: DSIR
    weights are sums over occurrences, not distinct features).

    n-grams are space-joined lowercase whitespace tokens; the bucket
    is ``pmod(md5_lower64(ngram), num_buckets)``.
    """
    toks = words_col(text)
    grams = F.transform(
        F.sequence(
            F.lit(1),
            F.greatest(F.size(toks) - (n - 1), F.lit(0)),
        ),
        lambda i: F.array_join(F.slice(toks, i, n), " "),
    )
    # guard: F.sequence(1, 0) counts DOWN — greatest() above keeps the
    # upper bound >= 0, and when it is 0 the sequence is (1, 0) which
    # would be [1, 0]; gate empties explicitly.
    grams = F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )
    return F.transform(
        grams, lambda g: F.pmod(_md5_lower64(g), F.lit(num_buckets))
    )


def feature_log_ratio(
    target_docs: DataFrame,
    raw_docs: DataFrame,
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 1024,
    alpha: float = 0.5,
) -> DataFrame:
    """The broadcastable ``(bucket, log_ratio)`` table:
    ``ln p_target(b) - ln q_raw(b)`` with add-alpha smoothing over the
    fixed bucket space (every bucket exists in the output, hit or not,
    so scoring never needs an OOV branch).

    Each corpus is scanned exactly ONCE: the count agg output is at
    most ``num_buckets`` rows, so it is collected and re-seeded as a
    small DataFrame — downstream consumers (the broadcast in
    ``dsir_weights``) can materialize the log-ratio table without
    re-running the corpus explode, and nothing stays persisted.
    ``log`` is still evaluated by Spark so engine float parity is
    unchanged.
    """

    def counts(df: DataFrame) -> dict:
        rows = (
            df.select(
                F.explode(
                    hashed_ngram_buckets(F.col(text_col), n, num_buckets)
                ).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {int(r["bucket"]): int(r["c"]) for r in rows}

    ct, cr = counts(target_docs), counts(raw_docs)
    denom_t = float(sum(ct.values())) + alpha * num_buckets
    denom_r = float(sum(cr.values())) + alpha * num_buckets
    base = target_docs.sparkSession.createDataFrame(
        [(b, ct.get(b, 0), cr.get(b, 0)) for b in range(num_buckets)],
        "bucket long, ct long, cr long",
    )
    return base.select(
        "bucket",
        (
            F.log((F.col("ct") + F.lit(alpha)) / F.lit(denom_t))
            - F.log((F.col("cr") + F.lit(alpha)) / F.lit(denom_r))
        ).alias("log_ratio"),
    )


def dsir_weights(
    raw_docs: DataFrame,
    log_ratio: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    num_buckets: int = 1024,
) -> DataFrame:
    """Per-document importance log-weight: sum of ``log_ratio`` over
    the doc's feature occurrences. Docs with no n-grams weigh 0 (an
    empty product), kept — the resampler decides, not the scorer."""
    feats = raw_docs.select(
        F.col(id_col),
        F.explode_outer(
            hashed_ngram_buckets(F.col(text_col), n, num_buckets)
        ).alias("bucket"),
    )
    return (
        feats.join(F.broadcast(log_ratio), "bucket", "left")
        .groupBy(id_col)
        .agg(
            F.sum(F.coalesce("log_ratio", F.lit(0.0))).alias("log_weight"),
            F.count("bucket").alias("n_features"),
        )
    )


def gumbel_key(id_col: Column, log_weight: Column, salt: str = "g:") -> Column:
    """Deterministic Gumbel perturbation for top-k sampling without
    replacement: ``key = log_weight - ln(-ln(u))`` with
    ``u = (low32(md5_lower64(salt || id)) + 0.5) / 2^32`` — u in (0,1),
    identical bit pattern in DuckDB (``md5_number_lower % 2^32``)."""
    u = (
        F.pmod(_md5_lower64(F.concat(F.lit(salt), id_col.cast("string"))), F.lit(_TWO32))
        + F.lit(0.5)
    ) / F.lit(float(_TWO32))
    return log_weight - F.log(-F.log(u))


def dsir_resample(
    weighted: DataFrame,
    k: int,
    id_col: str = "doc_id",
) -> DataFrame:
    """Gumbel top-k selection: the classic reparameterization —
    taking the k largest ``log_weight + Gumbel(0,1)`` keys draws k
    docs without replacement with probability proportional to their
    importance weights. Plans as ``TakeOrderedAndProject``."""
    key = gumbel_key(F.col(id_col), F.col("log_weight"))
    return (
        weighted.withColumn("gumbel_key", key)
        .orderBy(F.desc("gumbel_key"), F.asc(id_col))
        .limit(k)
    )
