"""Deduplication operators for webtext corpora — exact, n-gram
Jaccard, MinHash+LSH, SimHash, embedding-cosine. Everything except
SimHash is built from md5/array/string built-ins so it runs entirely
JVM-side **and** is reproducible verbatim in ANSI SQL (DuckDB oracles
in ``__spark_entry__.py``).

Scale notes:
- exact dedup is one hash-shuffle on the fingerprint;
- MinHash/LSH: signatures are computed map-side (no shuffle); the only
  shuffle is the band-bucket groupBy, whose keys are uniformly
  distributed md5 prefixes — no skew by construction. Candidate pairs
  come from buckets with >1 member, so the join never goes quadratic in
  corpus size, only in bucket size;
- pair generation dedupes (a<b) to avoid double counting.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

from .text import fingerprint


# --------------------------------------------------------------------------
# exact
# --------------------------------------------------------------------------

def exact_dedup(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Keep the lowest-id row per normalized-text fingerprint
    (hash-groupBy; deterministic winner)."""
    w = Window.partitionBy("fp").orderBy(F.col(id_col).asc())
    return (
        df.withColumn("fp", fingerprint(F.col(text_col)))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .drop("rn")
    )


# --------------------------------------------------------------------------
# shingles + jaccard
# --------------------------------------------------------------------------

def shingles(text: Column, k: int = 3) -> Column:
    """Distinct word k-shingles ('a b c' strings), sorted for
    determinism."""
    tokens = F.filter(F.split(F.lower(text), r"\s+"), lambda w: w != "")
    n = F.size(tokens)
    # Guard n < k explicitly: sequence(1, 0) counts DOWN in Spark, and
    # the resulting slice(tokens, 0, k) throws (array indices are
    # 1-based) — a 2-word document must yield zero shingles, not an
    # error.
    sh = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(1), n - (k - 1)),
            lambda i: F.concat_ws(" ", F.slice(tokens, i, k)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.array_sort(F.array_distinct(sh))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = 10_000,
    detect_fraction: float = 0.1,
) -> DataFrame:
    """All pairs with shingle-Jaccard ≥ threshold via an inverted index
    (explode shingles → join on shingle), never a cross join.
    Output: (id_a, id_b, jaccard) with id_a < id_b.

    Hot-bucket guard: shingles appearing in more than ``max_doc_freq``
    documents are dropped from the shingle VOCABULARY — one stop-phrase
    shingle shared by 10^6 docs would otherwise make its posting-list
    self-join quadratic at corpus scale. With the cap active, Jaccard
    is computed over the capped vocabulary (the standard df-capped
    similarity: both the intersection and the set sizes exclude hot
    shingles), which is deterministic and engine-reproducible; with
    ``max_doc_freq=None`` it is the exact classic Jaccard. Either way
    the plan is ONE posting-list self-join + count aggregation — the
    per-pair intersection is never recomputed from the arrays (a
    join-back would shuffle every shingle array twice; measured 1.6x
    the whole query's cost at sf0.1)."""
    inter = _shingle_pair_counts(
        df, text_col, id_col, k, max_doc_freq, detect_fraction
    )
    return (
        inter.withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .where(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def _shingle_pair_counts(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int,
    max_doc_freq: int | None,
    detect_fraction: float,
) -> DataFrame:
    """Shared inverted-index pair generator for the set-overlap family
    (Jaccard / containment): ``(id_a, id_b, n_a, n_b, n_common)`` with
    ``id_a < id_b`` — one posting-list self-join, df-capped per the
    guard documented on :func:`ngram_jaccard_pairs`."""
    base = df.select(
        F.col(id_col).alias("id"), shingles(F.col(text_col), k).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    # index rows carry n_sh (an int — cheap to duplicate per shingle,
    # saves re-joining doc sizes onto pairs later)
    ex = base.select("id", "n_sh", F.explode("sh").alias("s"))
    if max_doc_freq is not None:
        # Adaptive skew detection, SAMPLED (the same move the
        # politeness window makes for hot hosts, but on a seeded
        # document sample so the probe costs a fraction of a shingle
        # pass): a shingle with df > cap appears in a ``detect_fraction``
        # sample with expected df·fraction hits, so screening at half
        # that bound misses a truly-hot shingle only on an extreme
        # binomial tail (cap=10^4, fraction=0.1 → P[<500 of E=1000]
        # ≈ e^-140). Candidates are then CONFIRMED against their exact
        # df, so the final hot set is deterministic and exact.
        # The binomial screening guarantee needs a healthy expected
        # sample count (cap·fraction ≳ 20); for small caps fall back to
        # exact full-scan detection — sampling there could flip the
        # capped/uncapped decision run-to-run (Bernoulli sampling is
        # partition-layout dependent).
        if max_doc_freq * detect_fraction < 20:
            detect_fraction = 1.0
        sample_ex = (
            df.sample(fraction=detect_fraction, seed=7)
            .select(F.explode(shingles(F.col(text_col), k)).alias("s"))
        )
        cand_hot = (
            sample_ex.groupBy("s")
            .agg(F.count("*").alias("df_s"))
            .where(F.col("df_s") > max_doc_freq * detect_fraction / 2.0)
            .select("s")
        )
        if not cand_hot.isEmpty():
            # Capped path, built over ONE explicit exchange on the
            # shingle key: every consumer below (the window df count,
            # the per-doc size recount, both self-join sides) contains
            # the identical Exchange subtree, so ReuseExchange computes
            # the shingle HOF once per action instead of once per
            # consumer (~4 full passes in the naive broadcast-anti-join
            # formulation). The window recomputes EXACT per-shingle df
            # inline, so no separate confirm join is needed.
            w_s = Window.partitionBy("s")
            ex = (
                ex.repartition("s")
                .withColumn("_df", F.count("*").over(w_s))
                .where(F.col("_df") <= max_doc_freq)
                .drop("_df")
            )
            # capped per-doc sizes: re-count the surviving index rows
            # (narrow int table, one row per doc)
            ncap = ex.groupBy("id").agg(F.count("*").alias("n_cap"))
            ex = (
                ex.drop("n_sh")
                .join(ncap, "id")
                .withColumnRenamed("n_cap", "n_sh")
            )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("n_a"),
            F.col("b.n_sh").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
    )


def ngram_containment_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k: int = 3,
    threshold: float = 0.9,
    max_doc_freq: int | None = 10_000,
    detect_fraction: float = 0.1,
) -> DataFrame:
    """Asymmetric near-dup detection by shingle CONTAINMENT
    (Broder 1997's ``containment(A,B) = |A ∩ B| / |A|``): catches the
    pairs Jaccard structurally misses — a short document quoted whole
    inside a much longer one has Jaccard ≈ |A|/|B| (tiny) but
    containment 1.0. The standard use is killing wrapper pages (an
    article republished inside a portal template) and quote-mirrors.

    Output: ``(id_a, id_b, c_a_in_b, c_b_in_a, containment)`` with
    ``id_a < id_b``, kept when ``containment = max(c_a_in_b, c_b_in_a)
    >= threshold``. Same single posting-list self-join + count plan as
    :func:`ngram_jaccard_pairs` (shared generator, same df-cap guard);
    docs with fewer than ``k`` tokens have no shingles and never pair.
    """
    inter = _shingle_pair_counts(
        df, text_col, id_col, k, max_doc_freq, detect_fraction
    )
    out = inter.select(
        "id_a",
        "id_b",
        (F.col("n_common") / F.col("n_a")).alias("c_a_in_b"),
        (F.col("n_common") / F.col("n_b")).alias("c_b_in_a"),
    ).withColumn("containment", F.greatest("c_a_in_b", "c_b_in_a"))
    return out.where(F.col("containment") >= threshold).select(
        "id_a",
        "id_b",
        F.round("c_a_in_b", 6).alias("c_a_in_b"),
        F.round("c_b_in_a", 6).alias("c_b_in_a"),
        F.round("containment", 6).alias("containment"),
    )


# --------------------------------------------------------------------------
# MinHash + LSH
# --------------------------------------------------------------------------

_U64 = 1 << 64


def minhash_signature(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """MinHash signature via Kirsch-Mitzenmacher double hashing:
    ONE md5 per shingle, split into two little-endian uint64 halves
    (a = LE(digest[8:16]), b = LE(digest[0:8]) — exactly DuckDB's
    ``md5_number_lower``/``md5_number_upper``), then

        sig[h] = min over shingles of (a + h·b) mod 2^64

    emitted as decimal strings. The former scheme hashed every shingle
    ``num_hashes`` times (md5('h:'||s)) — 16× the md5 work for the
    same statistical guarantees (Kirsch & Mitzenmacher 2006: double
    hashing preserves the min-wise property for LSH purposes).
    Numeric minima are engine-identical: numpy uint64 wraps, DuckDB
    computes the same mod in HUGEINT, and this expression form uses
    decimal(38,0) arithmetic (ANSI-safe: 2^64 + 15·2^64 ≪ 10^38).

    This is the readable/portable EXPRESSION form; the hot path is
    :func:`minhash_signature_fast` (bit-identical, pinned by test)."""
    sh = shingles(text, k)
    # per-shingle (a, b) computed once, reused by every hash slot
    def _le_u64(s: Column, pairs: range) -> Column:
        # little-endian: least-significant byte first in the digest →
        # reverse the hex byte pairs, then base-16 → base-10 (Spark
        # conv is unsigned-64, exactly the range we need)
        hexcol = F.md5(s)
        rev = F.concat(*[F.substring(hexcol, 2 * p - 1, 2) for p in pairs])
        return F.conv(rev, 16, 10).cast("decimal(38,0)")

    ab = F.transform(
        sh,
        lambda s: F.struct(
            _le_u64(s, range(16, 8, -1)).alias("a"),  # digest[8:16] LE
            _le_u64(s, range(8, 0, -1)).alias("b"),   # digest[0:8] LE
        ),
    )
    return F.array(
        *[
            F.array_min(
                F.transform(
                    ab,
                    # 2^64 exceeds a java long, so the modulus literal
                    # must travel as a string and cast engine-side
                    lambda p: F.pmod(
                        p["a"] + F.lit(h) * p["b"],
                        F.lit(str(_U64)).cast("decimal(38,0)"),
                    ),
                )
            ).cast("string")
            for h in range(num_hashes)
        ]
    )


def minhash_band_buckets(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    persist_sig: bool = False,
    unpersist_inputs: list | None = None,
) -> DataFrame:
    """The banding front half of MinHash-LSH, shared by the batch join
    (:func:`minhash_lsh_pairs`) and the incremental probe
    (``operators/incremental.py``): per-doc signature → ``bands`` md5
    band buckets → exploded ``(id, bucket)`` assignments. One row per
    (doc, band); docs with < ``k`` tokens have no shingles and are
    excluded (hashing NULL signatures would collide every short doc
    pairwise). ``persist_sig`` persists the narrow signature frame —
    pass True when the caller's plan consumes the assignments more
    than once so the pandas minhash UDF runs once (caller's plan
    release frees it via the ContextCleaner; callers with an explicit
    release point pass ``unpersist_inputs`` to receive the handle,
    same contract as the set-sim joins)."""
    rows_per_band = num_hashes // bands
    sig = df.select(
        F.col(id_col).alias("id"),
        minhash_signature_fast(F.col(text_col), num_hashes, k).alias("sig"),
    ).where(F.col("sig").getItem(0).isNotNull())
    if persist_sig:
        sig = sig.persist()
        if unpersist_inputs is not None:
            unpersist_inputs.append(sig)
    band_cols = [
        F.md5(
            F.concat_ws(
                "|",
                F.lit(str(b)),
                *[
                    F.col("sig")[b * rows_per_band + r]
                    for r in range(rows_per_band)
                ],
            )
        ).alias(f"band{b}")
        for b in range(bands)
    ]
    banded = sig.select("id", *band_cols)
    return banded.select(
        "id",
        F.explode(
            F.array(*[F.col(f"band{b}") for b in range(bands)])
        ).alias("bucket"),
    )


def grouped_bucket_pairs(
    buckets: DataFrame,
    id_type: str,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Pair generation over exploded ``(id, bucket)`` assignments —
    the back half of MinHash-LSH, shared by batch and incremental
    paths: hot-bucket guard (counts pass + broadcast anti-join BEFORE
    any list agg), ``groupBy(bucket).collect_list(id)``, and the
    block-streamed vectorized pair emit. Returns
    ``(id_a, id_b, n_shared_bands)`` with ``id_a < id_b``."""
    import numpy as np
    import pandas as pd

    if max_bucket is not None:
        hot = (
            buckets.groupBy("bucket")
            .count()
            .where(F.col("count") > max_bucket)
            .select("bucket")
        )
        buckets = buckets.join(F.broadcast(hot), "bucket", "left_anti")
    grouped = buckets.groupBy("bucket").agg(
        F.collect_list("id").alias("ids")
    )
    grouped = grouped.where(F.size("ids") >= 2)

    def emit(batches):
        for pdf in batches:
            for ids in pdf["ids"]:
                # object-safe sort: ids keep their input type
                arr = np.asarray(ids)
                arr = arr[np.argsort(arr, kind="stable")]
                m = len(arr)
                # Upper-triangle pairs in ROW BLOCKS, one yielded frame
                # per block (full triu index arrays for a 100k-id
                # bucket would be ~80 GB); Arrow streams each block.
                blk = max(16, (2 << 20) // max(m, 1))
                col_idx = np.arange(m)
                for lo in range(0, m - 1, blk):
                    hi = min(lo + blk, m - 1)
                    mask = col_idx[None, :] > np.arange(lo, hi)[:, None]
                    ri, ci = np.nonzero(mask)
                    if len(ri):
                        yield pd.DataFrame(
                            {"id_a": arr[lo + ri], "id_b": arr[ci]}
                        )

    pairs = grouped.select("ids").mapInPandas(
        emit, f"id_a {id_type}, id_b {id_type}"
    )
    return (
        # duplicate input ids sort adjacent and would pair with
        # themselves — excluded like the old a.id < b.id join
        pairs.where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_bands"))
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """LSH candidate pairs: signature split into ``bands`` bands of
    ``num_hashes/bands`` rows; docs sharing any band bucket are
    candidates. Output (id_a, id_b, n_shared_bands), id_a < id_b.

    Hot-bucket guard: band buckets are md5-uniform for *distinct*
    texts, but a cluster of byte-identical documents collapses into
    one bucket whose pair set is quadratic in cluster size. Buckets
    larger than ``max_bucket`` are excluded from pair generation —
    at that size they are exact-duplicate clusters, which is
    ``exact_dedup``'s job (run it first; it is one cheap hash shuffle).
    ``max_bucket=None`` disables the guard.

    Plan shape (round 3): ONE signature pass (the narrow signature
    frame is persisted when the guard is on, so the pandas minhash UDF
    never recomputes); pairs come from ``groupBy(bucket).
    collect_list(id)`` + a per-bucket vectorized emit, NOT a bucket
    self-join — the former self-join + broadcast-anti guard consumed
    the signature lineage four times and Spark does not reuse the
    exchange across those consumers (measured 2.4× slower). The guard
    runs BEFORE the list aggregation: a counts pass (constant
    per-group state, map-side partials) finds the hot buckets and a
    broadcast anti-join drops their rows, so per-group aggregation
    state is genuinely ≤ ``max_bucket`` ids — a post-hoc
    ``size(ids)`` filter would still materialize a 10^8-doc identical
    cluster as one multi-GB agg buffer. The quadratic PAIR OUTPUT is
    yielded in bounded blocks through the mapInPandas generator
    (Arrow streams each block out), so worker memory never holds a
    bucket's full pair set — same streaming behavior as the old join,
    without its recomputation. Ids keep their input type (any
    orderable column works, not just long).

    Documents with fewer than ``k`` tokens have no shingles → an
    all-NULL signature, and are excluded from banding (hashing NULL
    signatures lands every short document in constant band buckets,
    colliding them all pairwise — a quadratic bomb and false-positive
    source at corpus scale).

    Round 4: banding and pair-emit live in :func:`minhash_band_buckets`
    / :func:`grouped_bucket_pairs` so the incremental path
    (``operators/incremental.py``) reuses byte-identical bucket and
    pair semantics."""
    buckets = minhash_band_buckets(
        df, text_col, id_col, num_hashes, bands, k,
        # the guard's counts pass consumes the signature lineage a
        # second time; persist the (narrow) signature frame so the
        # pandas minhash UDF runs ONCE (storage is spillable and freed
        # by the ContextCleaner when the result DF is released)
        persist_sig=max_bucket is not None,
    )
    id_type = df.schema[id_col].dataType.simpleString()
    return grouped_bucket_pairs(buckets, id_type, max_bucket)


# --------------------------------------------------------------------------
# SimHash (md5-half shingle hashes — DuckDB-reproducible end to end)
# --------------------------------------------------------------------------

def _md5_lower64(s: Column) -> Column:
    """Signed 64-bit little-endian lower md5 half — the bit pattern of
    DuckDB's ``md5_number_lower`` (LE of ``digest[8:16]``), as a Spark
    LONG. Reversed hex byte pairs → two 32-bit halves → wrap-combine
    via ``shiftleft`` (bitwise, so the sign bit never overflows)."""
    hexcol = F.md5(s)
    rev = F.concat(*[F.substring(hexcol, 2 * p - 1, 2) for p in range(16, 8, -1)])
    hi = F.conv(F.substring(rev, 1, 8), 16, 10).cast("long")
    lo = F.conv(F.substring(rev, 9, 8), 16, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def simhash64(text: Column, k: int = 2) -> Column:
    """64-bit SimHash over word k-shingles: for each bit position, sum
    ±1 over shingle hashes and take the sign. Built from JVM
    expressions (no Python); ~64 aggregate lambdas, acceptable for a
    fingerprint column computed once per document.

    The shingle hash is the md5 lower half (:func:`_md5_lower64`)
    rather than ``xxhash64`` so the whole fingerprint — tokenize →
    shingle → hash → bit votes → pack — is reproducible in DuckDB
    (``md5_number_lower``), which is what upgrades q16 from rows-only
    to a hash-checked oracle. Any uniform 64-bit hash gives SimHash
    the same statistical behavior; md5 is the engine-portable one."""
    sh = shingles(text, k)
    hashes = F.transform(sh, _md5_lower64)
    bit_terms = [
        F.aggregate(
            hashes,
            F.lit(0).cast("long"),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << b) if b < 63 else F.lit(-(2**63))) != 0, 1).otherwise(-1),
        )
        for b in range(64)
    ]
    out = F.lit(0).cast("long")
    for b, term in enumerate(bit_terms):
        bit_val = F.lit(1 << b) if b < 63 else F.lit(-(2**63))
        out = out + F.when(term > 0, bit_val).otherwise(F.lit(0).cast("long"))
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_block_cols(
    max_hamming: int, sh: str | Column = "sh"
) -> list[Column]:
    """Pigeonhole block-bucket expressions over a 64-bit simhash
    column: ``max_hamming + 1`` blocks (capped at 64), each rendered as
    the string ``'<block_idx>:<block_value>'``. SHARED by the batch
    operator (:func:`simhash_near_dups`) and the incremental state path
    (``operators/incremental._simhash_chunks``) — the cross-round
    recall proof requires byte-identical bucket strings on both sides,
    so the blocking lives in exactly one place."""
    n_blocks = min(max_hamming + 1, 64)
    bounds = [i * 64 // n_blocks for i in range(n_blocks)] + [64]
    cols = []
    for c in range(n_blocks):
        lo, hi = bounds[c], bounds[c + 1]
        mask = (1 << (hi - lo)) - 1
        cols.append(
            F.concat_ws(
                ":",
                F.lit(str(c)),
                F.shiftrightunsigned(sh, lo).bitwiseAND(F.lit(mask)),
            )
        )
    return cols


def simhash_near_dups(
    df: DataFrame,
    text_col: str,
    id_col: str,
    max_hamming: int = 3,
    max_bucket: int | None = 100_000,
) -> DataFrame:
    """Near-dup pairs by SimHash with EXACT recall at the requested
    radius: the 64-bit signature is split into ``max_hamming + 1``
    blocks, so by pigeonhole any pair within hamming ≤ max_hamming
    agrees exactly on at least one block and lands in a shared bucket
    (fixed 4×16-bit blocking only guarantees radius ≤ 3 and silently
    under-recalled at the former default of 8 — pinned by the
    brute-force equivalence test in test_training_ops). Narrower
    blocks trade more candidates for recall; the exact hamming filter
    keeps the output identical to brute force.

    Radius vs candidate volume: block width is ~64/(max_hamming+1)
    bits, so block buckets hold ~n/2^width docs even for RANDOM
    corpora — at the former default of 8 that is 9 blocks of ~7 bits,
    i.e. ~9·n²/2⁷ candidate pairs regardless of content. The default
    radius 3 (4×16-bit blocks, ~4·n²/2¹⁶) is the largest radius whose
    candidate volume stays sub-quadratic at realistic corpus sizes;
    raise it only on pre-filtered slices.

    Hot-bucket guard (mirrors ``minhash_lsh_pairs``): a cluster of
    byte-identical documents has identical signatures, so EVERY block
    bucket it touches collapses and the self-join is quadratic in
    cluster size. Buckets larger than ``max_bucket`` are excluded from
    pair generation — at that size they are exact-duplicate clusters,
    which is ``exact_dedup``'s job (run it first). Exclusion costs
    recall only for pairs whose ONLY agreeing block is an excluded
    one. ``max_bucket=None`` disables the guard."""
    sig = df.select(
        F.col(id_col).alias("id"), simhash64_fast(F.col(text_col)).alias("sh")
    )
    if max_bucket is not None:
        # see minhash_lsh_pairs: the guard's counts pass re-consumes
        # the signature lineage — persist the narrow (id, sh) frame so
        # the simhash UDF runs once
        sig = sig.persist()
    block_cols = simhash_block_cols(max_hamming)
    chunks = sig.select(
        "id",
        "sh",
        F.explode(F.array(*block_cols)).alias("chunk"),
    )
    # One signature pass (persisted when guarded — same plan shape as
    # minhash_lsh_pairs): group each block bucket, emit surviving
    # pairs with a vectorized XOR-popcount INSIDE the bucket — the
    # hamming filter runs before any pair ever hits a shuffle, and the
    # hot-bucket guard drops oversized buckets before the list agg.
    # Pre-aggregation guard (see minhash_lsh_pairs): a post-hoc
    # size(rows) filter would still build the oversized bucket's full
    # struct list in one aggregation buffer; count first (constant
    # state), anti-join the tiny hot set away, THEN collect.
    if max_bucket is not None:
        hot = (
            chunks.groupBy("chunk")
            .count()
            .where(F.col("count") > max_bucket)
            .select("chunk")
        )
        chunks = chunks.join(F.broadcast(hot), "chunk", "left_anti")
    grouped = chunks.groupBy("chunk").agg(
        F.collect_list(F.struct("id", "sh")).alias("rows")
    )
    grouped = grouped.where(F.size("rows") >= 2)

    import numpy as np
    import pandas as pd

    mh = int(max_hamming)
    id_type = df.schema[id_col].dataType.simpleString()
    # byte-popcount lookup table: unpackbits on a full pair set is an
    # 8× memory blowup; LUT[bytes].sum is flat
    _POP = np.array([bin(i).count("1") for i in range(256)], dtype=np.uint8)

    def emit(batches):
        for pdf in batches:
            for rows in pdf["rows"]:
                ids = np.asarray([r["id"] for r in rows])
                shs = np.asarray(
                    [r["sh"] for r in rows], dtype=np.int64
                ).astype(np.uint64)
                order = np.argsort(ids, kind="stable")
                ids, shs = ids[order], shs[order]
                m = len(ids)
                # blockwise hamming of rows [lo,hi) against all m
                # columns: one yielded frame per block bounds worker
                # memory (the radius filter runs BEFORE any pair
                # leaves the block), exactly like the minhash emit.
                blk = max(16, (2 << 20) // max(m, 1))
                col_idx = np.arange(m)
                for lo in range(0, m - 1, blk):
                    hi = min(lo + blk, m - 1)
                    x = shs[lo:hi, None] ^ shs[None, :]
                    ham = (
                        _POP[x.view(np.uint8)]
                        .reshape(hi - lo, m, 8)
                        .sum(axis=2, dtype=np.int32)
                    )
                    keep = (ham <= mh) & (
                        col_idx[None, :] > np.arange(lo, hi)[:, None]
                    )
                    ri, ci = np.nonzero(keep)
                    if len(ri):
                        yield pd.DataFrame(
                            {
                                "id_a": ids[lo + ri],
                                "id_b": ids[ci],
                                "hamming": ham[ri, ci],
                            }
                        )

    pairs = grouped.select("rows").mapInPandas(
        emit, f"id_a {id_type}, id_b {id_type}, hamming int"
    )
    # a pair within radius can share several blocks — keep one copy
    # (the hamming value is identical in every copy); duplicate input
    # ids sort adjacent and would self-pair at hamming 0 — the old
    # a.id < b.id join excluded those
    return (
        pairs.where(F.col("id_a") != F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.min("hamming").alias("hamming"))
    )


def simhash64_fast(text: Column, k: int = 2) -> Column:
    """Same SimHash as :func:`simhash64` (bit-identical — pinned by
    ``test_simhash_fast_equals_expression``), with the 64 per-bit ±1
    aggregations run as one vectorized numpy bit-unpack in a pandas
    UDF instead of 64 codegen'd aggregate lambdas (whose generated
    code dominates runtime). The shingle hash is the md5 lower half
    computed with ``hashlib`` inside the same UDF — one digest per
    shingle, the identical convention (and cost) as the minhash
    kernel, and DuckDB-reproducible via ``md5_number_lower``."""
    import hashlib as _hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    def _sig(batch):
        out = np.zeros(len(batch), dtype=np.uint64)
        shifts = np.arange(64, dtype=np.uint64)
        for i, sh in enumerate(batch):
            if sh is None or len(sh) == 0:
                continue
            h = np.frombuffer(
                b"".join(_hashlib.md5(s.encode()).digest()[8:16] for s in sh),
                dtype="<u8",
            )
            bits = ((h[:, None] >> shifts) & np.uint64(1)).astype(np.int64)
            votes = (2 * bits - 1).sum(axis=0)
            out[i] = np.packbits(
                (votes > 0).astype(np.uint8), bitorder="little"
            ).view(np.uint64)[0]
        return pd.Series(out.view(np.int64))

    return pandas_udf(_sig, LongType())(shingles(text, k))


def minhash_signature_fast(text: Column, num_hashes: int = 16, k: int = 3) -> Column:
    """Same signature as :func:`minhash_signature` (double-hash minima
    over the same sorted distinct shingles — pinned by test), computed
    in one pandas UDF: ONE hashlib.md5 per shingle, then a single
    numpy outer add for all ``num_hashes`` slots (uint64 wraps mod
    2^64 natively). The former per-(hash,shingle) md5 scheme did 16×
    the digest work — at 10^10 documents the md5 loop IS the minhash
    cost, so the kernel change is the scale win, not a micro-opt."""
    import hashlib as _hashlib

    import numpy as np
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import ArrayType, StringType

    def _sig(sh_series):
        hs = np.arange(num_hashes, dtype=np.uint64)
        out = []
        for sh in sh_series:
            if sh is None or len(sh) == 0:
                # expression version yields array_min(empty) = NULL per
                # slot — match it exactly
                out.append([None] * num_hashes)
                continue
            digs = [_hashlib.md5(s.encode()).digest() for s in sh]
            # a = LE(digest[8:16]), b = LE(digest[0:8]) — DuckDB's
            # md5_number_lower / md5_number_upper
            raw = np.frombuffer(b"".join(digs), dtype="<u8").reshape(-1, 2)
            a, b = raw[:, 1], raw[:, 0]
            mins = (a[None, :] + hs[:, None] * b[None, :]).min(axis=1)
            out.append([str(int(v)) for v in mins])
        return pd.Series(out)

    return pandas_udf(_sig, ArrayType(StringType()))(shingles(text, k))


# --------------------------------------------------------------------------
# exact-substring span removal (suffix-array dedup, distributed form)
# --------------------------------------------------------------------------

def exact_substring_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
) -> DataFrame:
    """ExactSubstr cross-document duplicated-substring removal (Lee et
    al. 2022, "Deduplicating Training Data Makes Language Models
    Better" §4.1: delete every substring of >= k tokens that occurs
    more than once in the corpus, keeping one occurrence). The
    reference algorithm builds a corpus-wide suffix array — inherently
    sequential and RAM-bound; the distributed equivalent is sliding
    k-token window hashing: a window whose text occurs at more than
    one (doc, pos) is a duplicated-substring occurrence, the globally
    first occurrence (``min(struct(id, pos))`` — any orderable id
    type) survives, every other occurrence is deleted from its
    document. Overlapping/adjacent deleted windows merge into maximal
    spans, so a copied 200-token paragraph comes out as ONE span —
    exactly the maximal repeat the suffix array would report — and
    documents are re-assembled from their surviving tokens in order.

    Output: one row per input doc —
    ``(id_col, text_dedup, n_tokens_removed, n_spans_removed)``.
    Docs shorter than ``k`` tokens pass through untouched (no windows).
    Text is whitespace-normalized/lowercased by tokenization, like
    ``span_dedup``. When the first occurrence of substring A overlaps
    a non-first occurrence of a different substring B inside the same
    doc, B's deletion wins for the shared tokens (union-of-deletions
    semantics; the suffix-array reference makes the same class of
    tie-break arbitrarily).

    Scale shape (100 TB):
    - windows explode to ~n_tokens rows — the same order the suffix
      array itself holds — but ONLY ``(id, pos, md5)`` ever shuffles:
      the 32-char hash is computed inside the per-row ``transform``,
      window strings are never materialized corpus-wide (naive
      windowing would shuffle k x corpus bytes);
    - winner election is ``groupBy(h).agg(min(struct), count)`` with
      map-side partial agg — a boilerplate window shared by 10^8 docs
      is ONE reduce group, never a hot partition;
    - the loser join back on ``h`` matches exactly one winner row per
      hash — no fanout on hot windows;
    - span merging is a gaps-and-islands window partitioned BY
      DOCUMENT (every doc its own group — fully parallel, never a
      global window);
    - merged spans collect to a per-doc array (bounded by the doc's
      own token count, the bound the doc row already pays) and join
      back docs-sized; reassembly is one in-row indexed ``filter`` —
      no token-level shuffle.
    """
    from .text import words_col

    toks = words_col(F.col(text_col))
    n = F.size(toks)
    # per-window md5 built inside the transform: only hashes leave the row
    win_hashes = F.when(
        n >= k,
        F.transform(
            F.sequence(F.lit(0), n - k),
            lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i + 1, k))),
        ),
    ).otherwise(F.array().cast("array<string>"))
    occ = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(win_hashes).alias("pos", "h"),
    )
    winners = occ.groupBy("h").agg(
        F.min(F.struct("id", "pos")).alias("w"),
        F.count("*").alias("cnt"),
    )
    losers = (
        occ.join(winners, "h")
        .where(
            (F.col("cnt") >= 2)
            & ~((F.col("id") == F.col("w.id")) & (F.col("pos") == F.col("w.pos")))
        )
        .select("id", "pos", (F.col("pos") + F.lit(k)).alias("end"))
    )
    wdoc = Window.partitionBy("id").orderBy("pos")
    run_max_end = F.max("end").over(
        wdoc.rowsBetween(Window.unboundedPreceding, -1)
    )
    flagged = losers.withColumn(
        "new_island",
        (F.col("pos") > F.coalesce(run_max_end, F.lit(-1))).cast("int"),
    ).withColumn(
        "island",
        F.sum("new_island").over(
            wdoc.rowsBetween(Window.unboundedPreceding, 0)
        ),
    )
    spans = flagged.groupBy("id", "island").agg(
        F.min("pos").alias("s"), F.max("end").alias("e")
    )
    spans_doc = spans.groupBy("id").agg(
        F.array_sort(F.collect_list(F.struct("s", "e"))).alias("spans")
    )
    base = df.select(F.col(id_col).alias("id"), toks.alias("toks"))
    sp = F.coalesce(
        F.col("spans"), F.array().cast("array<struct<s:int,e:int>>")
    )
    return (
        base.join(spans_doc, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.concat_ws(
                " ",
                F.filter(
                    F.col("toks"),
                    lambda t, i: ~F.exists(
                        sp, lambda s: (s["s"] <= i) & (i < s["e"])
                    ),
                ),
            ).alias("text_dedup"),
            F.aggregate(
                sp,
                F.lit(0).cast("long"),
                lambda acc, s: acc + (s["e"] - s["s"]),
            ).alias("n_tokens_removed"),
            F.size(sp).cast("long").alias("n_spans_removed"),
        )
    )


def winnow_fingerprints(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 6,
    with_positions: bool = True,
) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken
    2003, the MOSS algorithm): hash every character k-gram, slide a
    w-hash window, keep the LEFTMOST minimum of each window, emit the
    distinct ``(doc_id, pos, fp)`` picks. The guarantee that makes it
    the local-similarity fingerprint (vs SimHash's global one): any
    substring shared between two documents of length ≥ w + k − 1
    contributes at least one IDENTICAL fingerprint to both — so a
    fingerprint equi-join finds partial overlaps (quoted passages,
    plagiarized sections) that whole-document signatures dilute away.

    Density is ~2/(w+1) of positions, so the fingerprint table is a
    bounded fraction of corpus characters; downstream joins are
    equi-key on ``fp``.

    The k-gram hash is the md5 lower half masked to 63 bits so the
    whole pipeline is DuckDB-reproducible (``md5_number_lower %
    2^63``) — the mask matters because the window minimum is an ORDER
    comparison and Spark longs are signed where DuckDB's hash is
    unsigned; clearing the sign bit makes both engines rank
    identically. Docs shorter than k emit nothing; docs with fewer
    than w k-grams form one window (the standard short-document
    convention). Ties inside a window pick the leftmost minimum —
    deterministic and engine-portable. Rows with a NULL id are
    dropped JVM-side before the kernel: a null id is useless to every
    downstream equi-join, and filtering it keeps integer id batches
    free of nulls, which would otherwise force Arrow→pandas onto
    lossy float64 (ids above 2^53 would corrupt silently).

    ``with_positions=False`` switches the output to per-doc DISTINCT
    fingerprints ``(id, n_fp, fp)`` with the doc's distinct-fp count
    duplicated per row (the ``n_sh`` move from the shingle index) —
    the overlap join consumes exactly that shape and skips both the
    ``distinct()`` exchange and a separate sizes groupBy+join.

    Kernel shape: the gram hashing runs in ONE Arrow-batched pandas
    pass (`mapInPandas`) — hashlib md5 is bit-identical to both
    Spark's `F.md5` and DuckDB's `md5_number_lower` (LE of
    digest[8:16], sign bit cleared), and the window minimum is a
    vectorized numpy `sliding_window_view` argmin (argmin's
    first-occurrence rule IS the leftmost tie-break). Lower-casing
    stays JVM-side (`F.lower` before the UDF) so engine `lower()`
    parity is never a UDF concern. The first cut of this kernel was
    pure JVM array HOFs (transform/slice/array_min); at ~12 string
    expressions per gram it benched ~8 s for 10M grams at 32 cores —
    the pandas pass is the same trade that won for simhash/minhash.
    Per-doc `np.unique` makes the output distinct map-side, so the
    operator has NO shuffle at all; ASCII texts (the common webtext
    case after lowering) hash via one bulk encode + byte slicing.
    """
    import numpy as np
    import pandas as pd

    id_field = docs.schema[id_col]
    id_ddl = f"`{id_col}` {id_field.dataType.simpleString()}"
    out_schema = (
        f"{id_ddl}, n_fp long, fp long" if not with_positions
        else f"{id_ddl}, pos long, fp long"
    )
    mask = 0x7FFFFFFFFFFFFFFF

    def _winnow_batches(batches):
        import hashlib

        def doc_grams(text):
            n_g = len(text) - k + 1
            if n_g < 1:
                return None
            if text.isascii():
                raw = text.encode()
                hashes = [
                    int.from_bytes(
                        hashlib.md5(raw[i:i + k]).digest()[8:16], "little"
                    ) & mask
                    for i in range(n_g)
                ]
            else:
                hashes = [
                    int.from_bytes(
                        hashlib.md5(text[i:i + k].encode()).digest()[8:16],
                        "little",
                    ) & mask
                    for i in range(n_g)
                ]
            return np.asarray(hashes, dtype=np.int64)

        def doc_picks(text):
            if text is None:
                return None
            arr = doc_grams(text)
            if arr is None:
                return None
            if len(arr) <= w:
                j = int(arr.argmin())
                return np.array([[j + 1, arr[j]]], dtype=np.int64)
            wins = np.lib.stride_tricks.sliding_window_view(arr, w)
            am = wins.argmin(axis=1)  # first occurrence == leftmost min
            pos = np.arange(len(am), dtype=np.int64) + am + 1
            picks = np.stack([pos, arr[pos - 1]], axis=1)
            return np.unique(picks, axis=0)

        for pdf in batches:
            # dtype-preserving id fan-out: index the ORIGINAL pandas
            # column by row position instead of re-materializing a
            # Series (which would silently widen through the batch
            # dtype on mixed batches)
            rows, aux, fps = [], [], []
            for rowno, text in enumerate(pdf["_t"]):
                p = doc_picks(text)
                if p is None:
                    continue
                if with_positions:
                    rows.extend([rowno] * len(p))
                    aux.append(p[:, 0])
                    fps.append(p[:, 1])
                else:
                    uf = np.unique(p[:, 1])
                    rows.extend([rowno] * len(uf))
                    aux.append(np.full(len(uf), len(uf), dtype=np.int64))
                    fps.append(uf)
            ids = pdf[id_col].iloc[rows].reset_index(drop=True)
            empty = np.array([], dtype=np.int64)
            yield pd.DataFrame({
                id_col: ids,
                ("pos" if with_positions else "n_fp"):
                    np.concatenate(aux) if aux else empty,
                "fp": np.concatenate(fps) if fps else empty,
            })

    base = docs.where(F.col(id_col).isNotNull()).select(
        F.col(id_col), F.lower(F.col(text_col)).alias("_t")
    )
    return base.mapInPandas(_winnow_batches, schema=out_schema)


def winnow_overlap_pairs(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 6,
    min_shared: int = 2,
    max_doc_freq: int = 10_000,
    detect_fraction: float = 0.1,
) -> DataFrame:
    """Local-overlap candidate pairs from winnowing fingerprints: two
    documents sharing ``min_shared`` or more distinct fingerprints are
    emitted with an overlap score ``n_common / min(n_a, n_b)`` (the
    containment normalization — right for partial overlap, where the
    smaller document may be wholly quoted inside the larger one).

    Scale shape mirrors :func:`_shingle_pair_counts`: one posting-list
    self-join on the fingerprint key, never a cross join, with a
    df-cap guard — a fingerprint present in more than ``max_doc_freq``
    documents (boilerplate: headers, license blocks shared corpus-wide)
    is dropped from the vocabulary before the join, since its posting
    list alone would contribute df² candidate pairs. The cap is GATED
    by the same sampled hot-key probe as the shingle family (a seeded
    doc sample is re-winnowed and screened at half the scaled cap;
    small caps fall back to exact detection): the common no-boilerplate
    corpus skips the window sort entirely, and when it does trigger the
    exact in-window df count runs over one explicit exchange on ``fp``
    that ReuseExchange shares with the size recount and both join
    sides. The per-doc distinct and the doc sizes both come map-side
    from the kernel's ``with_positions=False`` shape — no ``distinct``
    exchange, no sizes groupBy+join. Winnowing already bounds the
    table to ~2/(w+1) of corpus characters, so the join input is a
    fraction of the shingle-index equivalents."""
    ex = winnow_fingerprints(
        docs, text_col, id_col, k=k, w=w, with_positions=False
    ).select(F.col(id_col).alias("id"), "n_fp", "fp")
    if max_doc_freq is not None:
        if max_doc_freq * detect_fraction < 20:
            detect_fraction = 1.0
        cand_hot = (
            winnow_fingerprints(
                docs.sample(fraction=detect_fraction, seed=7),
                text_col, id_col, k=k, w=w, with_positions=False,
            )
            .groupBy("fp").agg(F.count("*").alias("df_fp"))
            .where(F.col("df_fp") > max_doc_freq * detect_fraction / 2.0)
            .select("fp")
        )
        if not cand_hot.isEmpty():
            w_fp = Window.partitionBy("fp")
            ex = (
                ex.repartition("fp")
                .withColumn("_df", F.count("*").over(w_fp))
                .where(F.col("_df") <= max_doc_freq)
                .drop("_df")
            )
            ncap = ex.groupBy("id").agg(F.count("*").alias("n_cap"))
            ex = (
                ex.drop("n_fp")
                .join(ncap, "id")
                .withColumnRenamed("n_cap", "n_fp")
            )
    a, b = ex.alias("a"), ex.alias("b")
    return (
        a.join(b, (F.col("a.fp") == F.col("b.fp")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_fp").alias("n_a"),
            F.col("b.n_fp").alias("n_b"),
        )
        .agg(F.count("*").alias("n_common"))
        .where(F.col("n_common") >= min_shared)
        .select(
            "id_a",
            "id_b",
            F.col("n_common").cast("long").alias("n_common"),
            F.round(
                F.col("n_common") / F.least(F.col("n_a"), F.col("n_b")), 6
            ).alias("overlap"),
        )
    )


# --------------------------------------------------------------------------
# Exact set-similarity join by prefix filtering (AllPairs / PPJoin family)
# --------------------------------------------------------------------------

def _setsim_prefix_parts(
    docs: DataFrame,
    threshold_num: int,
    threshold_den: int,
    text_col: str,
    id_col: str,
):
    """Shared front half of the exact set-similarity joins
    (:func:`prefix_jaccard_pairs`, :func:`containment_pairs`) — THE
    single definition of tokenize/explode (cached: it feeds ~7 plan
    references), per-doc sizes (cached: three joins read it), the
    vocab df agg, the per-doc rarity window and the all-integer
    prefix cut ``rn <= sz - ⌈p·sz/q⌉ + 1`` — so the two joins can never
    drift apart on rarity order or the ceil trick. Returns
    ``(tok, sizes, prefix)``; callers own candidate generation and
    the verify gate (that is where the two algorithms differ).

    Cache lifetime: ``tok``/``sizes`` are persisted here but consumed
    lazily by the plan the public joins return, so this module cannot
    unpersist them — the CALLER owns the lifetime. Both public joins
    expose it via their ``unpersist_inputs`` hook: pass a list and
    they append the cached frames for the caller to
    ``.unpersist()`` after materializing the result (long-lived
    sessions issuing many set-sim joins leak executor storage
    otherwise; one-shot queries can ignore it — session teardown
    reclaims everything)."""
    from pyspark.sql import Window

    from .text import words_col

    p, q = threshold_num, threshold_den
    tok = docs.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(words_col(F.col(text_col)))).alias(
            "w"
        ),
    ).cache()
    sizes = tok.groupBy("id").agg(F.count(F.lit(1)).alias("sz")).cache()
    dfs = tok.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("id").orderBy("df", "w")
    ranked = (
        tok.join(dfs, "w")
        .withColumn("rn", F.row_number().over(w_doc))
        .join(sizes, "id")
    )
    # prefix length = sz − ⌈p·sz/q⌉ + 1, all-integer ceil
    min_inter = F.floor((p * F.col("sz") + (q - 1)) / q)
    prefix = ranked.where(F.col("rn") <= F.col("sz") - min_inter + 1)
    return tok, sizes, prefix


def _setsim_pair_inter(cand: DataFrame, tok: DataFrame) -> DataFrame:
    """Shared verify-count: exact intersection sizes for candidate (id_a, id_b)
    pairs via two equi-joins + one count agg — candidate pairs only,
    never all pairs."""
    ta = tok.select(F.col("id").alias("id_a"), "w")
    tb = tok.select(F.col("id").alias("id_b"), "w")
    return (
        cand.join(ta, "id_a")
        .join(tb, ["id_b", "w"])
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )


def prefix_jaccard_pairs(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
    unpersist_inputs: list | None = None,
) -> DataFrame:
    """EXACT token-set Jaccard join at threshold ``p/q`` via prefix
    filtering (Chaudhuri/Ganti/Kaushik 2006 SSJoin, Bayardo et al.
    2007 AllPairs): unlike the MinHash/SimHash paths this has ZERO
    false negatives — two docs with Jaccard ≥ t MUST share at least
    one token inside each other's rarest-``(|d| − ⌈t·|d|⌉ + 1)``
    prefix, so candidate generation only joins the prefix postings
    and everything else is provably prunable.

    The threshold is a RATIONAL ``p/q``: the prefix bound
    (``⌈p·|d|/q⌉`` by integer arithmetic) and the verify gate
    (``q·inter ≥ p·(|a|+|b|−inter)``) are computed entirely in
    integers, so no float boundary can silently drop a pair in
    either engine — the reported jaccard is the only float, rounded
    for display after the cut.

    Scale shape: token df is one vocab-sized agg (shuffle join back —
    webtext vocabularies don't broadcast); per-doc rarity ranks are a
    doc-partitioned window (parallel by construction, never a global
    sort); the candidate join touches ONLY prefix postings (the
    rarest tokens — their posting lists are short by construction,
    which is the algorithm's whole point: frequent tokens never
    generate candidates unless a doc is almost all stopwords);
    verification is two equi-key joins + a count agg over candidate
    pairs, never all pairs. A corpus of near-identical docs still
    degrades to its true pair count — run exact_dedup first, as the
    dedup pipeline already does.

    Returns ``(id_a, id_b, inter, size_a, size_b, jaccard)``.
    """
    p, q = threshold_num, threshold_den
    tok, sizes, prefix_full = _setsim_prefix_parts(
        docs, p, q, text_col, id_col
    )
    if unpersist_inputs is not None:
        unpersist_inputs.extend([tok, sizes])
    prefix = prefix_full.select("w", "id")
    cand = (
        prefix.alias("x")
        .join(
            prefix.alias("y"),
            (F.col("x.w") == F.col("y.w"))
            & (F.col("x.id") < F.col("y.id")),
        )
        .select(
            F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b")
        )
        .distinct()
    )
    inter = _setsim_pair_inter(cand, tok)
    sa = sizes.select(
        F.col("id").alias("id_a"), F.col("sz").alias("size_a")
    )
    sb = sizes.select(
        F.col("id").alias("id_b"), F.col("sz").alias("size_b")
    )
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(
            q * F.col("inter")
            >= p * (F.col("size_a") + F.col("size_b") - F.col("inter"))
        )
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.round(
                F.col("inter")
                / (
                    F.col("size_a") + F.col("size_b") - F.col("inter")
                ).cast("double"),
                6,
            ).alias("jaccard"),
        )
    )


def containment_pairs(
    docs: DataFrame,
    threshold_num: int = 3,
    threshold_den: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    unpersist_inputs: list | None = None,
) -> DataFrame:
    """EXACT token-set CONTAINMENT join at rational threshold ``p/q``
    — the ASYMMETRIC sibling of :func:`prefix_jaccard_pairs` and the
    quote / excerpt / syndication detector Jaccard structurally can't
    be: a 12-token pull-quote inside a 600-token article has Jaccard
    ~0.02 but containment 1.0.

    Emits DIRECTED pairs ``(id_a, id_b)`` with
    ``|A∩B| / |A| ≥ p/q`` (A's set mostly inside B), ``a ≠ b``. Same
    zero-false-negative prefix principle, asymmetric form: if
    ``inter ≥ m = ⌈p·|A|/q⌉`` then B shares at least one of A's
    ``|A| − m + 1`` globally-rarest tokens, so candidates join only
    A-side PREFIX postings against full postings — and the verify
    gate ``q·inter ≥ p·|A|`` is all-integer, so no float boundary can
    drop a pair in either engine.

    Scale shape mirrors the Jaccard join (vocab-sized df agg with
    shuffle join back, doc-partitioned rarity window, candidate join
    bounded by prefix-token df); the asymmetry costs one side: the
    probe side is FULL postings (a superset B may share none of its
    own rare tokens with A), so pair volume is Σ_prefix-tokens df(w)
    — still rare-token-bounded, never all-pairs. Empty-token docs
    never enter the postings and pair with nothing (containment from
    an empty set is vacuous, not 1.0 — documented choice).

    Returns ``(id_a, id_b, inter, size_a, size_b, containment)``.
    """
    p, q = threshold_num, threshold_den
    tok, sizes, prefix_full = _setsim_prefix_parts(
        docs, p, q, text_col, id_col
    )
    if unpersist_inputs is not None:
        unpersist_inputs.extend([tok, sizes])
    prefix = prefix_full.select(F.col("id").alias("id_a"), "w")
    cand = (
        prefix.join(
            tok.select(F.col("id").alias("id_b"), "w"), "w"
        )
        .where(F.col("id_a") != F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    inter = _setsim_pair_inter(cand, tok)
    sa = sizes.select(F.col("id").alias("id_a"), F.col("sz").alias("size_a"))
    sb = sizes.select(F.col("id").alias("id_b"), F.col("sz").alias("size_b"))
    return (
        inter.join(sa, "id_a")
        .join(sb, "id_b")
        .where(q * F.col("inter") >= p * F.col("size_a"))
        .select(
            "id_a",
            "id_b",
            F.col("inter").cast("long").alias("inter"),
            F.col("size_a").cast("long").alias("size_a"),
            F.col("size_b").cast("long").alias("size_b"),
            F.round(
                F.col("inter") / F.col("size_a").cast("double"), 6
            ).alias("containment"),
        )
    )


def novelty_fraction(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    order_col: str = "doc_id",
) -> DataFrame:
    """Per-document NOVELTY: the fraction of a doc's distinct
    k-shingles never seen in any EARLIER doc (crawl order = the
    caller's integer order column, the q146 convention — no global
    window). The incremental-curation signal: a syndication copy
    scores ~0, boilerplate-heavy pages score low, genuinely new
    content scores ~1 — and unlike the pairwise dedup paths this is
    corpus-linear (one shingle-level min(order) agg + one join back).

    Ties: two docs sharing a shingle at the SAME order value both
    count it as novel only for the one that IS the min — equal order
    values make it novel for both (first-crawl batches are
    simultaneous; documented). Docs too short to shingle (< k tokens)
    report NULL novelty via try_divide.

    Output: ``(id, n_shingles, n_new, novelty)``; novelty round-6.
    """
    sh = docs.select(
        F.col(id_col).alias("id"),
        F.col(order_col).alias("o"),
        # shingles() is already distinct+sorted
        F.explode_outer(shingles(F.col(text_col), k)).alias("s"),
    )
    first = sh.where(F.col("s").isNotNull()).groupBy("s").agg(
        F.min("o").alias("fo")
    )
    joined = sh.join(first, "s", "left")
    return (
        joined.groupBy("id")
        .agg(
            F.count("s").cast("long").alias("n_shingles"),
            F.sum(
                F.when(F.col("fo") == F.col("o"), 1).otherwise(0)
            )
            .cast("long")
            .alias("n_new"),
        )
        .withColumn(
            "novelty",
            F.round(
                F.try_divide(
                    F.col("n_new").cast("double"),
                    F.col("n_shingles").cast("double"),
                ),
                6,
            ),
        )
    )


def oph_signature_table(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k_slots: int = 32,
    shingle_k: int = 3,
) -> DataFrame:
    """One-Permutation MinHash with rotation densification — the
    signature that costs ONE hash per shingle instead of ``k_slots``
    (Li, Owen & Zhang, NIPS 2012; densification: Shrivastava & Li,
    ICML 2014).

    Classic ``minhash_signature`` evaluates k hash functions per
    shingle (k·|shingles| md5 computations per doc — the dominant CPU
    cost of signature building at corpus scale). OPH hashes each
    shingle ONCE, scatters hashes into ``pmod(h, k_slots)`` bins, and
    takes the per-bin minimum; an empty bin borrows from the nearest
    non-empty bin to its right (circular), with the borrow distance
    XOR-mixed in (``v XOR t`` — XOR, never ``+``: addition near 2^63
    would overflow, which ANSI Spark throws on and DuckDB rejects)
    so two docs sharing a donor bin at different distances don't
    fake-collide. Per-slot collision probability remains ~Jaccard
    (the 2014 paper's unbiasedness argument), so
    est_J = |equal slots| / k_slots.

    Scale shape: the hash scatter is one explode + hash-agg
    (map-side-combinable min); densification runs per doc over a
    2·k_slots-row frame (bounded window inside the doc partition,
    wraparound via the doubled-grid trick) — no joins between docs,
    no k-hash fan-out. Empty docs (no shingles) yield NULL
    signatures in every slot.

    Output: ``(id_col, slot int, sig long|NULL)`` — exactly
    ``k_slots`` rows per input doc.
    """
    if k_slots < 2:
        raise ValueError("oph needs k_slots >= 2")
    ids = df.select(F.col(id_col)).distinct()
    ex = df.select(
        F.col(id_col),
        F.explode(shingles(F.col(text_col), shingle_k)).alias("_sh"),
    ).select(
        id_col,
        _md5_lower64(F.col("_sh"))
        .bitwiseAND(F.lit(0x7FFFFFFFFFFFFFFF))
        .alias("_h"),
    )
    binned = ex.groupBy(
        id_col, F.pmod(F.col("_h"), F.lit(k_slots)).alias("slot")
    ).agg(F.min("_h").alias("_v"))
    # Densify per doc with pure JVM nested HOFs over a k-entry slot
    # map: for slot s the borrow distance t0 is the smallest t with
    # bin (s+t) mod k occupied (identical to the doubled-grid
    # forward-window derivation the oracle replays — k*k map lookups
    # per doc in codegen beat a k-per-doc grid join + two window
    # passes by ~5x measured, and the only shuffle left is the
    # binned groupBy).
    m = binned.groupBy(id_col).agg(
        F.map_from_arrays(
            F.collect_list("slot"), F.collect_list("_v")
        ).alias("_mp")
    )
    slots = F.sequence(F.lit(0), F.lit(k_slots - 1))

    def _sig(s):
        # F.get, not element_at: an empty doc has no occupied bins,
        # the filtered array is EMPTY, and ANSI element_at would
        # throw on index 1 where get returns the NULL we want.
        t0 = F.get(
            F.filter(
                slots,
                lambda t: F.map_contains_key(
                    F.col("_mp"), F.pmod(s + t, F.lit(k_slots))
                ),
            ),
            0,
        )
        return F.element_at(
            F.col("_mp"), F.pmod(s + t0, F.lit(k_slots))
        ).bitwiseXOR(t0)

    dense = ids.join(m, id_col, "left").select(
        id_col,
        F.transform(slots, _sig).alias("_sigs"),
    )
    return dense.select(
        id_col,
        F.posexplode_outer(F.col("_sigs")).alias("slot", "sig"),
    ).select(
        id_col,
        F.col("slot").cast("int"),
        F.col("sig"),
    )


def oph_jaccard_estimates(
    pairs: DataFrame,
    sigs: DataFrame,
    id_col: str = "doc_id",
    k_slots: int = 32,
) -> DataFrame:
    """Per-pair OPH Jaccard estimate from two signature tables: join
    both sides' k-slot rows and count equal signatures. ``pairs``
    must carry ``id_a``/``id_b``; NULL slots (empty docs) never count
    as equal. Output: ``(id_a, id_b, slots_equal, est_jaccard)``."""
    sa = sigs.select(
        F.col(id_col).alias("id_a"), "slot", F.col("sig").alias("_sa")
    )
    sb = sigs.select(
        F.col(id_col).alias("id_b"), "slot", F.col("sig").alias("_sb")
    )
    return (
        pairs.join(sa, "id_a")
        .join(sb, ["id_b", "slot"])
        .groupBy("id_a", "id_b")
        .agg(
            F.sum(
                (
                    F.col("_sa").isNotNull()
                    & F.col("_sb").isNotNull()
                    & (F.col("_sa") == F.col("_sb"))
                ).cast("long")
            ).alias("slots_equal")
        )
        .select(
            "id_a",
            "id_b",
            "slots_equal",
            F.round(F.col("slots_equal") / F.lit(float(k_slots)), 6).alias(
                "est_jaccard"
            ),
        )
    )
