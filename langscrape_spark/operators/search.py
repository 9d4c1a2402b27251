"""Full-text search over the corpus: inverted index + BM25 ranking.

A crawl corpus is only useful if you can query it; this gives the
engine the classic IR pair — a term-postings inverted index and
Okapi BM25 top-k retrieval — expressed relationally so Catalyst owns
the physical plan.

Scale shape (100 TB):

* ``build_inverted_index`` is one explode + two equi-key hash aggs:
  per-(term, doc) term frequencies (map-side combined — a doc's
  repeated term collapses in its own partition), then per-term
  document frequencies. Postings stay EXPLODED rows ``(term, doc_id,
  tf)`` — never ``collect_list`` per term, because a stopword's
  postings list is corpus-sized and a single non-spillable agg buffer
  holding it is the collect_list OOM class this repo already evicted
  from the dedup paths.
* ``bm25_topk`` touches only the query's own postings: the terms
  table is a handful of rows, broadcast; the postings scan
  predicate-pushes ``term IN (...)``; scoring is one docs-sized
  groupBy and a ``TakeOrderedAndProject`` top-k. The corpus is never
  rescanned at query time.

BM25 (k1, b defaults per Robertson/Sparck Jones convention):
``idf(t) = ln(1 + (N - df + 0.5)/(df + 0.5))``,
``score(d) = sum_t idf(t) * tf / (tf + k1*(1 - b + b*len_d/avg_len))``.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F

from .text import words_col


def build_inverted_index(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Returns ``(postings, doc_lens)``: postings = ``(term, doc_id,
    tf)`` exploded rows; doc_lens = ``(doc_id, dl)`` whitespace-token
    lengths. Both are plain DataFrames a caller can write as bucketed
    tables (bucket by term / doc_id) for shuffle-free query joins."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(words_col(F.col(text_col))).alias("term"),
    )
    postings = toks.groupBy("term", "doc_id").agg(
        F.count(F.lit(1)).alias("tf")
    )
    doc_lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    return postings, doc_lens


def _bm25_prepare(postings: DataFrame, doc_lens: DataFrame, query: str):
    """Shared BM25 front half — THE single definition of query
    tokenization, the (N, avgdl) scalar agg, the broadcast query-term
    join and the per-term Robertson idf table, so every BM25 variant
    (top-k, Max-Score threshold) scores bit-identically by
    construction. Returns ``None`` for an empty query/corpus, else
    ``(hits, idf_tbl, avgdl)``."""
    terms = sorted({t for t in query.lower().split() if t})
    if not terms:
        return None
    row = doc_lens.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    ).collect()[0]
    n_docs, avgdl = int(row["n"] or 0), float(row["avgdl"] or 0.0)
    if n_docs == 0:
        return None
    spark = postings.sparkSession
    tdf = spark.createDataFrame([(t,) for t in terms], "term string")
    hits = postings.join(F.broadcast(tdf), "term")
    idf = F.log(
        F.lit(1.0)
        + (F.lit(float(n_docs)) - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
    )
    idf_tbl = (
        hits.groupBy("term")
        .agg(F.countDistinct("doc_id").alias("df"))
        .select("term", idf.alias("idf"))
    )
    return hits, idf_tbl, avgdl


def _bm25_exact_scores(
    hits: DataFrame,
    idf_tbl: DataFrame,
    doc_lens: DataFrame,
    avgdl: float,
    k1: float,
    b: float,
) -> DataFrame:
    """Shared BM25 back half — the exact per-doc score
    ``sum_t idf_t * tf/(tf + k1*((1-b) + b*dl/avgdl))``."""
    return (
        hits.join(F.broadcast(idf_tbl), "term")
        .join(doc_lens, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                / (
                    F.col("tf")
                    + F.lit(k1)
                    * (
                        F.lit(1.0 - b)
                        + F.lit(b) * F.col("dl") / F.lit(avgdl)
                    )
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("score"))
    )


def bm25_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    query: str,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """BM25 top-k document ids for a free-text query.

    Corpus constants (N, avg doc length) are two scalar aggs over the
    doc_lens frame (docs-sized, cheap); per-term df comes from an agg
    over ONLY the query terms' postings. Duplicate query terms count
    once (standard bag-of-words query with binary query weights).
    Deterministic tie-break on doc_id.
    """
    prep = _bm25_prepare(postings, doc_lens, query)
    if prep is None:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    hits, idf_tbl, avgdl = prep
    scored = _bm25_exact_scores(hits, idf_tbl, doc_lens, avgdl, k1, b)
    return scored.orderBy(F.desc("score"), F.asc("doc_id")).limit(k)


def doc_norms(postings: DataFrame, n_docs: int) -> DataFrame:
    """Per-document TF-IDF L2 norms ``(doc_id, norm)`` for cosine
    scoring: ``w(t,d) = tf * ln(N/df)`` (idf floored at 0 via N>=df).
    One postings-sized pass: a broadcast join of the df table (terms-
    sized after its own agg) then a per-doc reduce."""
    dfs = postings.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    )
    w = F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    return (
        postings.join(dfs, "term")
        .select("doc_id", (w * w).alias("w2"))
        .groupBy("doc_id")
        .agg(F.sqrt(F.sum("w2")).alias("norm"))
    )


def more_like_this(
    postings: DataFrame,
    doc_lens: DataFrame,
    query_doc_id: int,
    k: int = 10,
) -> DataFrame:
    """Doc-to-doc retrieval: top-k documents by TF-IDF cosine
    similarity to ``query_doc_id`` (itself excluded).

    Scale shape: the query doc's own postings are a bounded handful of
    rows — collected and re-broadcast (same move as BM25's query
    terms), so candidate generation touches ONLY postings of terms the
    query doc contains (predicate-pushed semi-join), never the full
    matrix. df counts come from an agg over those candidate postings'
    terms joined against the full postings (terms-sized). Norms are
    corpus-wide but postings-sized to build and cacheable across
    queries. The dot-product accumulate is one docs-sized groupBy;
    the cut is ``TakeOrderedAndProject``.

    Cosine = dot(q, d) / (|q| |d|) with ``w(t,·) = tf * ln(N/df)``.
    Documents sharing no term with the query never appear (their
    cosine is exactly 0).
    """
    spark = postings.sparkSession
    n_docs = doc_lens.count()
    if n_docs == 0:
        return spark.createDataFrame([], "doc_id long, cosine double")
    q_terms = postings.where(
        F.col("doc_id") == F.lit(query_doc_id)
    ).select("term", F.col("tf").alias("q_tf"))
    rows = q_terms.collect()  # bounded: one document's distinct terms
    if not rows:
        return spark.createDataFrame([], "doc_id long, cosine double")
    q_tbl = spark.createDataFrame(rows, "term string, q_tf long")

    hits = postings.join(F.broadcast(q_tbl), "term")
    dfs = postings.join(
        F.broadcast(q_tbl.select("term")), "term", "left_semi"
    ).groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    idf = F.log(F.lit(float(n_docs)) / F.col("df"))
    dots = (
        hits.join(F.broadcast(dfs), "term")
        .select(
            "doc_id",
            (F.col("q_tf") * idf * F.col("tf") * idf).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("dot"))
    )
    # the query doc's norm stays IN-PLAN (a 1-row broadcast cross
    # join) rather than being collected — collecting it would run the
    # whole corpus-wide norms job once just to read one scalar and
    # then recompute it inside the returned plan. A zero/absent query
    # norm makes the broadcast side empty, which empties the result
    # with the right schema.
    norms = doc_norms(postings, n_docs)
    qn_tbl = norms.where(
        (F.col("doc_id") == F.lit(query_doc_id)) & (F.col("norm") > 0)
    ).select(F.col("norm").alias("_qn"))
    return (
        dots.where(F.col("doc_id") != F.lit(query_doc_id))
        .join(norms, "doc_id")
        .crossJoin(F.broadcast(qn_tbl))
        .select(
            "doc_id",
            F.try_divide(
                F.col("dot"), F.col("norm") * F.col("_qn")
            ).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("doc_id"))
        .limit(k)
    )


def query_likelihood_topk(
    postings: DataFrame,
    doc_lens: DataFrame,
    query: str,
    k: int = 10,
    mu: float = 100.0,
) -> DataFrame:
    """Dirichlet-smoothed query-likelihood top-k (Zhai/Lafferty LM
    retrieval): ``score(d) = Σ_t qtf·ln((tf + μ·p(t|C)) / (dl + μ))``
    with ``p(t|C) = cf_t / |C|``. Query terms absent from the corpus
    are dropped (their smoothed probability is 0 for every document,
    a constant −∞ that carries no ranking information).

    Scale shape: the standard postings-only decomposition —
    ``score = Σ_t qtf·ln(μ·p_c) + Σ_{t∈q∩d} qtf·ln(1 + tf/(μ·p_c))
    − |q|·ln(dl + μ)`` — so the corpus-sized work is ONE broadcast
    semi-join of the query terms against postings (predicate-pushed)
    plus a docs-sized join on doc_lens; documents never need a row
    per *absent* query term, which is what makes the naive
    cross-join form unrunnable at 100 TB. The query constant rides
    in-plan as a 1-row broadcast crossJoin; |C| is one scalar agg.
    """
    spark = postings.sparkSession
    counts: dict[str, int] = {}
    for t in query.lower().split():
        if t:
            counts[t] = counts.get(t, 0) + 1
    if not counts:
        return spark.createDataFrame([], "doc_id long, score double")
    q_tbl = spark.createDataFrame(
        sorted(counts.items()), "term string, qtf long"
    )
    # |C| = Σ dl over the docs-sized doc_lens frame — identical
    # integer to Σ tf over postings, without re-deriving the corpus
    # tokenization (bm25_topk draws its constants the same way)
    c_tot = doc_lens.agg(F.sum("dl")).collect()[0][0]
    if not c_tot:
        return spark.createDataFrame([], "doc_id long, score double")

    hits = postings.join(F.broadcast(q_tbl), "term")
    # collection frequency per query term, from the already-filtered
    # postings (cf sums the term's FULL postings — hits has them all).
    # Bounded collect: ≤ |query terms| rows — same move as
    # more_like_this's query-postings collect.
    cf_rows = (
        hits.groupBy("term", "qtf").agg(F.sum("tf").alias("cf")).collect()
    )
    if not cf_rows:
        # no query term occurs in the corpus: the smoothed likelihood
        # is undefined (0 for every doc) — no ranking information
        return spark.createDataFrame([], "doc_id long, score double")
    pc_tbl = spark.createDataFrame(
        [(r["term"], r["qtf"], r["cf"] / float(c_tot)) for r in cf_rows],
        "term string, qtf long, p_c double",
    )
    q_const = sum(
        r["qtf"] * math.log(mu * (r["cf"] / float(c_tot)))
        for r in sorted(cf_rows, key=lambda r: r["term"])
    )
    q_len = sum(r["qtf"] for r in cf_rows)
    matched = (
        hits.join(F.broadcast(pc_tbl), ["term", "qtf"])
        .select(
            "doc_id",
            (
                F.col("qtf")
                * F.log(
                    F.lit(1.0)
                    + F.col("tf") / (F.lit(mu) * F.col("p_c"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(F.sum("part").alias("match_score"))
    )
    return (
        doc_lens.join(matched, "doc_id", "left")
        .select(
            "doc_id",
            (
                F.lit(q_const)
                + F.coalesce(F.col("match_score"), F.lit(0.0))
                - F.lit(float(q_len)) * F.log(F.col("dl") + F.lit(mu))
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(k)
    )


def positional_postings(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Positional inverted index ``(term, doc_id, pos)`` — the
    structure phrase/proximity queries need (tf-only postings cannot
    distinguish 'new york' from 'york new'). One posexplode; writable
    bucketed by term for shuffle-free phrase joins."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "term"),
    ).select("term", "doc_id", "pos")


def phrase_match(
    positional: DataFrame,
    phrase_terms: list,
) -> DataFrame:
    """Exact-phrase occurrences via start-position alignment: term i's
    postings shifted to ``start = pos − i`` and chain-joined on
    ``(doc_id, start)`` — every join side is pre-filtered to ONE
    term's postings (predicate pushed to the index scan), so the work
    is proportional to the rarest term's postings, never the corpus.
    Returns ``(doc_id, n_occurrences, first_pos)``.
    """
    spark = positional.sparkSession
    if not phrase_terms:
        return spark.createDataFrame(
            [], "doc_id long, n_occurrences long, first_pos long"
        )
    aligned = None
    for i, t in enumerate(phrase_terms):
        leg = positional.where(F.col("term") == F.lit(t)).select(
            "doc_id", (F.col("pos") - F.lit(i)).alias("start")
        )
        aligned = leg if aligned is None else aligned.join(
            leg, ["doc_id", "start"]
        )
    return (
        aligned.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_occurrences"),
            F.min("start").alias("first_pos"),
        )
    )


def top_trigram(docs: DataFrame, text_col: str = "text") -> list:
    """The corpus's most frequent token trigram (count desc, then
    lexicographic) as a 3-element list — a deterministic, data-derived
    phrase for the phrase-search surface. Per-doc windows only (no
    global sort until the final bounded top-1)."""
    toks = docs.select(
        F.col("doc_id"),
        F.posexplode(words_col(F.col(text_col))).alias("pos", "w"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy("pos")
    tri = (
        toks.select(
            F.col("w").alias("w1"),
            F.lead("w", 1).over(w).alias("w2"),
            F.lead("w", 2).over(w).alias("w3"),
        )
        .where(F.col("w3").isNotNull())
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.desc("c"), "w1", "w2", "w3")
        .limit(1)
        .collect()
    )
    if not tri:
        return []
    r = tri[0]
    return [r["w1"], r["w2"], r["w3"]]


def rrf_fuse(
    rankings: list,
    k: int = 10,
    rrf_k: int = 60,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher 2009 — the
    standard hybrid-search combiner, e.g. BM25 + dense/LM retrieval):
    ``score(d) = Σ_r 1/(rrf_k + rank_r(d))`` over the input rankings;
    documents missing from a ranking contribute nothing for it. Rank
    is 1-based position by that ranking's own (score desc, doc_id)
    order — RRF deliberately ignores score SCALES, which is why it
    fuses heterogeneous rankers without calibration.

    ``rankings`` is a list of DataFrames shaped ``(doc_id, score)``
    (each typically already a bounded top-N). Scale shape: each input
    gets a window rank over its own bounded frame; the fuse is a
    UNION + groupBy over candidate rows (Σ input sizes, tiny). The
    1/(k+rank) terms are exact rationals summed in doc-grouped
    2-to-n-element groups — cross-engine stable at round-6.

    Returns ``(doc_id, rrf_score, n_rankers)`` top-k cut on the
    unrounded score, ties by doc_id.
    """
    from pyspark.sql import Window

    if not rankings:
        spark = SparkSession.getActiveSession()
        return spark.createDataFrame(
            [], "doc_id long, rrf_score double, n_rankers long"
        )
    scored = None
    for df in rankings:
        # rank on the ROUND-6 score (ties by id): the two rankers are
        # computed by algebraically different-but-equal forms in the
        # two engines, so sub-round-6 float noise could flip an
        # unrounded rank in one engine only; rounding first turns that
        # noise into ties that both engines break identically
        w = Window.orderBy(F.desc(F.round("score", 6)), F.asc("doc_id"))
        part = df.select(
            "doc_id",
            (
                F.lit(1.0)
                / (F.lit(float(rrf_k)) + F.row_number().over(w))
            ).alias("part"),
        )
        scored = part if scored is None else scored.unionByName(part)
    fused = scored.groupBy("doc_id").agg(
        F.sum("part").alias("_score"),
        F.count(F.lit(1)).cast("long").alias("n_rankers"),
    )
    return (
        fused.orderBy(F.desc("_score"), F.asc("doc_id"))
        .limit(k)
        .select(
            "doc_id",
            F.round("_score", 6).alias("rrf_score"),
            "n_rankers",
        )
    )


def _maxscore_candidates(
    hits: DataFrame, idf_tbl: DataFrame, theta: float
) -> DataFrame:
    """Max-Score tier 1: docs whose df-only sum-of-idf bound can reach
    ``theta`` — one narrow agg over bare posting rows, no doc_lens
    join, no divisions. Split out so tests can observe the pruned
    cardinality directly (the final ``score >= theta`` filter would
    otherwise mask a no-op bound)."""
    return (
        hits.join(F.broadcast(idf_tbl), "term")
        .groupBy("doc_id")
        .agg(F.sum("idf").alias("bound"))
        .where(F.col("bound") >= F.lit(theta))
        .select("doc_id")
    )


def bm25_maxscore(
    postings: DataFrame,
    doc_lens: DataFrame,
    query: str,
    theta: float,
    k1: float = 1.2,
    b: float = 0.75,
) -> DataFrame:
    """Threshold retrieval with Max-Score pruning (Turtle & Flood,
    1995): return every document scoring ``>= theta``, but touch the
    expensive scoring machinery only for documents that CAN reach it.

    The bound: each BM25 term part is ``idf_t * tf/(tf + k1*norm) <
    idf_t``, so ``sum(idf_t over a doc's matched terms)`` upper-bounds
    its score using df statistics alone. Tier 1 aggregates that bound
    over bare posting rows — no doc_lens join, no divisions — and
    keeps docs with ``bound >= theta``; tier 2 computes exact BM25
    only for the survivors (semi-join). No qualifying doc can be
    pruned (the bound dominates the score), which is exactly what the
    full-scan oracle proves.

    At index scale the win compounds: the tier-1 frame is narrow
    (term, doc_id), per-term idf is docs-independent and broadcast,
    and high-theta queries drop most of the corpus before the
    dl-normalized scoring join runs.

    Output: ``(doc_id, score)`` for ``score >= theta``, exact BM25.
    Tokenization, idf and the exact score share ``_bm25_prepare`` /
    ``_bm25_exact_scores`` with :func:`bm25_topk`, so the tier-2 score
    is bit-identical to the full scan's by construction.
    """
    prep = _bm25_prepare(postings, doc_lens, query)
    if prep is None:
        return postings.sparkSession.createDataFrame(
            [], "doc_id long, score double"
        )
    hits, idf_tbl, avgdl = prep
    cand = _maxscore_candidates(hits, idf_tbl, theta)
    # tier 2: exact BM25 for survivors only
    scored = _bm25_exact_scores(
        hits.join(cand, "doc_id", "left_semi"),
        idf_tbl,
        doc_lens,
        avgdl,
        k1,
        b,
    )
    return scored.where(F.col("score") >= F.lit(theta))


def index_compression_stats(
    postings: DataFrame,
    term_col: str = "term",
    doc_col: str = "doc_id",
) -> DataFrame:
    """Index-storage sizing: how many bytes would the inverted index
    cost delta+varint encoded (the Lucene/PISA layout) vs raw 8-byte
    ids — the planning number for a corpus-scale index build, broken
    down by posting-list DENSITY bucket (⌊log₂ df⌋), because that is
    what decides compression: dense lists have tiny gaps.

    All-integer: per term, postings sort by doc id (one term-
    partitioned lag window); gap = id − lag(id) (first entry stores
    id + 1 so every encoded value is ≥ 1); varint bytes =
    ⌈bits(gap)/7⌉ with bits = length(bin(gap)) — the engine-portable
    bit-length both engines share (q87's convention). Rollup per
    bucket: terms, postings, raw vs varint bytes and the ratio (the
    only division, round-6).

    Output: ``(df_bucket, n_terms, n_postings, raw_bytes,
    varint_bytes, ratio)``.
    """
    from pyspark.sql import Window

    p = postings.select(
        F.col(term_col).alias("t"), F.col(doc_col).cast("long").alias("d")
    ).distinct()
    w = Window.partitionBy("t").orderBy("d")
    g = p.withColumn(
        "gap",
        F.coalesce(F.col("d") - F.lag("d").over(w), F.col("d") + 1),
    )
    vb = F.expr("(length(bin(gap)) + 6) div 7")
    per_term = g.groupBy("t").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum(vb).cast("long").alias("vbytes"),
    )
    bucket = F.length(F.bin(F.col("df"))) - 1  # floor(log2 df)
    agg = per_term.groupBy(bucket.cast("int").alias("df_bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_terms"),
        F.sum("df").cast("long").alias("n_postings"),
        (F.sum("df") * 8).cast("long").alias("raw_bytes"),
        F.sum("vbytes").cast("long").alias("varint_bytes"),
    )
    return agg.select(
        "df_bucket",
        "n_terms",
        "n_postings",
        "raw_bytes",
        "varint_bytes",
        F.round(
            F.try_divide(
                F.col("varint_bytes").cast("double"),
                F.col("raw_bytes").cast("double"),
            ),
            6,
        ).alias("ratio"),
    )


def best_passage(
    docs: DataFrame,
    query: str,
    window: int = 12,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Best-passage (snippet) selection: for every document containing
    at least one query term, the ``window``-token span that covers the
    most DISTINCT query terms — ties broken by more total hits, then
    earliest start. The SERP-snippet / RAG-chunk-picker primitive that
    sits downstream of every ranker here (BM25/QL produce the doc
    list; this produces what to SHOW or feed the generator).

    Spark shape: one posexplode filtered to query terms — the hit
    list, |hits| ≪ |tokens| — then a per-doc self-join of hits to
    hits within ``[pos, pos+window)``. Both sides are query-term
    occurrence lists (bounded per doc by term frequency, NOT doc
    length), the join key is the doc id and the range predicate is a
    post-join filter inside the same hash join, so the cost is
    Σ_doc h_d², h_d = per-doc query-term hits — linear in corpus for
    real queries. Candidate starts are only hit positions (the
    optimal window can always shift its left edge onto a hit), which
    is what keeps the enumeration sparse. The snippet text is
    ``slice`` over the token array — no second tokenization pass.

    Returns ``(doc_id, start, n_terms, n_hits, snippet)``; ``start``
    is the 0-based token offset.
    """
    from pyspark.sql import Window

    terms = [t for t in query.lower().split() if t]
    if not terms:
        raise ValueError("empty query")
    tarr = F.array(*[F.lit(t) for t in sorted(set(terms))])
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        words_col(F.col(text_col)).alias("tok"),
    )
    hits = toks.select(
        "doc_id",
        F.posexplode("tok").alias("pos", "term"),
    ).where(F.array_contains(tarr, F.col("term")))
    left = hits.select("doc_id", F.col("pos").alias("start"))
    right = hits.select(
        F.col("doc_id").alias("d2"),
        F.col("pos").alias("p2"),
        F.col("term").alias("t2"),
    )
    cand = (
        left.join(
            right,
            (left.doc_id == right.d2)
            & (right.p2 >= left.start)
            & (right.p2 < left.start + F.lit(window)),
        )
        .groupBy("doc_id", "start")
        .agg(
            F.count_distinct("t2").alias("n_terms"),
            F.count(F.lit(1)).alias("n_hits"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("n_terms").desc(),
        F.col("n_hits").desc(),
        F.col("start").asc(),
    )
    best = (
        cand.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .drop("rk")
    )
    return best.join(toks, "doc_id").select(
        "doc_id",
        "start",
        "n_terms",
        "n_hits",
        F.array_join(
            F.slice(F.col("tok"), F.col("start") + 1, window), " "
        ).alias("snippet"),
    )
