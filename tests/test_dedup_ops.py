"""Dedup-operator guarantees added in round 2: SimHash recall at the
requested radius, hot-bucket guards in the Jaccard/MinHash candidate
indexes, and LSH near-dup robustness (empty input, derived plane
count, bounded-bucket refinement)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from langscrape_spark.operators.ann import (
    embedding_neardup_pairs,
    embedding_neardup_pairs_lsh,
)
from langscrape_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash64_fast,
    simhash_near_dups,
)

DOCS = "/root/testdata/sf0.001/documents.parquet"


# ---------------------------------------------------------------------------
# SimHash recall (VERDICT round 1 "what's wrong" #2)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("max_hamming", [3, 8, 12])
def test_simhash_neardups_equals_bruteforce(spark, max_hamming):
    """Pigeonhole blocking with max_hamming+1 blocks must reproduce the
    brute-force all-pairs hamming scan EXACTLY at the requested radius
    (the old fixed 4x16-bit blocking silently missed distance 4-8 pairs
    at the default radius of 8)."""
    docs = spark.read.parquet(DOCS).limit(300)
    sigs = {
        r["doc_id"]: r["sh"]
        for r in docs.select(
            "doc_id", simhash64_fast(F.col("text")).alias("sh")
        ).collect()
    }
    ids = sorted(sigs)
    arr = np.array([sigs[i] for i in ids], dtype=np.int64).view(np.uint64)
    xor = arr[:, None] ^ arr[None, :]
    # vectorized popcount via byte view
    ham = np.unpackbits(xor.view(np.uint8).reshape(len(ids), len(ids), 8), axis=2).sum(
        axis=2
    )
    ids_arr = np.array(ids)
    li, ri = np.nonzero((ham <= max_hamming) & (ids_arr[:, None] < ids_arr[None, :]))
    want = {(int(ids_arr[a]), int(ids_arr[b])) for a, b in zip(li, ri)}

    got = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(
            docs, "text", "doc_id", max_hamming=max_hamming
        ).collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# n-gram Jaccard hot-shingle cap
# ---------------------------------------------------------------------------

def test_ngram_cap_df_capped_jaccard(spark):
    """With the stop-phrase shingles (df > cap) removed from the
    vocabulary, surviving pairs report Jaccard over the CAPPED sets
    (the standard df-capped similarity), and pairs whose entire
    overlap was stop-phrases are not surfaced at all."""
    stop = "click here to subscribe now"
    rows = [
        (1, f"{stop} alpha beta gamma delta epsilon"),
        (2, f"{stop} alpha beta gamma delta zeta"),
        (3, f"{stop} totally different words here today"),
        (4, f"{stop} more unrelated content entirely again"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", k=3, threshold=0.2, max_doc_freq=None
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in ngram_jaccard_pairs(
            df, "text", "doc_id", k=3, threshold=0.2, max_doc_freq=3,
            detect_fraction=1.0,
        ).collect()
    }
    # hand-derived: the 3 intra-stop-phrase shingles are hot (df=4);
    # docs 1/2 share 4 of their remaining 5 shingles
    assert uncapped[(1, 2)] == round(7 / 9, 6)
    assert capped[(1, 2)] == round(4 / 6, 6)
    # docs 3/4 overlap ONLY in stop-phrase shingles: surfaced uncapped
    # (jaccard 3/13 ≥ 0.2), suppressed by the cap
    assert (3, 4) in uncapped
    assert (3, 4) not in capped


def test_ngram_cap_off_matches_default_on_corpus(spark):
    """The default cap (10k) is never hit at test scale, so results
    must be identical with the cap disabled — the oracle-q09 guarantee."""
    docs = spark.read.parquet(DOCS).limit(200)
    a = {
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.12
        ).collect()
    }
    b = {
        tuple(r)
        for r in ngram_jaccard_pairs(
            docs, "text", "doc_id", k=3, threshold=0.12, max_doc_freq=None
        ).collect()
    }
    assert a == b


# ---------------------------------------------------------------------------
# MinHash bucket cap
# ---------------------------------------------------------------------------

def test_minhash_bucket_cap_drops_exact_dup_blowup(spark):
    """A cluster of identical docs collapses into one band bucket; the
    cap excludes it from pair generation (exact_dedup's job) while
    distinct near-dup pairs are unaffected."""
    clone = "the same exact duplicated text repeated in every clone row"
    rows = [(i, clone) for i in range(20)] + [
        (100, "unique text one about spark engines and crawling the web"),
        (101, "unique text one about spark engines and crawling the net"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id", max_bucket=10).collect()
    }
    assert all(a >= 100 for a, _ in capped)  # clone cluster excluded
    assert (100, 101) in capped  # near-dup pair survives
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id", max_bucket=None).collect()
    }
    assert (0, 1) in uncapped and (100, 101) in uncapped


# ---------------------------------------------------------------------------
# embedding LSH near-dup: empty input, derived planes, refinement
# ---------------------------------------------------------------------------

def test_lsh_neardup_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    out = embedding_neardup_pairs_lsh(df, 0.9)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == ["id_a", "id_b", "cosine"]


def test_lsh_neardup_derived_planes_subset_of_exact(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(emb, 0.40).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs_lsh(emb, 0.40).collect()
    }
    assert lsh <= exact
    assert lsh


def test_lsh_neardup_hot_bucket_refinement(spark):
    """Force the refinement path (tiny max_bucket_rows) and check the
    output is still a correct subset of the exact pairs with exact
    cosines, i.e. refinement changes recall only, never precision."""
    rng = np.random.default_rng(7)
    base = rng.normal(size=16)
    rows = []
    for i in range(120):
        v = base + rng.normal(scale=0.05, size=16)  # one tight cluster
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    exact = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs(df, 0.99).collect()
    }
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in embedding_neardup_pairs_lsh(
            df, 0.99, n_planes=2, max_bucket_rows=16
        ).collect()
    }
    assert got  # refined buckets still surface in-bucket pairs
    for pair, cos in got.items():
        assert exact[pair] == cos


def test_minhash_agg_signatures_equal_column_form(spark):
    """The double-hash minhash must agree across THREE independent
    builds: the numpy kernel (minhash_signature_fast), the Spark
    expression form (covered by test_minhash_fast_equals_expression),
    and this pure-Python driver-side reconstruction — tokenization,
    shingling, little-endian md5 halves and the (a + h·b) mod 2^64
    minima all recomputed from first principles."""
    import hashlib
    import re

    from langscrape_spark.operators.dedup import minhash_signature_fast

    docs = spark.read.parquet(DOCS).limit(100)

    def py_sig(text: str) -> list:
        toks = [w for w in re.split(r"\s+", text.lower()) if w]
        sh = sorted({" ".join(toks[i : i + 3]) for i in range(len(toks) - 2)})
        if not sh:
            return [None] * 16
        ab = []
        for s in sh:
            d = hashlib.md5(s.encode()).digest()
            ab.append(
                (int.from_bytes(d[8:], "little"), int.from_bytes(d[:8], "little"))
            )
        return [
            str(min((a + h * b) % (1 << 64) for a, b in ab)) for h in range(16)
        ]

    want = {r["doc_id"]: py_sig(r["text"]) for r in docs.collect()}
    got = {
        r["doc_id"]: list(r["sig"])
        for r in docs.select(
            "doc_id", minhash_signature_fast(F.col("text"), 16, 3).alias("sig")
        ).collect()
    }
    assert got == want


def test_minhash_short_docs_generate_no_pairs(spark):
    """Sub-k-token documents have no shingles, hence no signature and
    no band buckets — they must NOT pair with each other (the old
    all-NULL signatures hashed into constant buckets, colliding every
    short doc with every other)."""
    rows = [(1, "a"), (2, "b c"), (3, ""), (4, "x y z w same text here"),
            (5, "x y z w same text here")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(df, "text", "doc_id").collect()
    }
    assert pairs == {(4, 5)}


def test_lsh_neardup_null_embedding_is_not_fatal(spark):
    """One NULL/empty embedding must neither crash the operator nor
    (worse) silently empty the result via the dimension probe — the
    valid rows' pairs are unaffected (review finding r2)."""
    rows = [(0, None), (1, []), (2, [1.0, 0.0]), (3, [1.0, 0.001]),
            (4, [0.0, 1.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs_lsh(df, 0.99, n_planes=2).collect()
    }
    assert got == {(2, 3)}


def test_lsh_neardup_identical_cluster_guard(spark):
    """Sign-identical vectors can't be split by refinement: clusters
    beyond 8x max_bucket_rows are excluded from pair generation
    (exact_dedup's job) instead of exploding one python worker;
    distinct near-dups elsewhere still pair."""
    rows = [(i, [1.0, 2.0, 3.0, 4.0]) for i in range(200)]  # identical
    rows += [(500, [-1.0, -2.0, -3.0, -4.1]), (501, [-1.0, -2.0, -3.0, -4.0])]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs_lsh(
            df, 0.999, n_planes=2, max_bucket_rows=16
        ).collect()
    }
    assert (500, 501) in got
    assert all(a >= 500 for a, _ in got)  # identical cluster excluded


def test_simhash_bucket_cap_drops_exact_dup_blowup(spark):
    """VERDICT r2 #1: a cluster of identical docs has identical
    signatures, so every block bucket it touches collapses; the cap
    excludes those buckets from pair generation (exact_dedup's job)
    while pairs among distinct near-dup docs survive."""
    clone = "the same exact duplicated text repeated in every clone row"
    rows = [(i, clone) for i in range(20)] + [
        # md5-half simhash hamming distance between these two is 5
        # (verified offline; the xxhash64-era pair drifted to 13 when
        # the hash basis changed for the q16 DuckDB oracle)
        (100, "unique text one about spark engines and crawling the web"),
        (101, "unique text one about spark engines and crawling the dom"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(
            df, "text", "doc_id", max_hamming=8, max_bucket=10
        ).collect()
    }
    assert all(a >= 100 for a, _ in capped)  # clone cluster excluded
    assert (100, 101) in capped  # near-dup pair survives
    uncapped = {
        (r["id_a"], r["id_b"])
        for r in simhash_near_dups(
            df, "text", "doc_id", max_hamming=8, max_bucket=None
        ).collect()
    }
    assert (0, 1) in uncapped and (100, 101) in uncapped


def test_gemm_block_rows_bounds_slab():
    """The per-bucket gemm block must keep the sims slab ≤128 MB for
    every group width up to far beyond the 8·max_bucket_rows guard
    (VERDICT r2 #6), without degenerating below a useful batch."""
    from langscrape_spark.operators.ann import gemm_block_rows

    for n_cols in (1, 100, 1024, 16_384, 131_072, 1_000_000, 10_000_000):
        block = gemm_block_rows(n_cols)
        assert 16 <= block <= 1024
        # the slab bound only applies once a single 16-row block fits
        if n_cols * 16 * 8 <= (128 << 20):
            assert block * n_cols * 8 <= (128 << 20), n_cols
    # small groups keep the full 1024-row block (no needless tiny calls)
    assert gemm_block_rows(1000) == 1024


def test_chunked_neardup_many_chunks_bounded_plan(spark):
    """VERDICT r2 #9: ~100 right-side chunks must still plan and run
    (the union is folded with localCheckpoint every 32 chunks — an
    unfolded 100-branch unionByName is an unplannable DAG at 10^3
    chunks) and the output must equal the exact pair set."""
    from langscrape_spark.operators.ann import (
        embedding_neardup_pairs,
        embedding_neardup_pairs_chunked,
    )

    import numpy as np

    rng = np.random.RandomState(7)
    base = rng.randn(25, 4)
    rows = []
    for i in range(500):
        v = base[i % 25] + 0.001 * rng.randn(4)  # planted near-dups
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    chunked = embedding_neardup_pairs_chunked(
        df, 0.999, chunk_rows=5  # 100 chunks
    )
    got = {(r["id_a"], r["id_b"]) for r in chunked.collect()}
    want = {
        (r["id_a"], r["id_b"])
        for r in embedding_neardup_pairs(df, 0.999).collect()
    }
    assert got == want and len(want) > 0


def test_pair_emitters_generic_ids_and_no_self_pairs(spark):
    """Review r3: the grouped emitters must (a) keep the id column's
    input type (string ids are natural for a url-keyed corpus), and
    (b) never emit self-pairs when the same id appears twice (the old
    a.id < b.id join excluded them)."""
    rows = [
        ("url-a", "spark engines crawl the web with ease and speed today"),
        ("url-b", "spark engines crawl the web with ease and speed now"),
        ("url-b", "spark engines crawl the web with ease and speed now"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    mh = minhash_lsh_pairs(df, "text", "doc_id")
    got = [(r["id_a"], r["id_b"]) for r in mh.collect()]
    assert all(a != b for a, b in got)
    assert ("url-a", "url-b") in got
    assert dict(mh.dtypes)["id_a"] == "string"
    sh = simhash_near_dups(df, "text", "doc_id", max_hamming=8)
    got2 = [(r["id_a"], r["id_b"]) for r in sh.collect()]
    assert all(a != b for a, b in got2)
    assert ("url-a", "url-b") in got2


def test_pair_emitters_equal_python_reconstruction(spark):
    """The grouped emit must equal a full pure-Python reconstruction
    of the LSH contract (signatures → band buckets → per-bucket pairs
    → shared-band counts) on a corpus with real partial-band overlaps
    (texts differing only in one token share SOME bands)."""
    import hashlib
    import itertools
    import re

    rows = [(i, f"common shingle text base document alpha beta {i % 7}")
            for i in range(120)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["n_shared_bands"])
        for r in minhash_lsh_pairs(df, "text", "doc_id").collect()
    }

    def py_sig(text):
        toks = [w for w in re.split(r"\s+", text.lower()) if w]
        sh = sorted({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)})
        ab = []
        for s in sh:
            d = hashlib.md5(s.encode()).digest()
            ab.append((int.from_bytes(d[8:], "little"),
                       int.from_bytes(d[:8], "little")))
        return [str(min((a + h * b) % (1 << 64) for a, b in ab))
                for h in range(16)]

    buckets = {}
    for i, t in rows:
        sig = py_sig(t)
        for b in range(4):
            key = hashlib.md5(
                "|".join([str(b)] + sig[b * 4:b * 4 + 4]).encode()
            ).hexdigest()
            buckets.setdefault(key, []).append(i)
    shared = {}
    for ids in buckets.values():
        for a, b2 in itertools.combinations(sorted(ids), 2):
            shared[(a, b2)] = shared.get((a, b2), 0) + 1
    want = {(a, b2, n) for (a, b2), n in shared.items()}
    assert got == want and len(want) > 500


def test_pair_emitter_multiblock_bucket(spark):
    """A single band bucket of 1,600 identical docs forces the
    blockwise emitter through multiple yielded blocks (block size =
    2M mask elements / 1600 ids ≈ 1310 rows < 1599) — the union of
    blocks must be exactly C(1600,2) pairs, every one at 4 shared
    bands, with no self-pairs and no duplicates."""
    clone = "the very same duplicated text in every single clone row here"
    df = spark.createDataFrame(
        [(i, clone) for i in range(1600)], "doc_id long, text string"
    )
    out = minhash_lsh_pairs(df, "text", "doc_id")
    from pyspark.sql import functions as SF

    agg = out.agg(
        SF.count("*").alias("n"),
        SF.min("n_shared_bands").alias("lo"),
        SF.max("n_shared_bands").alias("hi"),
        SF.sum(SF.when(SF.col("id_a") >= SF.col("id_b"), 1).otherwise(0)).alias("bad"),
    ).first()
    assert agg["n"] == 1600 * 1599 // 2
    assert agg["lo"] == 4 and agg["hi"] == 4 and agg["bad"] == 0


def test_lsh_topk_survives_null_embedding(spark):
    """Review r3: one NULL/empty embedding row must not kill lsh_topk
    (the gemm bucketer would raise on a ragged Arrow batch) — poison
    rows simply can't be top-k."""
    from langscrape_spark.operators.ann import lsh_topk

    emb = spark.read.parquet(
        "/root/testdata/sf0.001/embeddings.parquet"
    ).select("vec_id", "embedding")
    poison = spark.createDataFrame(
        [(99991, None), (99992, [])],
        "vec_id long, embedding array<double>",
    )
    df = emb.unionByName(poison)
    q = [float(x) for x in emb.first()["embedding"]]
    out = lsh_topk(df, q, k=5)
    rows = out.collect()
    assert len(rows) == 5
    assert all(r["vec_id"] < 99991 for r in rows)


# ---------------------------------------------------------------------------
# exact-substring dedup (Lee et al. 2022 ExactSubstr, round 3)
# ---------------------------------------------------------------------------

def _wtext(prefix, n):
    return " ".join(f"{prefix}{i}" for i in range(n))


class TestExactSubstringDedup:
    K = 20
    PASSAGE = _wtext("p", 25)   # 25-token cross-doc passage
    PASSAGE2 = _wtext("q", 22)  # second passage, also repeated in-doc

    def _run(self, spark, rows, k=K):
        from langscrape_spark.operators.dedup import exact_substring_dedup

        df = spark.createDataFrame(rows, ["doc_id", "text"])
        return {
            r["doc_id"]: r
            for r in exact_substring_dedup(df, k=k).collect()
        }

    def test_cross_doc_passage_removed_exactly_once(self, spark):
        """First (min id, pos) occurrence survives; every other doc
        loses exactly the passage — as ONE merged span, even though 6
        overlapping windows flagged it (the boundary windows that mix
        passage + per-doc context hash uniquely and are NOT flagged)."""
        rows = [
            (1, f"alpha beta {self.PASSAGE} gamma {_wtext('a', 30)}"),
            (2, f"start2 {self.PASSAGE} {_wtext('b', 30)}"),
            (3, f"{_wtext('c', 30)} {self.PASSAGE}"),
        ]
        out = self._run(spark, rows)
        assert out[1]["n_tokens_removed"] == 0
        assert self.PASSAGE in out[1]["text_dedup"]
        for d in (2, 3):
            assert out[d]["n_tokens_removed"] == 25
            assert out[d]["n_spans_removed"] == 1
            assert "p0" not in out[d]["text_dedup"]
        # survivors keep their own context tokens intact
        assert out[2]["text_dedup"].startswith("start2 b0 b1")
        assert out[3]["text_dedup"].endswith("c28 c29")

    def test_within_doc_repeat_keeps_first(self, spark):
        rows = [(7, f"{self.PASSAGE2} mid {_wtext('z', 25)} {self.PASSAGE2}")]
        out = self._run(spark, rows)
        assert out[7]["n_tokens_removed"] == 22
        assert out[7]["n_spans_removed"] == 1
        assert out[7]["text_dedup"].startswith("q0 q1")
        assert out[7]["text_dedup"].endswith("z23 z24")

    def test_two_separate_spans(self, spark):
        rows = [
            (1, f"{self.PASSAGE} {_wtext('x', 25)} {self.PASSAGE2}"),
            (2, f"{_wtext('y', 5)} {self.PASSAGE} {_wtext('w', 25)} "
                f"{self.PASSAGE2} tail2"),
        ]
        out = self._run(spark, rows)
        assert out[2]["n_spans_removed"] == 2
        assert out[2]["n_tokens_removed"] == 25 + 22
        kept = out[2]["text_dedup"].split()
        assert kept == (
            _wtext("y", 5).split() + _wtext("w", 25).split() + ["tail2"]
        )

    def test_short_and_clean_docs_untouched(self, spark):
        rows = [
            (1, "tiny doc below the window size"),
            (2, _wtext("u", 40)),
            (3, ""),
        ]
        out = self._run(spark, rows)
        for d in (1, 2, 3):
            assert out[d]["n_tokens_removed"] == 0
            assert out[d]["n_spans_removed"] == 0
        assert out[2]["text_dedup"] == _wtext("u", 40)
        assert out[3]["text_dedup"] == ""

    def test_adjacent_windows_merge(self, spark):
        """A 60-token duplicated block = 41 flagged windows collapsing
        to one span of exactly 60 tokens."""
        block = _wtext("m", 60)
        rows = [
            (1, f"{block} {_wtext('a', 25)}"),
            (2, f"{_wtext('b', 25)} {block}"),
        ]
        out = self._run(spark, rows)
        assert out[1]["n_tokens_removed"] == 0
        assert out[2]["n_tokens_removed"] == 60
        assert out[2]["n_spans_removed"] == 1
        assert out[2]["text_dedup"] == _wtext("b", 25)


def test_containment_catches_wrapper_jaccard_misses(spark):
    """A short doc quoted whole inside a long one: containment 1.0,
    Jaccard small — the asymmetric case the operator exists for."""
    from langscrape_spark.operators.dedup import (
        ngram_containment_pairs,
        ngram_jaccard_pairs,
    )

    short = "alpha beta gamma delta epsilon"
    long_ = " ".join(f"w{i}" for i in range(60)) + " " + short
    df = spark.createDataFrame(
        [(1, short), (2, long_), (3, "totally different words here now")],
        ["doc_id", "text"],
    )
    cont = ngram_containment_pairs(df, "text", "doc_id", k=3, threshold=0.9)
    rows = cont.collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    assert r["containment"] == 1.0 and r["c_a_in_b"] == 1.0
    assert r["c_b_in_a"] < 0.1
    # Jaccard at the same bar finds nothing
    jac = ngram_jaccard_pairs(df, "text", "doc_id", k=3, threshold=0.9)
    assert jac.count() == 0


def test_containment_short_docs_never_pair(spark):
    from langscrape_spark.operators.dedup import ngram_containment_pairs

    df = spark.createDataFrame(
        [(1, "two words"), (2, "two words"), (3, "")], ["doc_id", "text"]
    )
    assert ngram_containment_pairs(df, "text", "doc_id", k=3).count() == 0


def test_containment_shares_df_cap_guard(spark):
    """The df-capped vocabulary applies to containment too: a boiler-
    plate shingle in every doc is evicted, so disjoint docs that share
    ONLY boilerplate never pair."""
    from langscrape_spark.operators.dedup import ngram_containment_pairs

    boiler = "copyright footer text"
    rows = [(i, f"unique{i} body{i} words{i} " + boiler) for i in range(20)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = ngram_containment_pairs(
        df, "text", "doc_id", k=3, threshold=0.5,
        max_doc_freq=5, detect_fraction=1.0,
    )
    assert out.count() == 0


# ---------------------------------------------------------------------------
# SemDeDup (round 3, q77)
# ---------------------------------------------------------------------------

def _unit(*xs):
    import math
    n = math.sqrt(sum(x * x for x in xs))
    return [x / n for x in xs]


def test_semdedup_greedy_keep_first_not_transitive(spark):
    """a~b and b~c but a!~c: greedy keep-first drops BOTH b and c
    (b due a; c due b even though b was dropped) — the paper's rule,
    deliberately different from connected-components survivor
    election. One cluster forced via k=1."""
    from langscrape_spark.operators.ann import semdedup
    import math

    # angles 0, 25deg, 50deg: cos(25)=.906, cos(50)=.643 -> t=0.8
    def ang(d):
        r = math.radians(d)
        return [math.cos(r), math.sin(r), 0.0]

    df = spark.createDataFrame(
        [(1, ang(0)), (2, ang(25)), (3, ang(50))],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semdedup(df, threshold=0.8, k=1, iterations=1).collect()}
    assert out[1]["keep"] is True and out[1]["max_sim_earlier"] is None
    assert out[2]["keep"] is False          # ~a
    assert out[3]["keep"] is False          # ~b (even though b dropped)
    assert abs(out[3]["max_sim_earlier"] - round(math.cos(math.radians(25)), 6)) < 1e-9


def test_semdedup_poison_and_zero_norm_rows_kept(spark):
    from langscrape_spark.operators.ann import semdedup

    df = spark.createDataFrame(
        [(1, _unit(1.0, 0.0)), (2, _unit(1.0, 0.01)),
         (3, None), (4, [0.0, 0.0]), (5, [1.0])],   # NULL, zero-norm, wrong dim
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r for r in
           semdedup(df, threshold=0.9, k=1, iterations=1).collect()}
    assert len(out) == 5
    assert out[2]["keep"] is False           # near-dup of 1
    for vid in (3, 4, 5):
        assert out[vid]["keep"] is True
        assert out[vid]["max_sim_earlier"] is None
    assert out[3]["cluster"] == -1 and out[5]["cluster"] == -1


def test_semdedup_oversized_cluster_raises(spark):
    from langscrape_spark.operators.ann import semdedup
    import pytest

    df = spark.createDataFrame(
        [(i, _unit(1.0, float(i) * 1e-6)) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    with pytest.raises(Exception, match="max_cluster_rows"):
        semdedup(df, threshold=0.99, k=1, iterations=1,
                 max_cluster_rows=8).collect()


def test_semdedup_auto_k_scales_with_corpus(spark):
    """k=None derives cluster count from corpus size (fixed k is a
    cross-join in disguise at scale)."""
    from langscrape_spark.operators.ann import semdedup

    df = spark.createDataFrame(
        [(i, _unit(float(i % 7 + 1), float(i % 11 + 1), float(i % 13 + 1)))
         for i in range(300)],
        "vec_id long, embedding array<double>",
    )
    out = semdedup(df, threshold=1.1, iterations=1,
                   target_cluster_rows=50).collect()
    assert len(out) == 300
    # threshold > 1 can never fire: everything kept
    assert all(r["keep"] for r in out)
    assert len({r["cluster"] for r in out}) >= 2


# ---------------------------------------------------------------------------
# Winnowing fingerprints (round 3: MOSS local-similarity fingerprint)
# ---------------------------------------------------------------------------

def _winnow_brute(text: str, k: int, w: int) -> set:
    """Reference winnowing in plain Python (Schleimer et al. 2003,
    leftmost-min tie-break), hashes via the same masked md5 lower half
    (little-endian bytes 8:16, sign bit cleared)."""
    import hashlib
    import struct

    t = text.lower()
    grams = [
        struct.unpack("<q", hashlib.md5(t[i:i + k].encode()).digest()[8:16])[0]
        & 0x7FFFFFFFFFFFFFFF
        for i in range(len(t) - k + 1)
    ]
    if not grams:
        return set()
    picks = set()
    for j in range(max(1, len(grams) - w + 1)):
        window = grams[j:j + w]
        mn = min(window)
        picks.add((j + window.index(mn) + 1, mn))  # 1-based pos
    return picks


def test_winnow_matches_bruteforce(spark):
    from langscrape_spark.operators.dedup import winnow_fingerprints

    rows = [
        (0, "the quick brown fox jumps over the lazy dog repeatedly"),
        (1, "aaaaaaaaaaaaaaaaaaaaaa"),          # all-equal grams: tie-break path
        (2, "short"),                            # < k chars: no grams
        (3, "exactlen8"),                        # 2 grams, fewer than w: one window
        (4, ""),                                 # empty
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["doc_id"], r["pos"], r["fp"])
        for r in winnow_fingerprints(df, k=8, w=6).collect()
    }
    want = {
        (i, p, h) for i, t in rows for (p, h) in _winnow_brute(t, 8, 6)
    }
    assert got == want


def test_winnow_shared_substring_guarantee(spark):
    """The winnowing contract: any shared substring of length
    >= w + k - 1 leaves at least one identical fingerprint in both
    documents."""
    from langscrape_spark.operators.dedup import winnow_fingerprints

    k, w = 8, 6
    shared = "zqxwvuty" * 4  # 32 chars >= w + k - 1 = 13, collision-proof
    df = spark.createDataFrame(
        [
            (0, "left padding text then " + shared + " and a tail here"),
            (1, "completely different prefix " + shared + " other suffix"),
        ],
        "doc_id long, text string",
    )
    fps = winnow_fingerprints(df, k=k, w=w)
    a = {r["fp"] for r in fps.where("doc_id = 0").collect()}
    b = {r["fp"] for r in fps.where("doc_id = 1").collect()}
    assert a & b, "shared 32-char substring must share a fingerprint"


def test_winnow_overlap_hot_fp_guard(spark):
    """A fingerprint shared corpus-wide (planted boilerplate) must be
    dropped from the posting list by the df cap instead of generating
    df^2 pairs."""
    from langscrape_spark.operators.dedup import winnow_overlap_pairs

    boiler = "universal boilerplate header that every page carries"
    rows = [(i, boiler + f" unique-{i}-" + "x" * (17 + i % 5)) for i in range(30)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = winnow_overlap_pairs(
        df, k=16, w=4, min_shared=1, max_doc_freq=1000
    )
    capped = winnow_overlap_pairs(df, k=16, w=4, min_shared=1, max_doc_freq=10)
    n_un, n_cap = uncapped.count(), capped.count()
    assert n_un > 0
    assert n_cap < n_un, "df cap must remove boilerplate-only pairs"


# ---------------------------------------------------------------------------
# Prefix-filtered exact Jaccard join (q99)
# ---------------------------------------------------------------------------

def test_prefix_jaccard_equals_bruteforce(spark):
    """Zero false negatives / positives vs the naive all-pairs join on
    a corpus with pairs planted at, above and below the 3/5 gate."""
    from itertools import combinations

    from langscrape_spark.operators.dedup import prefix_jaccard_pairs

    texts = {
        1: "a b c d e",
        2: "a b c d x",      # inter 4, union 6 -> 2/3 >= 3/5 keep
        3: "a b c y z",      # vs 1: inter 3, union 7 -> 3/7 drop
        4: "a b c d e",      # identical to 1 -> 1.0
        5: "p q r s t u",    # disjoint island
        6: "p q r s t u",    # identical island twin
        7: "m n o",          # vs nothing
        8: "m n o w",        # vs 7: 3/4 = 0.75 keep
    }
    docs = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    got = {
        (r["id_a"], r["id_b"]): (r["inter"], r["jaccard"])
        for r in prefix_jaccard_pairs(docs, 3, 5).collect()
    }
    sets = {i: set(t.split()) for i, t in texts.items()}
    expect = {}
    for a, b in combinations(sorted(sets), 2):
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        if 5 * inter >= 3 * union:
            expect[(a, b)] = (inter, round(inter / union, 6))
    assert got == expect
    assert (1, 4) in got and got[(1, 4)][1] == 1.0
    assert (1, 3) not in got


def test_setsim_unpersist_hook_releases_cached_inputs(spark):
    """prefix_jaccard_pairs/containment_pairs cache their shared
    tokenize + sizes frames for the multi-reference plan; the
    unpersist_inputs hook hands those frames to the caller so a
    long-lived session can release executor storage after the action
    (without the hook, repeated calls accumulate cached frames until
    session teardown)."""
    from langscrape_spark.operators.dedup import (
        containment_pairs,
        prefix_jaccard_pairs,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e"), (3, "x y z w")],
        "doc_id long, text string",
    )
    for fn in (prefix_jaccard_pairs, containment_pairs):
        handles = []
        out = fn(docs, 3, 5, unpersist_inputs=handles)
        n = out.count()  # materialize -> caches populated
        assert n >= 1 and len(handles) == 2
        assert any(h.storageLevel.useMemory for h in handles)
        for h in handles:
            h.unpersist(blocking=True)
        assert all(not h.storageLevel.useMemory for h in handles)


def test_prefix_jaccard_boundary_is_exact_rational(spark):
    """inter=3, union=5 sits EXACTLY on 3/5 — the integer gate keeps
    it (a float gate on 0.6 would be a coin flip)."""
    from langscrape_spark.operators.dedup import prefix_jaccard_pairs

    docs = spark.createDataFrame(
        [(1, "a b c d"), (2, "a b c e")],  # inter 3, union 5
        "doc_id long, text string",
    )
    out = prefix_jaccard_pairs(docs, 3, 5).collect()
    assert len(out) == 1 and out[0]["inter"] == 3
    assert out[0]["jaccard"] == 0.6
    # and strictly-below: 2/4 with threshold 3/5 -> empty
    docs2 = spark.createDataFrame(
        [(1, "a b c"), (2, "a b z")], "doc_id long, text string"
    )
    assert prefix_jaccard_pairs(docs2, 3, 5).count() == 0


# -- exact containment join (operators/dedup.py::containment_pairs) --


def test_containment_pairs_quote_detection_and_direction(spark):
    from langscrape_spark.operators.dedup import containment_pairs

    article = " ".join(f"w{i}" for i in range(40)) + " quote gold text"
    docs = spark.createDataFrame(
        [
            (1, article),
            (2, "quote gold text"),        # fully inside 1
            (3, "quote gold text zzz qqq"),  # only 3/5 inside 1
            (4, ""),                        # empty: pairs with nothing
        ],
        "doc_id long, text string",
    )
    out = {(r.id_a, r.id_b): r for r in
           containment_pairs(docs, 3, 4).collect()}
    # quote -> article found, with exact stats
    r = out[(2, 1)]
    assert (r.inter, r.size_a, r.size_b) == (3, 3, 43)
    assert r.containment == 1.0
    # asymmetric: the article is NOT contained in the quote
    assert (1, 2) not in out
    # 3/5 < 3/4: partial-overlap doc excluded in both directions
    assert (3, 1) not in out and (1, 3) not in out
    # the empty doc appears nowhere
    assert not any(4 in k for k in out)


def test_containment_pairs_matches_bruteforce(spark):
    """Zero-false-negative check: prefix-filtered result == naive
    all-pairs containment on a corpus with overlapping token sets."""
    import itertools

    from langscrape_spark.operators.dedup import containment_pairs

    vocab = [f"t{i}" for i in range(12)]
    rows = []
    for i in range(30):
        toks = [vocab[(i * 7 + j * 3) % 12] for j in range(2 + i % 6)]
        rows.append((i, " ".join(toks)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    p, q = 2, 3
    got = {(r.id_a, r.id_b, r.inter) for r in
           containment_pairs(docs, p, q).collect()}
    sets = {i: set(t.split()) for i, t in rows if t}
    exp = set()
    for a, b in itertools.permutations(sets, 2):
        inter = len(sets[a] & sets[b])
        if inter and q * inter >= p * len(sets[a]):
            exp.add((a, b, inter))
    assert got == exp and exp  # non-trivial


def test_novelty_fraction_copies_and_partials(spark):
    from langscrape_spark.operators.dedup import novelty_fraction

    docs = spark.createDataFrame(
        [
            (1, "a b c d"),            # first: novelty 1.0
            (2, "a b c d"),            # verbatim copy: 0.0
            (3, "a b c x y z"),        # mixes seen (a b c) + new
            (4, "q r"),                # too short to shingle: NULL
        ],
        "doc_id long, text string",
    )
    out = {r.id: r for r in novelty_fraction(docs, k=3).collect()}
    assert out[1].novelty == 1.0 and out[1].n_shingles == 2
    assert out[2].novelty == 0.0
    # doc 3: shingles {a b c, b c x, c x y, x y z}; only 'a b c' seen
    assert (out[3].n_shingles, out[3].n_new) == (4, 3)
    assert out[4].n_shingles == 0 and out[4].novelty is None
    # same-order ties are novel for BOTH (documented batch semantics)
    tied = spark.createDataFrame(
        [(1, 5, "p q r"), (2, 5, "p q r")],
        "doc_id long, o long, text string",
    )
    t = {r.id: r for r in
         novelty_fraction(tied, k=3, order_col="o").collect()}
    assert t[1].novelty == 1.0 and t[2].novelty == 1.0
