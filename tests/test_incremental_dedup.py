"""Incremental dedup state (operators/incremental.py): the union of
per-round incremental pairs must equal the batch operator's
full-corpus pairs, for any round split — each pair emitted exactly
once, by the round ingesting the later doc."""

import pytest

from pyspark.sql import functions as F


def _mk_docs(spark, n=120, dup_every=7):
    """Deterministic corpus with planted near-dup structure: every
    ``dup_every``-th doc is a one-token edit of its predecessor, so
    both exact LSH collisions and near-misses exist."""
    rows = []
    words = [f"w{i}" for i in range(40)]
    for i in range(n):
        base = [words[(i * 3 + j) % 40] for j in range(12)]
        if i % dup_every == 1 and i > 0:
            prev = [words[((i - 1) * 3 + j) % 40] for j in range(12)]
            prev[5] = "edited"
            base = prev
        rows.append((i, " ".join(base)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _pairs_set(df, extra=()):
    return {
        (r.id_a, r.id_b, *[getattr(r, c) for c in extra])
        for r in df.collect()
    }


@pytest.mark.parametrize("n_rounds", [1, 3])
def test_minhash_incremental_union_equals_batch(spark, tmp_path, n_rounds):
    from langscrape_spark.operators.dedup import minhash_lsh_pairs
    from langscrape_spark.operators.incremental import minhash_ingest_round

    docs = _mk_docs(spark)
    full = _pairs_set(
        minhash_lsh_pairs(docs, "text", "doc_id", max_bucket=None),
        extra=("n_shared_bands",),
    )
    state = str(tmp_path / "mh_state")
    got = set()
    for r in range(n_rounds):
        batch = docs.where(F.col("doc_id") % n_rounds == r)
        pairs = minhash_ingest_round(batch, state, n_parts=8)
        got |= _pairs_set(pairs, extra=("n_shared_bands",))
    assert got == full
    assert len(full) > 3  # the corpus actually plants collisions


def test_minhash_incremental_round0_is_batch(spark, tmp_path):
    """Against an empty state the incremental op IS the batch op."""
    from langscrape_spark.operators.dedup import minhash_lsh_pairs
    from langscrape_spark.operators.incremental import (
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=60)
    state = str(tmp_path / "none")
    inc = minhash_lsh_pairs_incremental(docs, state, "text", "doc_id")
    batch = minhash_lsh_pairs(docs, "text", "doc_id", max_bucket=None)
    assert _pairs_set(inc) == _pairs_set(batch)


def test_minhash_state_torn_append_superset_is_safe(spark, tmp_path):
    """A retried (duplicate) state append must not change pair counts:
    the probe drops duplicate (bucket, id) rows per partition."""
    from langscrape_spark.operators.dedup import minhash_band_buckets
    from langscrape_spark.operators.incremental import (
        bucket_state_append,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=40)
    old = docs.where(F.col("doc_id") < 20)
    new = docs.where(F.col("doc_id") >= 20)
    state = str(tmp_path / "mh")
    oldb = minhash_band_buckets(old, "text", "doc_id")
    bucket_state_append(oldb, state, n_parts=4)
    once = _pairs_set(
        minhash_lsh_pairs_incremental(new, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    # torn-retry: the same round appended again -> superset state
    bucket_state_append(oldb, state, n_parts=4)
    twice = _pairs_set(
        minhash_lsh_pairs_incremental(new, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    assert once == twice


@pytest.mark.parametrize("n_rounds", [2])
def test_simhash_incremental_union_equals_batch(spark, tmp_path, n_rounds):
    from langscrape_spark.operators.dedup import simhash_near_dups
    from langscrape_spark.operators.incremental import simhash_ingest_round

    docs = _mk_docs(spark)
    full = _pairs_set(
        simhash_near_dups(docs, "text", "doc_id", max_bucket=None),
        extra=("hamming",),
    )
    state = str(tmp_path / "sh_state")
    got = set()
    for r in range(n_rounds):
        batch = docs.where(F.col("doc_id") % n_rounds == r)
        pairs = simhash_ingest_round(batch, state, n_parts=8)
        got |= _pairs_set(pairs, extra=("hamming",))
    assert got == full
    assert len(full) > 3


def test_state_geometry_mismatch_is_loud(spark, tmp_path):
    """A probe/append with a different n_parts than the state was
    built with would silently MISS pairs (wrong bpart routing) — it
    must raise instead; and a state dir with data but no geometry
    marker is refused rather than guessed at."""
    from langscrape_spark.operators.dedup import minhash_band_buckets
    from langscrape_spark.operators.incremental import (
        bucket_state_append,
        bucket_state_probe,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=20)
    b = minhash_band_buckets(docs, "text", "doc_id")
    state = str(tmp_path / "geo")
    bucket_state_append(b, state, n_parts=4)
    with pytest.raises(ValueError, match="n_parts"):
        bucket_state_append(b, state, n_parts=8)
    with pytest.raises(ValueError, match="n_parts"):
        bucket_state_probe(b, state, n_parts=8).count()
    with pytest.raises(ValueError, match="n_parts"):
        minhash_lsh_pairs_incremental(docs, state, n_parts=16).count()
    # markerless data dir (e.g. hand-copied state) is refused
    import os

    os.remove(os.path.join(state, "_GEOMETRY.json"))
    with pytest.raises(ValueError, match="marker"):
        bucket_state_append(b, state, n_parts=4)


def test_ingest_round_releases_persisted_signatures(spark, tmp_path):
    """minhash/simhash ingest rounds persist one signature frame per
    round and must release it after the state append — a multi-round
    crawl session would otherwise accumulate cached frames without
    bound (same leak class as the set-sim unpersist hook)."""
    from langscrape_spark.operators.incremental import (
        minhash_ingest_round,
        simhash_ingest_round,
    )

    docs = _mk_docs(spark, n=40)
    jsc = spark.sparkContext._jsc.sc()
    for fn, sub in (
        (minhash_ingest_round, "mh"),
        (simhash_ingest_round, "sh"),
    ):
        before = jsc.getPersistentRDDs().size()
        kept = []  # hold the results so their checkpoints stay alive
        for r in range(2):
            batch = docs.where(F.col("doc_id") % 2 == r)
            kept.append(fn(batch, str(tmp_path / sub), n_parts=4))
        # growth must not exceed the eager localCheckpoints we KEEP —
        # a leaked signature frame adds +1 per round on top. Upper
        # bound, not equality: the async ContextCleaner may reclaim
        # previous iterations' released frames at any time, which only
        # ever LOWERS the count.
        assert jsc.getPersistentRDDs().size() - before <= len(kept)


def test_state_rows_audit(spark, tmp_path):
    from langscrape_spark.operators.dedup import minhash_band_buckets
    from langscrape_spark.operators.incremental import (
        bucket_state_append,
        bucket_state_rows,
    )

    docs = _mk_docs(spark, n=30)
    state = str(tmp_path / "audit")
    assert bucket_state_rows(spark, state) is None
    b = minhash_band_buckets(docs, "text", "doc_id")
    bucket_state_append(b, state, n_parts=4)
    rows = bucket_state_rows(spark, state)
    assert rows.count() == b.count()  # 4 bands x 30 docs
    assert set(rows.columns) >= {"bucket", "id", "bpart"}
