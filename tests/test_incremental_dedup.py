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


def test_state_signature_param_mismatch_is_loud(spark, tmp_path):
    """n_parts is not the only routing function: a different signature
    geometry (minhash num_hashes/bands/k, simhash max_hamming → block
    bounds) computes bucket strings that can never equal the stored
    ones, silently missing every new×old pair — the marker must pin
    those too."""
    from langscrape_spark.operators.incremental import (
        minhash_ingest_round,
        simhash_ingest_round,
    )

    docs = _mk_docs(spark, n=30)
    mh_state = str(tmp_path / "mh")
    minhash_ingest_round(docs, mh_state, n_parts=4, bands=4).count()
    with pytest.raises(ValueError, match="bands"):
        minhash_ingest_round(docs, mh_state, n_parts=4, bands=8).count()
    with pytest.raises(ValueError, match="num_hashes"):
        minhash_ingest_round(
            docs, mh_state, n_parts=4, num_hashes=32, bands=4
        ).count()

    sh_state = str(tmp_path / "sh")
    simhash_ingest_round(docs, sh_state, n_parts=4, max_hamming=3).count()
    with pytest.raises(ValueError, match="max_hamming"):
        simhash_ingest_round(docs, sh_state, n_parts=4, max_hamming=7).count()


def test_marker_only_state_dir_reads_as_empty(spark, tmp_path):
    """A round with an EMPTY new batch stamps the geometry marker but
    appends zero rows → no bpart= dirs. bucket_state_rows must treat
    that as 'before the first append' (None), not throw
    UNABLE_TO_INFER_SCHEMA; and a later real round must work."""
    from langscrape_spark.operators.incremental import (
        bucket_state_rows,
        minhash_ingest_round,
    )

    docs = _mk_docs(spark, n=30)
    state = str(tmp_path / "empty_first")
    empty = docs.where(F.col("doc_id") < 0)
    assert minhash_ingest_round(empty, state, n_parts=4).count() == 0
    assert bucket_state_rows(spark, state) is None
    minhash_ingest_round(docs, state, n_parts=4).count()
    assert bucket_state_rows(spark, state).count() > 0


def test_compaction_preserves_probe_results_and_collapses_files(
    spark, tmp_path
):
    """bucket_state_compact: after several ingest rounds each bpart dir
    holds one file per round; compaction must collapse each to ONE
    file, preserve every row, and leave a later round's pairs (probe +
    ingest) byte-identical to the uncompacted state's."""
    from langscrape_spark.operators.incremental import (
        _state_files,
        bucket_state_compact,
        bucket_state_rows,
        minhash_ingest_round,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=120)
    state = str(tmp_path / "mh")
    for r in range(3):
        minhash_ingest_round(
            docs.where(F.col("doc_id") % 4 == r), state, n_parts=8
        ).count()
    last = docs.where(F.col("doc_id") % 4 == 3)
    before_pairs = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=8),
        extra=("n_shared_bands",),
    )
    before_rows = bucket_state_rows(spark, state).count()
    multi = {p: fs for p, fs in _state_files(state).items() if len(fs) > 1}
    assert multi, "test premise: some partition got >1 append file"

    stats = bucket_state_compact(spark, state, n_parts=8).collect()
    assert {s.bpart for s in stats} == set(multi)
    assert all(s.rows_before == s.rows_after for s in stats)  # no torn rows
    assert all(
        len(fs) == 1 for fs in _state_files(state).values()
    ), "every partition must end at one file"
    assert bucket_state_rows(spark, state).count() == before_rows
    after_pairs = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=8),
        extra=("n_shared_bands",),
    )
    assert after_pairs == before_pairs
    # geometry marker survives; a mismatched compact call stays loud
    with pytest.raises(ValueError, match="geometry"):
        bucket_state_compact(spark, state, n_parts=16)


def test_compaction_is_eager_and_stats_are_reusable(spark, tmp_path):
    """The destructive rename+delete must run exactly once, inside the
    call — a lazy frame would redo it per action, and the second action
    would read already-deleted files (FileNotFoundError). The returned
    stats must survive repeated actions."""
    from langscrape_spark.operators.incremental import (
        _state_files,
        bucket_state_compact,
        minhash_ingest_round,
    )

    docs = _mk_docs(spark, n=60)
    state = str(tmp_path / "mh")
    for r in range(2):
        minhash_ingest_round(
            docs.where(F.col("doc_id") % 2 == r), state, n_parts=4
        ).count()
    stats = bucket_state_compact(spark, state, n_parts=4)
    # compaction already happened — files are collapsed BEFORE any
    # action on the stats frame
    assert all(len(fs) == 1 for fs in _state_files(state).values())
    assert stats.count() == stats.count() == len(stats.collect())


def test_compaction_sweeps_orphan_tmp_and_hides_it_from_readers(
    spark, tmp_path
):
    """A crash mid-write leaves a dot-prefixed .inprogress file: it
    must be invisible to bucket_state_rows (Spark hides dot-files) and
    to probes (_state_files lists only *.parquet), and the next
    compaction must delete it."""
    import os

    from langscrape_spark.operators.incremental import (
        _state_files,
        bucket_state_compact,
        bucket_state_rows,
        minhash_ingest_round,
    )

    docs = _mk_docs(spark, n=60)
    state = str(tmp_path / "mh")
    for r in range(2):
        minhash_ingest_round(
            docs.where(F.col("doc_id") % 2 == r), state, n_parts=4
        ).count()
    rows = bucket_state_rows(spark, state).count()
    some_part = next(iter(_state_files(state).values()))[0]
    orphan = os.path.join(
        os.path.dirname(some_part), ".compact-deadbeef.inprogress"
    )
    with open(orphan, "wb") as f:
        f.write(b"torn garbage, not parquet")
    assert bucket_state_rows(spark, state).count() == rows  # hidden
    bucket_state_compact(spark, state, n_parts=4).count()
    assert not os.path.exists(orphan)
    assert bucket_state_rows(spark, state).count() == rows


def test_compaction_size_tiering_bounds_group_memory(spark, tmp_path):
    """With a tiny max_group_bytes every append file lands in its own
    group: partitions may keep >1 file (bounded memory beats one
    footer), rows are preserved, and probe results are unchanged."""
    from langscrape_spark.operators.incremental import (
        bucket_state_compact,
        bucket_state_rows,
        minhash_ingest_round,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=120)
    state = str(tmp_path / "mh")
    for r in range(3):
        minhash_ingest_round(
            docs.where(F.col("doc_id") % 4 == r), state, n_parts=4
        ).count()
    rows = bucket_state_rows(spark, state).count()
    last = docs.where(F.col("doc_id") % 4 == 3)
    before = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    stats = bucket_state_compact(
        spark, state, n_parts=4, max_group_bytes=1
    ).collect()
    # 1-byte budget → every file is its own group → lone-file skip
    assert all(s.files_before == s.files_after for s in stats)
    assert bucket_state_rows(spark, state).count() == rows
    after = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    assert after == before


def test_geometry_marker_upgrades_with_missing_params(spark, tmp_path):
    """A marker stamped via the raw append API (n_parts only) must
    ADOPT the signature params on the first wrapper append that
    supplies them — and enforce them from then on. Without the upgrade
    the protection this marker exists for never engages on old state."""
    import json
    import os

    from langscrape_spark.operators.incremental import (
        _simhash_chunks,
        bucket_state_append,
        minhash_ingest_round,
    )

    docs = _mk_docs(spark, n=30)
    state = str(tmp_path / "mh")
    # raw append: no params in the marker
    raw = _simhash_chunks(docs, "text", "doc_id", 3).limit(0)
    bucket_state_append(raw.select("bucket", "id"), state, n_parts=4)
    marker = json.load(open(os.path.join(state, "_GEOMETRY.json")))
    assert "bands" not in marker
    minhash_ingest_round(docs, state, n_parts=4, bands=4).count()
    marker = json.load(open(os.path.join(state, "_GEOMETRY.json")))
    assert marker["bands"] == 4  # adopted
    with pytest.raises(ValueError, match="bands"):
        minhash_ingest_round(docs, state, n_parts=4, bands=8).count()


def test_compaction_drops_torn_append_duplicates(spark, tmp_path):
    """A torn-append retry leaves byte-identical duplicate rows; the
    probe already drops them per read, and compaction must remove them
    from disk (rows_after < rows_before) without changing pairs."""
    import shutil

    from langscrape_spark.operators.incremental import (
        _state_files,
        bucket_state_compact,
        minhash_ingest_round,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=60)
    state = str(tmp_path / "mh")
    minhash_ingest_round(
        docs.where(F.col("doc_id") % 2 == 0), state, n_parts=4
    ).count()
    # simulate the torn retry: re-copy every data file alongside itself
    dup_rows = 0
    for fs in _state_files(state).values():
        for f in fs:
            shutil.copy(f, f.replace(".parquet", "-retry.parquet"))
            dup_rows += 1
    last = docs.where(F.col("doc_id") % 2 == 1)
    before = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    stats = bucket_state_compact(spark, state, n_parts=4).collect()
    assert sum(s.rows_before - s.rows_after for s in stats) > 0
    after = _pairs_set(
        minhash_lsh_pairs_incremental(last, state, n_parts=4),
        extra=("n_shared_bands",),
    )
    assert after == before


def test_novelty_incremental_matches_bruteforce_rounds(spark, tmp_path):
    """minhash_novelty_incremental: round 0 against an absent state is
    all-novel by definition; later rounds classify each doc novel iff
    it shares no band bucket with ANY earlier round's doc — checked
    against a brute-force derivation from the batch bucket frames."""
    from langscrape_spark.operators.dedup import minhash_band_buckets
    from langscrape_spark.operators.incremental import (
        bucket_state_append,
        minhash_novelty_incremental,
    )

    docs = _mk_docs(spark, n=90)
    params = {"family": "minhash", "num_hashes": 16, "bands": 4, "k": 3}
    state = str(tmp_path / "mh")
    # brute-force oracle: bucket → earliest round that contains it
    all_b = minhash_band_buckets(docs, "text", "doc_id", 16, 4, 3).select(
        "bucket", "id", (F.col("id") % 3).alias("rnd")
    )
    first_round = all_b.groupBy("bucket").agg(F.min("rnd").alias("first_rnd"))
    expect_nonnovel = {
        r.id
        for r in all_b.join(first_round, "bucket")
        .where(F.col("first_rnd") < F.col("rnd"))
        .select("id")
        .distinct()
        .collect()
    }
    for r in range(3):
        batch = docs.where(F.col("doc_id") % 3 == r)
        nv = {
            row.id: row.is_novel
            for row in minhash_novelty_incremental(
                batch, state, n_parts=4
            ).collect()
        }
        assert set(nv) == {
            row.doc_id for row in batch.select("doc_id").collect()
        }
        for i, novel in nv.items():
            assert novel == (i not in expect_nonnovel), (r, i)
        if r == 0:
            assert all(nv.values())  # absent state: everything novel
        bucket_state_append(
            minhash_band_buckets(batch, "text", "doc_id", 16, 4, 3),
            state,
            n_parts=4,
            params=params,
        )


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


def _mk_emb(spark, n=90, dim=8):
    """Deterministic embeddings with 5 planted direction clusters plus
    slow within-cluster drift, so each cluster holds both near-dup
    pairs (sim above any reasonable cut) and far pairs (below it)."""
    import math

    rows = []
    for i in range(n):
        c = i % 5
        vec = [
            math.sin(0.7 * c + 0.09 * (i // 5) + 0.3 * j)
            + (2.0 if j == c else 0.0)
            for j in range(dim)
        ]
        rows.append((i, [float(v) for v in vec]))
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


@pytest.mark.parametrize("n_rounds", [1, 3])
def test_semantic_incremental_union_equals_bruteforce(
    spark, tmp_path, n_rounds
):
    """Union of per-round semantic ingest pairs == brute-force
    within-cluster pairs over the same frozen assignment, for any
    round split — the q154 union-equivalence contract on the
    embedding path."""
    import numpy as np

    from langscrape_spark.operators.ann import ivf_assign, ivf_centroids
    from langscrape_spark.operators.incremental import semantic_ingest_round

    emb = _mk_emb(spark)
    cents = ivf_centroids(emb, k=5, iterations=2)
    assigned = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("id"),
        F.col("bucket").alias("cluster"),
        F.col("embedding").alias("vec"),
    )
    thr = 0.9
    pdf = assigned.toPandas()
    by_cluster = {}
    for _, row in pdf.iterrows():
        if row["cluster"] >= 0:
            by_cluster.setdefault(int(row["cluster"]), []).append(
                (int(row["id"]), np.asarray(row["vec"], dtype=np.float64))
            )
    want = set()
    n_below = 0
    for members in by_cluster.values():
        for i, (ia, va) in enumerate(members):
            for ib, vb in members[i + 1 :]:
                sim = round(
                    float(va @ vb)
                    / (np.linalg.norm(va) * np.linalg.norm(vb)),
                    6,
                )
                lo, hi = min(ia, ib), max(ia, ib)
                if sim >= thr:
                    want.add((lo, hi, round(sim, 6)))
                else:
                    n_below += 1
    assert len(want) > 3 and n_below > 3  # cut actually separates

    state = str(tmp_path / "sem_state")
    got = set()
    for r in range(n_rounds):
        batch = assigned.where(F.col("id") % n_rounds == r)
        pairs = semantic_ingest_round(batch, state, threshold=thr, k=5,
                                      n_parts=4)
        got |= {(p.id_a, p.id_b, p.sim) for p in pairs.collect()}
    assert got == want


def test_semantic_state_threshold_mismatch_is_loud(spark, tmp_path):
    """A round probed with a different cut (or k) than the state was
    built with would emit a pair set no full-corpus run reproduces —
    the geometry marker must refuse it."""
    from langscrape_spark.operators.ann import ivf_assign, ivf_centroids
    from langscrape_spark.operators.incremental import semantic_ingest_round

    emb = _mk_emb(spark, n=30)
    cents = ivf_centroids(emb, k=3, iterations=1)
    assigned = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("id"),
        F.col("bucket").alias("cluster"),
        F.col("embedding").alias("vec"),
    )
    state = str(tmp_path / "sem_state")
    semantic_ingest_round(assigned, state, threshold=0.9, k=3, n_parts=4)
    with pytest.raises(ValueError, match="different"):
        semantic_ingest_round(
            assigned, state, threshold=0.8, k=3, n_parts=4
        ).count()


def test_exact_incremental_crawl_order_first_occurrence(spark, tmp_path):
    """exact_ingest_round: sequential rounds reproduce batch
    first-occurrence election exactly; the state stores one row per
    DISTINCT content; NULL texts are mutual duplicates."""
    from langscrape_spark.operators.incremental import (
        bucket_state_rows,
        exact_ingest_round,
    )

    # 30 docs, text repeats every 7 -> groups span rounds
    rows = [(i, None if i in (4, 25) else f"t{i % 7}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "ex_state")
    got = {}
    for r in range(3):
        batch = docs.where(
            (F.col("doc_id") >= r * 10) & (F.col("doc_id") < (r + 1) * 10)
        )
        for row in exact_ingest_round(batch, state, n_parts=4).collect():
            got[row.id] = (row.is_dup, row.first_id)
    first = {}
    want = {}
    for i, t in rows:
        key = "<NULL>" if t is None else t
        if key in first:
            want[i] = (True, first[key])
        else:
            first[key] = i
            want[i] = (False, None)
    assert got == want
    # state holds one row per distinct content (7 texts + NULL group)
    assert bucket_state_rows(spark, state).count() == 8


# -- kill-window / torn-append replay (the crash class the streaming
# -- ingest documents: a round that died INSIDE the state append and
# -- was replayed in full) ---------------------------------------------------


def test_minhash_replay_after_partial_append_no_self_pairs(
    spark, tmp_path
):
    """Kill mid-append, replay the round: the state already holds part
    of the batch's own band rows, so the probe sees the batch as its
    own 'old' side. The replayed round must emit NO (x, x) self-pairs,
    and the pair SET (dedup by ids — within-batch pairs may appear
    through both the batch path and the probe path in this documented
    2PC-gap window) must still equal the uninterrupted derivation."""
    from langscrape_spark.operators.dedup import minhash_band_buckets
    from langscrape_spark.operators.incremental import (
        bucket_state_compact,
        bucket_state_rows,
        minhash_ingest_round,
        minhash_lsh_pairs_incremental,
    )

    docs = _mk_docs(spark, n=60)
    r0 = docs.where(F.col("doc_id") < 30)
    r1 = docs.where(F.col("doc_id") >= 30)
    state_ok = str(tmp_path / "mh_ok")
    state_torn = str(tmp_path / "mh_torn")

    # uninterrupted reference (id pairs — the 2PC-gap window only
    # promises set semantics, see docstring)
    want_ids = _pairs_set(minhash_ingest_round(r0, state_ok, n_parts=4))
    want_ids |= _pairs_set(minhash_ingest_round(r1, state_ok, n_parts=4))

    # torn run: round 0 commits, round 1 dies mid-append (half the
    # batch's band rows land in state), then the round replays fully
    got = _pairs_set(minhash_ingest_round(r0, state_torn, n_parts=4))
    from langscrape_spark.operators.incremental import (
        _minhash_params,
        bucket_state_append,
    )

    partial = minhash_band_buckets(
        r1.where(F.col("doc_id") % 2 == 0), "text", "doc_id"
    )
    bucket_state_append(
        partial, state_torn, n_parts=4, params=_minhash_params(16, 4, 3)
    )
    replay = minhash_ingest_round(r1, state_torn, n_parts=4)
    rows = replay.collect()
    assert all(r.id_a != r.id_b for r in rows), "self-pair leaked"
    got |= {(r.id_a, r.id_b) for r in rows}
    assert got == want_ids

    # compaction heals the duplicate state rows; a later round then
    # behaves exactly as in the uninterrupted state
    bucket_state_compact(spark, state_torn, n_parts=4)
    n_ok = bucket_state_rows(spark, state_ok).count()
    n_torn = bucket_state_rows(spark, state_torn).count()
    assert n_ok == n_torn
    probe_docs = _mk_docs(spark, n=70).where(F.col("doc_id") >= 60)
    after_ok = _pairs_set(
        minhash_lsh_pairs_incremental(probe_docs, state_ok, n_parts=4),
        extra=("n_shared_bands",),
    )
    after_torn = _pairs_set(
        minhash_lsh_pairs_incremental(probe_docs, state_torn, n_parts=4),
        extra=("n_shared_bands",),
    )
    assert after_ok == after_torn


def test_semantic_replay_after_partial_append_kill_window(
    spark, tmp_path
):
    """Semantic sibling of the minhash kill-window test, with the
    frozen-centroid geometry: round 1 dies mid-append (half its
    (cluster, id, vec) rows committed), replays fully, and the final
    pair-id set still equals the uninterrupted run; no self-pairs; a
    compaction plus one more round behaves identically to the clean
    state."""
    from langscrape_spark.operators.ann import ivf_assign, ivf_centroids
    from langscrape_spark.operators.incremental import (
        _semantic_params,
        bucket_state_append,
        bucket_state_compact,
        bucket_state_rows,
        semantic_ingest_round,
        semantic_pairs_incremental,
    )

    emb = _mk_emb(spark, n=90)
    cents = ivf_centroids(emb, k=5, iterations=2)
    assigned = ivf_assign(emb, cents).select(
        F.col("vec_id").alias("id"),
        F.col("bucket").alias("cluster"),
        F.col("embedding").alias("vec"),
    )
    thr = 0.9
    r0 = assigned.where(F.col("id") < 45)
    r1 = assigned.where((F.col("id") >= 45) & (F.col("id") < 80))
    r2 = assigned.where(F.col("id") >= 80)
    state_ok = str(tmp_path / "sem_ok")
    state_torn = str(tmp_path / "sem_torn")

    want = set()
    for b in (r0, r1):
        want |= {
            (p.id_a, p.id_b)
            for p in semantic_ingest_round(
                b, state_ok, threshold=thr, k=5, n_parts=4
            ).collect()
        }

    got = {
        (p.id_a, p.id_b)
        for p in semantic_ingest_round(
            r0, state_torn, threshold=thr, k=5, n_parts=4
        ).collect()
    }
    partial = r1.where(F.col("id") % 2 == 0).select(
        F.col("cluster").cast("int").cast("string").alias("bucket"),
        "id",
        "vec",
    )
    bucket_state_append(
        partial, state_torn, n_parts=4, params=_semantic_params(thr, 5)
    )
    rows = semantic_ingest_round(
        r1, state_torn, threshold=thr, k=5, n_parts=4
    ).collect()
    assert all(p.id_a != p.id_b for p in rows), "self-pair leaked"
    got |= {(p.id_a, p.id_b) for p in rows}
    assert got == want

    bucket_state_compact(spark, state_torn, n_parts=4)
    assert (
        bucket_state_rows(spark, state_ok).count()
        == bucket_state_rows(spark, state_torn).count()
    )
    after_ok = {
        (p.id_a, p.id_b, p.sim)
        for p in semantic_pairs_incremental(
            r2, state_ok, thr, 5, n_parts=4
        ).collect()
    }
    after_torn = {
        (p.id_a, p.id_b, p.sim)
        for p in semantic_pairs_incremental(
            r2, state_torn, thr, 5, n_parts=4
        ).collect()
    }
    assert after_ok == after_torn and after_ok


def test_exact_replay_after_partial_append_not_self_dup(spark, tmp_path):
    """Exact-state kill window: a torn append that committed some of
    the round's first-occurrence rows must not make the replayed round
    flag those docs as duplicates OF THEMSELVES; cross-round duplicate
    detection is unaffected."""
    from langscrape_spark.operators.incremental import (
        _exact_params,
        bucket_state_append,
        exact_ingest_round,
    )

    rows = [(i, f"t{i % 7}") for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    state = str(tmp_path / "ex_torn")
    r0 = docs.where(F.col("doc_id") < 10)
    r1 = docs.where(F.col("doc_id") >= 10)
    out0 = {
        r.id: (r.is_dup, r.first_id)
        for r in exact_ingest_round(r0, state, n_parts=4).collect()
    }
    # torn: half of round 1's first-occurrence rows land in state
    partial = r1.where(F.col("doc_id") % 2 == 0).select(
        F.md5(F.col("text")).alias("bucket"),
        F.col("doc_id").alias("id"),
    )
    bucket_state_append(partial, state, n_parts=4, params=_exact_params())
    out1 = {
        r.id: (r.is_dup, r.first_id)
        for r in exact_ingest_round(r1, state, n_parts=4).collect()
    }
    got = {**out0, **out1}
    first, want = {}, {}
    for i, t in rows:
        if t in first:
            want[i] = (True, first[t])
        else:
            first[t] = i
            want[i] = (False, None)
    assert got == want
