"""Streaming ingest: micro-batches must produce byte-identical results
to the batch pipeline, exactly once per input file, resumable."""

import os

from langscrape_spark import synth
from langscrape_spark.plans.extract import extract_pages
from langscrape_spark.streaming.ingest import stream_extract


def test_stream_matches_batch(spark, tmp_path):
    n = 24
    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    full = synth.build_pages_df(spark, n, partitions=2).cache()
    full.count()
    # two file "drops"
    urls_a = {synth.url_of(i) for i in range(0, n, 2)}
    full.where(full.url.isin(*urls_a)).write.parquet(pages_dir + "/drop_a")
    full.where(~full.url.isin(*urls_a)).write.parquet(pages_dir + "/drop_b")

    def sink(batch_df, batch_id):
        batch_df.write.mode("append").parquet(out_dir)

    q = stream_extract(
        spark, pages_dir + "/*", synth.FIELD_MAP, ckpt, sink,
        max_files_per_trigger=1,
    )
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir).select("url", "extracted").collect()
    want = extract_pages(full, synth.FIELD_MAP).select("url", "extracted").collect()
    assert len(got) == n
    g = {r["url"]: r["extracted"] for r in got}
    w = {r["url"]: r["extracted"] for r in want}
    assert g == w

    # restart with the same checkpoint: no new files -> no duplicates
    q2 = stream_extract(
        spark, pages_dir + "/*", synth.FIELD_MAP, ckpt, sink,
    )
    q2.awaitTermination(60)
    assert spark.read.parquet(out_dir).count() == n


def test_stream_dedup_ingest_matches_batch_join(spark, tmp_path):
    """Streaming micro-batches through the incremental MinHash state
    must union to EXACTLY the batch full-corpus LSH pairs — the same
    union-equivalence contract the batch rounds prove, now via
    foreachBatch with exactly-once file semantics."""
    import os

    from pyspark.sql import functions as F

    from langscrape_spark.operators.dedup import minhash_lsh_pairs
    from langscrape_spark.streaming.ingest import stream_dedup_ingest

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < 150)
        .select("doc_id", "text")
    )
    # three files -> three micro-batches (maxFilesPerTrigger=1)
    docs_dir = str(tmp_path / "docs")
    for i in range(3):
        docs.where(F.col("doc_id") % 3 == i).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)

    got = []

    def sink(pairs, batch_id):
        got.extend(
            (r["id_a"], r["id_b"]) for r in pairs.collect()
        )

    q = stream_dedup_ingest(
        spark,
        docs_dir,
        str(tmp_path / "state"),
        str(tmp_path / "ckpt"),
        sink,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    assert not q.isActive

    expected = {
        (r["id_a"], r["id_b"])
        for r in minhash_lsh_pairs(
            docs, "text", "doc_id", num_hashes=16, bands=4, k=3,
            max_bucket=None,
        ).collect()
    }
    norm = {(min(a, b), max(a, b)) for a, b in got}
    assert norm == {(min(a, b), max(a, b)) for a, b in expected}
    assert len(got) == len(norm)  # each pair exactly once across batches


def test_stream_dedup_replay_is_idempotent(spark, tmp_path):
    """Deleting the stream checkpoint forces a FULL replay of every
    input file; the per-batch markers must skip all of them — no
    duplicate state rows, no re-emitted pairs (the at-least-once
    guard for the state mutation)."""
    from pyspark.sql import functions as F

    from langscrape_spark.operators.incremental import bucket_state_rows
    from langscrape_spark.streaming.ingest import stream_dedup_ingest

    docs = (
        spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .where(F.col("doc_id") < 60)
        .select("doc_id", "text")
    )
    docs_dir = str(tmp_path / "docs")
    for i in range(2):
        docs.where(F.col("doc_id") % 2 == i).coalesce(1).write.mode(
            "append"
        ).parquet(docs_dir)

    got = []

    def sink(pairs, batch_id):
        got.extend((r["id_a"], r["id_b"]) for r in pairs.collect())

    state_dir = str(tmp_path / "state")
    q = stream_dedup_ingest(
        spark, docs_dir, state_dir, str(tmp_path / "ckpt1"), sink,
        max_files_per_trigger=1,
    )
    q.awaitTermination(300)
    first_pairs = list(got)
    rows_before = bucket_state_rows(spark, state_dir).count()

    # full replay: fresh checkpoint, same state dir
    q2 = stream_dedup_ingest(
        spark, docs_dir, state_dir, str(tmp_path / "ckpt2"), sink,
        max_files_per_trigger=1,
    )
    q2.awaitTermination(300)
    assert got == first_pairs  # nothing re-emitted
    assert bucket_state_rows(spark, state_dir).count() == rows_before
