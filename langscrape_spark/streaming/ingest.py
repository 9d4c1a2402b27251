"""Incremental page ingest via Structured Streaming.

The north rule prescribes batch rounds for the *crawl* (frontier and
seen-set checkpointed between spark-submit rounds — SURVEY.md §2.11:
no watermarks, no event-time windows, no stateful operators needed,
and the reference itself is strictly synchronous batch). What a
production deployment still wants incrementally is *ingest*: WARC
dumps land as files, and each micro-batch should flow through the
same deterministic extraction kernel without re-reading old files.

``stream_extract`` is exactly that: a file-source ``readStream`` over
the pages directory, piped through ``plans.extract.extract_pages`` in
``foreachBatch`` — one code path for batch and streaming, which is
what keeps the byte-identity contract meaningful in both modes. The
file source + checkpointLocation give exactly-once per input file;
ordering across micro-batches is irrelevant because extraction is
per-row.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional

from pyspark.sql import DataFrame, SparkSession

from ..plans.extract import extract_pages
from ..synth import PAGES_DDL


def stream_extract(
    spark: SparkSession,
    pages_dir: str,
    field_map: Dict[str, Any],
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    max_files_per_trigger: Optional[int] = None,
    schema: str = PAGES_DDL,
):
    """Start a streaming query: new parquet files under ``pages_dir``
    → extraction kernel → ``sink(batch_df, batch_id)``.

    ``sink`` receives the *extracted* micro-batch (same schema as the
    batch pipeline) — append it to the results table. Returns the
    StreamingQuery; caller owns ``awaitTermination``/``stop``."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    pages = reader.parquet(pages_dir)

    def process(batch_df: DataFrame, batch_id: int) -> None:
        sink(extract_pages(batch_df, field_map), batch_id)

    return (
        pages.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )


def stream_dedup_ingest(
    spark: SparkSession,
    docs_dir: str,
    state_dir: str,
    checkpoint_dir: str,
    sink: Callable[[DataFrame, int], None],
    schema: str = "doc_id long, text string",
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 16,
    bands: int = 4,
    k: int = 3,
    n_parts: int = 16,
    max_files_per_trigger: Optional[int] = None,
):
    """Streaming near-dup ingest: new document files flow through the
    SAME incremental MinHash state the batch rounds use
    (``operators/incremental.minhash_ingest_round``) — each
    micro-batch's pairs (new docs vs everything already ingested plus
    within-batch) go to ``sink(pairs_df, batch_id)`` and its band
    buckets append to the on-disk bucket-partitioned state.
    ``sink`` must fully consume the frame during the call
    (write/collect); the frame's storage is released once the batch
    commits, so a retained handle fails on any later action.

    One code path for batch rounds AND streaming ingest, so the
    union-equivalence contract (per-round pairs union EXACTLY to the
    batch full-corpus join) holds in both modes, and the union
    property is order-independent, so micro-batch scheduling cannot
    change the result set. Returns the StreamingQuery; caller owns
    ``awaitTermination``/``stop``.

    Replay safety (foreachBatch is at-least-once): see the ordering +
    per-batch-marker discussion in the body — sink failures replay
    exactly-once; only a crash inside the narrow append-to-marker
    window degrades to at-least-once for that one batch. The state
    append runs inside ``foreachBatch`` — Spark runs micro-batches
    sequentially, the single-writer assumption the bucket state's
    append protocol already requires of the batch rounds.
    """
    import os

    reader = spark.readStream.schema(schema)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    docs = reader.parquet(docs_dir)

    # foreachBatch is AT-LEAST-once: a failure anywhere in this body
    # replays the batch, and a blind second bucket_state_append of the
    # same batch would make the probe see the batch's own rows as
    # "old" state — double-emitting every within-batch pair and
    # permanently duplicating state rows. Ordering + a per-batch
    # marker make the replay paths safe:
    #   1. pairs compute + CHECKPOINT against the PRE-batch state
    #      (the same pairs-before-append order minhash_ingest_round
    #      uses);
    #   2. sink(pairs) — if it fails, the state is still untouched,
    #      so the replay recomputes IDENTICAL pairs and retries the
    #      sink (the common failure mode is fully exactly-once);
    #   3. state append, then the atomic marker — a replayed batch
    #      with a marker is skipped outright.
    # Residual window, documented honestly: a crash BETWEEN append
    # completion and marker rename replays the append once (the next
    # bucket_state_compact dedups the rows) and re-runs the sink with
    # pairs computed against a state that already holds the batch —
    # the narrow 2PC gap every non-transactional foreachBatch sink
    # has; batch_id is passed through so sinks can key their own
    # idempotence on it.
    from ..operators.incremental import (
        _minhash_params,
        bucket_state_append,
        minhash_lsh_pairs_incremental,
    )
    from ..operators.dedup import minhash_band_buckets

    marker_dir = os.path.join(state_dir, "_applied_batches")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        marker = os.path.join(marker_dir, f"batch-{batch_id}")
        if os.path.exists(marker):
            return
        handles: list = []
        pairs = minhash_lsh_pairs_incremental(
            batch_df, state_dir, text_col, id_col,
            num_hashes, bands, k, None, n_parts,
            unpersist_inputs=handles,
        ).localCheckpoint(eager=True)
        sink(pairs, batch_id)
        newb = minhash_band_buckets(
            batch_df, text_col, id_col, num_hashes, bands, k
        )
        bucket_state_append(
            newb, state_dir, n_parts,
            params=_minhash_params(num_hashes, bands, k),
        )
        for h in handles:
            h.unpersist()
        # Release the eagerly-materialized pairs checkpoint too —
        # without this every micro-batch leaks its checkpoint RDD
        # blocks in executor storage for the streaming query's
        # lifetime.  Safe here: both consumers (sink, state append)
        # have completed; a failure above replays the whole batch and
        # recomputes pairs from the untouched pre-batch state.
        # SINK CONTRACT (changed by this release): the sink must fully
        # consume the frame DURING its call (write/collect/count) —
        # retaining the DataFrame for use after the batch returns now
        # fails ("checkpoint block not found": the lineage was severed
        # by localCheckpoint, so the freed blocks cannot be
        # recomputed).  A sink that needs the rows later should
        # materialize them itself (collect or write) inside the call.
        pairs.unpersist()
        os.makedirs(marker_dir, exist_ok=True)
        tmp = marker + ".tmp"
        with open(tmp, "w") as f:
            f.write("applied")
        os.replace(tmp, marker)

    return (
        docs.writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
